from __future__ import annotations

import pytest

from schema_drift_detector_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sdd-tests", master="local[4]", shuffle_partitions=8)
    yield s
