"""As-of join: boundary/tie/null semantics and the no-explosion plan."""

from __future__ import annotations

from datetime import datetime as D

from pyspark.sql import functions as F

from schema_drift_detector_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, D(2024, 1, 5)),
            (2, 10, D(2024, 1, 1)),   # before any right
            (3, 10, D(2024, 1, 10)),
            (4, 20, D(2024, 1, 5)),   # key with no right rows
            (5, None, D(2024, 1, 5)),  # null key
            (6, 10, None),             # null ts
            (7, 10, D(2024, 1, 3)),    # exactly at a right ts (inclusive)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, D(2024, 1, 3), 5.0),
            (101, 10, D(2024, 1, 3), 7.0),  # equal-ts tie -> max event_id wins
            (102, 10, D(2024, 1, 8), 9.0),
            (103, None, D(2024, 1, 1), 1.0),  # null-key right: never matches
            (104, 30, None, 2.0),             # null-ts right: never matches
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, "user_id", right_cols=["event_id", "value"], right_tiebreak="event_id"
    )
    rows = {r.event_id: (r.asof_event_id, r.asof_value, r.asof_ts) for r in out.collect()}
    assert rows[1] == (101, 7.0, D(2024, 1, 3))
    assert rows[2] == (None, None, None)
    assert rows[3] == (102, 9.0, D(2024, 1, 8))
    assert rows[4] == (None, None, None)
    assert rows[5] == (None, None, None)
    assert rows[6] == (None, None, None)
    assert rows[7] == (101, 7.0, D(2024, 1, 3))  # inclusive boundary
    assert len(rows) == 7  # every left row exactly once


def test_asof_join_plan_no_explosion(spark):
    """The plan must be windowed-union shaped: no sort-merge/broadcast
    join of the two sides, no cartesian, no range condition."""
    left, right = _frames(spark)
    out = asof_join(left, right, "user_id", right_cols=["value"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Window" in plan
