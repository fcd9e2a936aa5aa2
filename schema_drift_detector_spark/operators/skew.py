"""Explicit skew-handling primitives.

AQE's skew-join splitting (enabled engine-wide in session.py) handles
most hot-key joins automatically at runtime. This module covers the
cases AQE cannot: broadcast-impossible dimension sides, deliberate
pre-salting so a downstream aggregation inherits the balanced layout,
and engines/readers where AQE is off. north_rule: "handles skew with
AQE + explicit salting of hot doc_id ranges" — the salted aggregation
lives in constraints.duplicate_keys; this is the join-side counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join: a hot key on the LEFT no longer funnels
    into one reducer.

    Left rows get a PER-ROW salt (monotonically_increasing_id mod
    buckets — consecutive rows of the same key land in different
    buckets, so a hot key spreads across ``salt_buckets`` reducers even
    when it is clustered into one input partition, e.g. after a
    key-partitioned read or groupBy); the RIGHT side is replicated
    ``salt_buckets`` times so every (key, salt) bucket finds its match.
    Output columns = left columns + right's non-key columns, exactly as
    ``left.join(right, key, how)`` would produce. Supported how:
    inner / left / left_outer.

    Cost model: right side is shuffled ×salt_buckets — use for big-big
    joins where the right side is far smaller than the skewed left but
    too big (or not allowed) to broadcast.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    # NOT spark_partition_id + hash(key): that is constant per
    # (partition, key), so a hot key clustered in one input partition
    # would still funnel into one reducer. monotonically_increasing_id
    # is per-row (contiguous within a partition) — join RESULTS are
    # identical for any salt assignment, only the balance varies.
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    lhs = left.withColumn("__salt", salt)
    rhs = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    joined = lhs.join(rhs, on=[key, "__salt"], how=how)
    return joined.drop("__salt")
