"""Time-series resampling: bucket + gap-fill (LOCF).

The standard time-series densification pass (Flink's windowed fill,
TimescaleDB's ``time_bucket_gapfill`` + ``locf``): bucket irregular
events into a fixed step, emit one row per bucket per group across the
group's observed span — including EMPTY buckets — and carry the last
observed value forward across gaps. Absent from the reference (a
metadata app); part of the engine's event-analytics surface next to
sessionization and windowed counts.

Scale shape:
- One aggregation to the per-(group, bucket) last observation
  (``max_by`` with a total (ts, tiebreak) ordering — deterministic
  under ties), one small per-group bounds aggregation, the skeleton
  ``sequence``/``explode`` fan-out (linear in span/step per group —
  the irreducible output size of densification; pick ``step`` so
  span/step stays sane, exactly as TimescaleDB documents), one
  (group, bucket) equi-join, one per-group ordered window for the
  carry-forward. No collect, no cartesian, no UDF.
- Skew note: a group with a huge time span fans out many skeleton
  rows; the fan-out happens AFTER the explode on already-distributed
  rows, so it parallelizes across partitions — but the LOCF window is
  per-group sequential. Groups are users/devices here; a 100 TB run
  with one giant group should pre-split the group key by time range.

NULL contract: rows with a NULL group, NULL timestamp, or NULL value
are DROPPED from the fill (a NULL value is indistinguishable from
"no observation" under LOCF; a NULL ts has no bucket) — documented
rather than silent-ish: the ``observed`` flag marks which output rows
came from data vs fill, so input-vs-output accounting is auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_locf(
    df: DataFrame,
    *,
    group_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str,
    step: int = 3600,
) -> DataFrame:
    """Per-group fixed-``step`` (seconds) resampling with
    last-observation-carried-forward fill.

    Output: (group, bucket_ts — epoch seconds aligned to ``step``,
    value — the last observation at-or-before the bucket's end,
    observed — whether THIS bucket had an observation). One row per
    bucket from the group's first to last observed bucket inclusive.
    Within a bucket the surviving observation is the one with the
    greatest (ts, tiebreak) — ``tiebreak_col`` must make that ordering
    total or the carried value is nondeterministic under equal
    timestamps (required, same discipline as pack/asof ordering).
    """
    if step < 1:
        raise ValueError(f"step must be >= 1 second, got {step}")
    g, ts, v = F.col(group_col), F.col(ts_col), F.col(value_col)
    epoch = ts.cast("timestamp").cast("long")
    # pure integer FLOOR alignment: pmod, not % — Spark's % keeps the
    # dividend's sign, so `e - (e % step)` would round pre-1970
    # (negative-epoch) timestamps toward zero, assigning them to the
    # bucket AFTER them (review catch, reproduced live)
    bucket = epoch - F.pmod(epoch, F.lit(step))

    obs = (
        df.filter(g.isNotNull() & ts.isNotNull() & v.isNotNull())
        .select(
            g.alias("__g"),
            bucket.alias("__b"),
            F.struct(
                epoch.alias("e"),
                F.col(tiebreak_col).alias("t"),
                v.alias("v"),
            ).alias("__o"),
        )
        .groupBy("__g", "__b")
        .agg(F.max("__o").alias("__o"))
        .select("__g", "__b", F.col("__o.v").alias("__v"))
    )
    bounds = obs.groupBy("__g").agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    skeleton = bounds.select(
        "__g", F.explode(F.sequence("__lo", "__hi", F.lit(step))).alias("__b")
    )
    w = Window.partitionBy("__g").orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        skeleton.join(obs, ["__g", "__b"], "left")
        .select(
            F.col("__g").alias(group_col),
            F.col("__b").alias("bucket_ts"),
            F.last("__v", ignorenulls=True).over(w).alias(value_col),
            F.col("__v").isNotNull().alias("observed"),
        )
    )
