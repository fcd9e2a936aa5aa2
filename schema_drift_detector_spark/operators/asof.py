"""As-of (point-in-time) join: for every left row, the single right row
of the same key with the greatest timestamp at-or-before the left's.

The standard temporal-correctness join of feature stores and event
analytics ("the user's latest purchase as of this view"), and an
operator family Spark lacks natively. The reference engine has no
analogue (its R11 previous-snapshot top-1 is the self-table special
case, operators/snapshot.py); DuckDB HAS a native ASOF JOIN, which is
exactly what the oracle uses — the engine's distributed plan is
certified against the database's built-in point-in-time semantics.

Scale shape — the part that must survive 100 TB:
  - NOT a range join (no interval explosion) and NOT a broadcast: tag
    both sides, UNION, and run ONE window pass per key ordered by
    (ts, side, tiebreak) carrying the last-seen right payload forward
    (``last(..., ignorenulls=True)`` over unbounded-preceding rows).
    ONE shuffle of left+right on the key — the same cost as a plain
    join — regardless of how many right rows precede each left row.
  - The carried payload is ONE struct column, so the match is atomic —
    per-column carries could stitch different right rows together when
    a right column is legitimately NULL.
  - Skewed keys behave like any windowed aggregation (AQE/salting
    upstream if a single key dominates).

Determinism: at equal (key, ts) the right side sorts BEFORE the left
(side 0 < 1 ⇒ inclusive at-or-before), and among equal-(key, ts) right
rows the greatest (tiebreak, remaining payload) struct wins — resolved
INSIDE the carry ordering (ascending ⇒ the last row carried is the
greatest), a total order over the payload so reruns and different
partitionings pick the identical row with no pre-dedup pass. This is
also what makes the DuckDB ASOF replay unambiguous (its oracle
pre-dedupes to the same winner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str = "ts",
    start_col: str = "s_start",
    end_col: str = "s_end",
    bin_seconds: int = 3600,
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """Range (interval-containment) join: every ``points`` row paired
    with every ``intervals`` row of the same ``keys`` whose
    [start_col, end_col] contains ``point_ts`` (inclusive both ends).
    Returns the inner join with all columns of both frames (interval
    column names must not collide with point columns beyond ``keys``).

    Scale shape: NOT a theta-join (no per-key cross product). Each
    interval explodes into the time bins of width ``bin_seconds`` it
    covers; each point lands in exactly ONE bin, so the equi-join on
    (keys…, bin) + the residual BETWEEN filter yields each matching
    pair exactly once — no post-join dedup. Cost: one equi-join shuffle
    plus interval fan-out of ceil(length/bin) rows; pick ``bin_seconds``
    near the typical interval length (fan-out ~2×). A runtime guard
    fails LOUD (raise, not truncate) on any interval spanning more than
    ``max_bins_per_interval`` bins — the degenerate interval that would
    silently explode the build side at scale.

    NULL contract: an interval with a NULL start or end RAISES (same
    fail-loud arm as the inverted-interval guard — a half-open interval
    must be closed explicitly by the caller, not silently dropped by
    ``sequence(NULL, …)``). A point with a NULL ``point_ts`` gets a
    NULL ``__bin`` and is dropped by the inner equi-join — the standard
    inner-join NULL-key semantics, matching ``asof_join``'s NULL-ts
    contract."""
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(f"colliding non-key columns: {sorted(overlap)}")
    ep = lambda c: F.col(c).cast("timestamp").cast("double")  # noqa: E731
    p = points.withColumn(
        "__bin", F.floor(ep(point_ts) / bin_seconds).cast("long")
    )
    # NULL-bound guard FIRST, and threaded through guarded copies
    # (__gs/__ge) that every downstream use — bin sequence AND residual
    # BETWEEN — reads instead of the raw columns. A plain when() guard
    # on the sequence alone is silently bypassed: the BETWEEN on raw
    # columns lets Catalyst infer isnotnull(start/end) and push them
    # below the explode, dropping NULL-bound rows before the raise ever
    # evaluates (observed on Spark 4.1). CaseWhen is not null-intolerant,
    # so no isnotnull can be inferred past these copies — and a pushed
    # isnotnull(__gs) still evaluates the raise arm.
    null_guard = lambda c: F.when(  # noqa: E731
        F.col(start_col).isNull() | F.col(end_col).isNull(),
        F.raise_error(
            F.format_string(
                "interval with NULL bound: start=%s end=%s — close "
                "half-open intervals explicitly before the join",
                F.col(start_col).cast("string"),
                F.col(end_col).cast("string"),
            )
        ).cast("timestamp"),
    ).otherwise(F.col(c).cast("timestamp"))
    gs, ge = null_guard(start_col), null_guard(end_col)
    sb = F.floor(gs.cast("double") / bin_seconds).cast("long")
    eb = F.floor(ge.cast("double") / bin_seconds).cast("long")
    # two more loud failure arms, both checked BEFORE sequence() runs:
    # an inverted interval (end before start) would make sequence()
    # DESCEND — sb > eb generates |sb-eb|+1 rows — so the span check
    # alone (eb-sb negative, passes any cap) is a silent-explosion
    # bypass; inverted almost always means swapped columns, so raise
    guarded_eb = (
        F.when(
            eb < sb,
            F.raise_error(
                F.format_string(
                    "inverted interval: %s before %s — swapped columns?",
                    F.col(end_col).cast("string"),
                    F.col(start_col).cast("string"),
                )
            ).cast("long"),
        )
        .when(
            eb - sb >= max_bins_per_interval,
            F.raise_error(
                F.format_string(
                    "interval spans more than %d bins of %ds — raise "
                    "bin_seconds or split the interval",
                    F.lit(max_bins_per_interval),
                    F.lit(bin_seconds),
                )
            ).cast("long"),
        )
        .otherwise(eb)
    )
    iv = intervals.withColumns(
        {
            "__bin": F.explode(F.sequence(sb, guarded_eb)),
            "__gs": gs,
            "__ge": ge,
        }
    )
    return (
        p.join(iv, [*keys, "__bin"])
        .filter(F.col(point_ts).between(F.col("__gs"), F.col("__ge")))
        .drop("__bin", "__gs", "__ge")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    right_tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join (backward, inclusive): every ``left`` row gains
    ``prefix``-named copies of ``right_ts`` and ``right_cols`` from the
    matching right row, or NULLs when no right row of the key exists
    at-or-before ``left_ts``. Left rows with a NULL key or NULL
    timestamp pass through unmatched; NULL-key/ts right rows can never
    match (dropped before the union)."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]
    if right_tiebreak is None:
        right_tiebreak = right_cols[0] if right_cols else right_ts
    payload_cols = list(dict.fromkeys([right_ts, *right_cols]))
    tb_cols = [right_tiebreak] + [c for c in payload_cols if c != right_tiebreak]

    r_full = right.filter(
        F.col(key).isNotNull() & F.col(right_ts).isNotNull()
    ).select(
        *[
            F.col(key) if c == key else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
    )
    payload_type = r_full.schema["__payload"].dataType
    l_full = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )

    # nulls-first ascending order: a NULL left __ts sorts before every
    # right row, so the carry finds nothing — unmatched, by contract.
    # The tiebreak orders by FIELD REFERENCES into the one payload
    # struct (no second struct shipped through the shuffle): field
    # access on the left side's NULL struct yields NULL, and __side
    # already separates the sides, so the extra keys only differentiate
    # equal-(key, ts) RIGHT rows — ascending ⇒ the last-carried right
    # row is the greatest (tiebreak, payload), the deterministic winner
    carry_w = (
        Window.partitionBy(key)
        .orderBy(
            F.col("__ts").asc_nulls_first(),
            F.col("__side").asc(),
            *[F.col(f"__payload.{c}").asc_nulls_first() for c in tb_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_full.unionByName(r_full)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(carry_w))
        .filter(F.col("__side") == 1)
    )
    out = [F.col(c) for c in left.columns]
    out.append(F.col(f"__match.{right_ts}").alias(f"{prefix}{right_ts}"))
    out.extend(
        F.col(f"__match.{c}").alias(f"{prefix}{c}")
        for c in payload_cols
        if c != right_ts
    )
    return matched.select(*out)
