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

import math
from collections.abc import Sequence
from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
    hot_keys: Sequence | None = None,
) -> DataFrame:
    """Skew-resilient equi-join: a hot key on the LEFT no longer funnels
    into one reducer.

    Left rows get a PER-ROW salt (a deterministic content hash mod
    buckets — rows of the same key spread across ``salt_buckets``
    reducers even when the key is clustered into one input partition,
    e.g. after a key-partitioned read or groupBy); the RIGHT side is
    replicated ``salt_buckets`` times so every (key, salt) bucket finds
    its match. Output columns = left columns + right's non-key columns,
    exactly as ``left.join(right, key, how)`` would produce. Supported
    how: inner / left / left_outer.

    ``hot_keys`` (the r4-verdict refinement, fed from the certified
    ``heavy_hitters`` — a small list of the measured hot key values):
    salt ONLY rows whose key is hot and replicate ONLY the right rows
    of hot keys; every cold key joins plainly in the same single join
    (constant salt 0 on both sides). Right-side shuffle volume drops
    from total×buckets to cold + hot×buckets — at 100-TB scale the cold
    fraction dominates, so this is ~a buckets-fold reduction of the
    replication shuffle. One scan per side, one join either way; the
    hot list compiles to a codegen isin filter, no extra shuffle.

    DETERMINISM: the salt feeds the join's hash Exchange, so it must be
    reproducible under task retries — a speculative re-execution that
    re-salted a row differently would route it to two reducers (dup) or
    none (loss). Hence xxhash64 over the row's columns, NOT
    monotonically_increasing_id. Content-identical rows of one hot key
    collide into one bucket; fully-duplicated hot rows are the one
    shape this cannot spread (and exactly what duplicate_keys flags).

    Cost model: use for big-big joins where the right side is far
    smaller than the skewed left but too big (or not allowed) to
    broadcast; pass ``hot_keys`` whenever a heavy_hitters pass is
    affordable (it shuffles only metadata-scale sketches).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    # NOT spark_partition_id + hash(key): that is constant per
    # (partition, key), so a hot key clustered in one input partition
    # would still funnel into one reducer. xxhash64 over the row's
    # hashable columns is per-row-content — join RESULTS are identical
    # for any salt assignment, only the balance varies. Map-bearing
    # columns are excluded — Spark's hash expressions reject MapType
    # RECURSIVELY at analysis time, so array<map<...>> and
    # struct<m:map<...>> must be skipped too; a frame whose every
    # column carries a map degenerates to a single bucket, which is
    # correct, just unbalanced.
    hashable = [c for c, t in left.dtypes if "map<" not in t]
    row_salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in hashable]) if hashable else F.lit(0),
        F.lit(salt_buckets),
    )
    all_salts = F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    if hot_keys is None:
        lhs = left.withColumn("__salt", row_salt)
        rhs = right.withColumn("__salt", F.explode(all_salts))
    else:
        hot = list(hot_keys)
        if not hot:
            # measured skew says no hot key: plain join, zero replication
            return left.join(right, on=key, how=how)
        lhs = left.withColumn(
            "__salt", F.when(F.col(key).isin(hot), row_salt).otherwise(F.lit(0))
        )
        rhs = right.withColumn(
            "__salt",
            F.explode(
                F.when(F.col(key).isin(hot), all_salts).otherwise(F.array(F.lit(0)))
            ),
        )
    joined = lhs.join(rhs, on=[key, "__salt"], how=how)
    return joined.drop("__salt")


def heavy_hitters(
    df: DataFrame,
    key: str,
    phi: float,
    support: float | None = None,
) -> DataFrame:
    """EXACT φ-heavy-hitters (keys with frequency ≥ φ·N, i.e.
    ≥ ceil(φ·N) for integer frequencies) without ever shuffling the key
    universe — the hot-key detector that decides which doc_id ranges
    need explicit salting. The threshold is computed in exact integer
    arithmetic: φ's double is first snapped to the nearest small
    rational num/denom (denom ≤ 1e6, so 0.007 means 7/1000 — not its
    binary neighbor 0.00700000000000000014 whose ceil would exclude a
    key sitting exactly on the threshold), then the filter is
    n_occurrences·denom ≥ num·N over DECIMAL(38,0) products, exact at
    any N.

    Two passes, both with metadata-scale shuffles:
      1. candidate sketch: Spark's single-pass frequent-items
         (df.stat.freqItems — batched Misra-Gries, treeAggregate of
         ≤1/support counters per task) guarantees a superset of every
         key with frequency > support; requires support ≤ φ.
      2. exact recount: one scan counting ONLY the broadcast candidates
         (left join tags candidate rows; non-candidates collapse into a
         single null bucket that still contributes to the grand total N),
         then the ceil(φ·N) threshold filter.

    A plain groupBy(key).count() is exact too — but at 10^12 DISTINCT
    doc_ids the aggregation shuffles the whole universe; here nothing
    bigger than tasks×(1/support) partials and the candidate list moves.

    Null keys are not candidates (a null doc_id is a constraint
    violation, not a hot range). Output: key, n_occurrences, share.

    Raises ValueError when: phi outside (0,1); the SNAPPED phi (the
    num/denom rational actually used by the filter) is at or below the
    1e-4 freqItems support floor; support >= snapped phi (recall
    guarantee would not cover threshold keys); or support < 1e-4. All
    guards validate against the snapped value, so the guard and the
    filter always agree on the effective threshold.
    """
    if not (0 < phi < 1):
        raise ValueError(f"phi must be in (0,1), got {phi}")
    # snap FIRST, then validate against the snapped value — the filter
    # below uses frac, so guards on the raw double could pass a phi
    # whose effective (snapped) threshold violates the support interval
    frac = Fraction(phi).limit_denominator(1_000_000)
    phi = float(frac)
    if phi <= 1e-4:
        # support must satisfy 1e-4 <= support < phi — for phi <= 1e-4
        # that interval is empty, so no explicit support can help
        raise ValueError(
            f"phi ({phi}) at or below the Spark freqItems support floor "
            f"(1e-4) is unsupported: no valid support exists"
        )
    support = phi / 2 if support is None else support
    if support >= phi:
        # freqItems guarantees recall only for counts STRICTLY above
        # support·N — at support == phi a key with exactly ceil(phi·N)
        # occurrences meets the output threshold yet sits outside the
        # sketch guarantee and could be evicted
        raise ValueError(f"support ({support}) must be strictly < phi ({phi})")
    if support < 1e-4:
        # Spark's freqItems rejects support < 1e-4 with an opaque py4j
        # error; surface the real constraint at the API boundary
        raise ValueError(
            f"support ({support}) must be >= 1e-4 (Spark freqItems floor); "
            f"pass support explicitly for phi < 2e-4"
        )
    spark = df.sparkSession
    # sketch over the NON-NULL rows: the recall guarantee is relative to
    # the sketched row count, and the output threshold ceil(phi·N) uses
    # N = non-null rows — sketching nulls too would dilute the guarantee
    # below the threshold whenever nulls are plentiful
    nn = df.select(key).filter(F.col(key).isNotNull())
    items = [x for x in nn.stat.freqItems([key], support).first()[0] if x is not None]
    cand = spark.createDataFrame(
        [(x,) for x in items], df.select(key).schema
    ).withColumn("__hit", F.lit(1))
    buckets = (
        nn.join(F.broadcast(cand), key, "left")
        .groupBy(F.when(F.col("__hit").isNotNull(), F.col(key)).alias("__k"))
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    total = buckets.agg(F.sum("n_occurrences").alias("__N"))
    # exact threshold: freq >= phi*N  <=>  freq*denom >= num*N (integer
    # frequencies); DECIMAL(38,0) products stay exact at N ~ 10^12
    # where double math can flip a boundary key (ADVICE r3); frac was
    # snapped above so every guard validated the same effective phi
    return (
        buckets.filter(F.col("__k").isNotNull())
        .crossJoin(F.broadcast(total))
        .filter(
            F.col("n_occurrences").cast("decimal(38,0)") * F.lit(frac.denominator)
            >= F.lit(frac.numerator) * F.col("__N").cast("decimal(38,0)")
        )
        .select(
            F.col("__k").alias(key),
            "n_occurrences",
            (F.col("n_occurrences") / F.col("__N")).alias("share"),
        )
    )


def choose_salt_buckets(
    df: DataFrame,
    key: str,
    phi: float = 0.002,
    max_buckets: int | None = None,
) -> int:
    """Data-driven salting decision — closes the loop from hot-key
    DETECTION (heavy_hitters above) to the uniqueness aggregation's
    ``salt_buckets`` knob, replacing a static guess.

    Sizing rule: with P shuffle partitions, a fair reducer holds ~N/P
    rows; a key of share s funnels s·N rows into one reducer unless it
    is split across ceil(s·P) salt buckets. The hottest key sets the
    requirement: buckets = clamp(ceil(max_share·P), 1, max_buckets).
    1 means "no key is hot enough to matter — skip salting entirely"
    (duplicate_keys then runs the plain one-phase aggregation, saving
    the second shuffle stage).

    Cost: one heavy_hitters pass — a freqItems sketch scan plus a
    broadcast recount scan, both metadata-scale shuffles (the key
    universe never shuffles), amortized over every batch of the run
    that reuses the decision.
    """
    spark = df.sparkSession
    try:
        p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # "auto" under some AQE configs
        p = spark.sparkContext.defaultParallelism
    max_buckets = max_buckets or p
    top = (
        heavy_hitters(df, key, phi)
        .agg(F.max("share").alias("s"))
        .first()[0]
    )
    if top is None:
        return 1
    return max(1, min(max_buckets, math.ceil(float(top) * p)))
