"""Multi-dimensional data layout: Z-order (Morton) clustering.

The data-layout optimization of Delta Lake's ``OPTIMIZE ZORDER BY`` /
Iceberg's sort-order rewrite, absent from the reference (a metadata
app): interleave the bits of several scan-predicate columns into one
sort key so that range predicates on ANY of the columns touch few
contiguous key ranges — i.e. few files after a sorted write. At 100 TB
this is the difference between a time-range query scanning every file
and scanning ~1/256th of them when the table is laid out by
z(user, time).

Scale shape:
- Per-column min/max bounds come from ONE aggregation broadcast back
  via a single-row cross join (no ``collect``); bucketization and the
  bit interleave are pure codegen integer expressions (shift/and/or
  ARE whole-stage-codegen'd, unlike array higher-order functions).
- ``zorder_layout`` then range-partitions by the z-key and sorts
  within partitions — the exact write shape of a layout-optimizing
  compaction job. ``repartitionByRange`` samples, so the PARTITION
  boundaries are not bit-reproducible; the deterministic, certifiable
  artifacts are the z-values themselves and the coarse ``zbucket``
  (top bits of z), which is what the oracle replays.

Determinism contract: bucketization is ``floor((v - min) * (2^b - 1)
/ (max - min))`` computed in binary64 — exactly reproducible across
engines (IEEE +,-,*,/ and floor are exactly specified, unlike libm
transcendentals). NULL values sort FIRST: a NULL in any z-column
yields bucket 0 for that column (documented; keeps NULLs co-located
rather than scattering them).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_bucket(col: Column, cmin: Column, cmax: Column, n_bits: int) -> Column:
    """Scale a numeric column into [0, 2^n_bits) using broadcast
    min/max bounds. Degenerate range (min == max) and NULL values map
    to bucket 0."""
    hi = (1 << n_bits) - 1
    scaled = F.floor(
        (col.cast("double") - cmin.cast("double"))
        * float(hi)
        / (cmax.cast("double") - cmin.cast("double"))
    )
    return (
        F.when(col.isNull() | (cmax == cmin), F.lit(0))
        .otherwise(F.least(scaled, F.lit(hi)))  # v == max lands on hi, not 2^b
        .cast("long")
    )


def zorder_key(buckets: Sequence[Column], n_bits: int = 16) -> Column:
    """Interleave the low ``n_bits`` of each bucket column into one
    Morton key. Bit i of column c lands at position i*m + (m-1-c)
    (column 0 owns the most significant bit of each group), so equal
    prefixes of z correspond to aligned hyper-rectangles. Requires
    m * n_bits <= 63."""
    m = len(buckets)
    if m < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    if m * n_bits > 63:
        raise ValueError(f"{m} cols x {n_bits} bits exceeds a signed 64-bit key")
    z = F.lit(0).cast("long")
    for c, col in enumerate(buckets):
        v = col.cast("long").bitwiseAND(F.lit((1 << n_bits) - 1))
        for i in range(n_bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * m + (m - 1 - c)))
    return z


def zorder_sql(bucket_exprs: Sequence[str], n_bits: int = 16) -> str:
    """THE DuckDB replay of ``zorder_key`` — the same interleave loop
    emitted as SQL over bucket expressions, shared by certification
    oracles so the two bit layouts cannot desynchronize."""
    m = len(bucket_exprs)
    mask = (1 << n_bits) - 1
    terms = []
    for c, e in enumerate(bucket_exprs):
        for i in range(n_bits):
            # every term FULLY parenthesized: DuckDB/Postgres give
            # <<, >>, &, | EQUAL precedence (left-assoc), so an
            # unwrapped `a << 29 | b << 27` parses as ((a << 29)|b) << 27
            terms.append(
                f"((((({e}) & {mask}) >> {i}) & 1) << {i * m + (m - 1 - c)})"
            )
    return "(" + " | ".join(terms) + ")"


def minmax_bucket_sql(expr: str, min_expr: str, max_expr: str, n_bits: int) -> str:
    """DuckDB replay of ``minmax_bucket`` (binary64 math mirrored
    exactly; degenerate/NULL to bucket 0)."""
    hi = (1 << n_bits) - 1
    scaled = (
        f"floor((CAST({expr} AS DOUBLE) - CAST({min_expr} AS DOUBLE)) * {float(hi)} "
        f"/ (CAST({max_expr} AS DOUBLE) - CAST({min_expr} AS DOUBLE)))"
    )
    return (
        f"CAST(CASE WHEN ({expr}) IS NULL OR ({max_expr}) = ({min_expr}) THEN 0 "
        f"ELSE least({scaled}, {hi}) END AS BIGINT)"
    )


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    *,
    n_bits: int = 16,
    n_partitions: int | None = None,
    z_col: str = "__z",
) -> DataFrame:
    """Append the Morton key and return the frame range-partitioned +
    sorted by it — the write shape of a layout compaction. Writers
    follow with ``.write.parquet(...)`` (optionally
    ``maxRecordsPerFile``) to get z-clustered files whose per-file
    min/max column stats prune on every z-dimension."""
    if z_col in df.columns:
        raise ValueError(f"column {z_col!r} already exists")
    if n_partitions is not None and n_partitions < 1:
        raise ValueError(f"n_partitions must be >= 1, got {n_partitions}")
    internal = {f"__min_{c}" for c in cols} | {f"__max_{c}" for c in cols}
    clash = internal & set(df.columns)
    if clash:
        raise ValueError(
            f"input already carries internal bounds column(s) {sorted(clash)}"
            " — rename them first"
        )
    bounds = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in cols],
        *[F.max(c).alias(f"__max_{c}") for c in cols],
    )
    with_bounds = df.join(F.broadcast(bounds))
    buckets = [
        minmax_bucket(
            F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), n_bits
        )
        for c in cols
    ]
    keyed = with_bounds.withColumn(z_col, zorder_key(buckets, n_bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )
    part = (
        keyed.repartitionByRange(n_partitions, z_col)
        if n_partitions is not None
        else keyed.repartitionByRange(z_col)
    )
    return part.sortWithinPartitions(z_col)
