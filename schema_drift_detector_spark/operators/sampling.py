"""Deterministic hash-based sampling and splitting.

Training-data pipelines need samples and train/validation splits that
are (a) reproducible bit-for-bit across runs, cluster sizes, and
engines, (b) leakage-free (all rows of a key land on the same side),
and (c) free — a pure filter/projection over the scan, no shuffle, no
state, no RNG seed plumbing. `df.sample`/`sampleBy` give none of that
(partition-order-dependent RNG).

The primitive is the engine's portable 60-bit hash (same kit as the
MinHash oracle path): ``conv(substring(md5(key), 1, 15), 16, 10)``,
reproducible in ANSI SQL as ``CAST('0x' || substr(md5(key), 1, 15) AS
BIGINT)`` — so every operator here is DuckDB-certifiable, and a sample
drawn by any other engine with the same rule is identical.

Scale shape: all pure whole-stage-codegen expressions; selectivity
reaches the scan as an ordinary filter. At 10^12 docs a 1% sample costs
one scan, zero shuffles.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = 1_000_000  # rate resolution: 1e-6


def hash_bucket(key: Column | str, buckets: int = _DENOM) -> Column:
    """Uniform deterministic bucket in [0, buckets) from the portable
    60-bit md5 hash of the key's string form."""
    c = F.col(key) if isinstance(key, str) else key
    h60 = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h60, F.lit(buckets))


def sample_by_hash(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Deterministic ``fraction`` sample: keep rows whose key bucket
    falls below fraction·1e6. Same key → same decision, always."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(hash_bucket(key) < int(round(fraction * _DENOM)))


def stratified_sample_by_hash(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. downsample dominant
    languages, keep all of rare ones). Strata absent from ``fractions``
    use ``default_fraction``. Pure expression — the rate map compiles
    to a when-cascade, no join, no shuffle."""
    for s, f in fractions.items():
        if not (0.0 <= f <= 1.0):
            raise ValueError(f"fraction for stratum {s!r} must be in [0,1], got {f}")
    threshold = F.lit(int(round(default_fraction * _DENOM)))
    for s, f in fractions.items():
        threshold = F.when(
            F.col(strata_col) == s, F.lit(int(round(f * _DENOM)))
        ).otherwise(threshold)
    return df.filter(hash_bucket(key) < threshold)


def split_by_hash(
    df: DataFrame,
    key: str,
    weights: Sequence[float],
    labels: Sequence[str] = ("train", "validation", "test"),
    split_col: str = "split",
) -> DataFrame:
    """Leakage-free dataset split: every row of a key gets the SAME
    label (the split is a function of the key alone), weights need not
    sum to 1 (the remainder falls into the last label). Adds
    ``split_col``; order of ``weights`` matches ``labels``."""
    if len(weights) > len(labels):
        raise ValueError(f"{len(weights)} weights but only {len(labels)} labels")
    if any(w < 0 for w in weights) or sum(weights) > 1.0 + 1e-9:
        raise ValueError(f"weights must be non-negative and sum to <= 1, got {weights}")
    b = hash_bucket(key)
    expr = F.lit(labels[min(len(weights), len(labels) - 1)])
    hi = 0
    bounds = []
    for w in weights:
        hi += int(round(w * _DENOM))
        bounds.append(hi)
    for label, bound in zip(reversed(labels[: len(weights)]), reversed(bounds)):
        expr = F.when(b < bound, F.lit(label)).otherwise(expr)
    return df.withColumn(split_col, expr)
