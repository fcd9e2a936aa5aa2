"""Distributed Bloom filter over a key column — the huge-catalog
referential-integrity primitive.

Spark's internal BloomFilterAggregate is not exposed as a SQL function
in this build, so this is the same construction from public pieces:

  build   keys are hashed JVM-side (xxhash64, codegen'd); each scan
          task sets bits into a local numpy bitmap inside one Arrow
          mapInPandas pass (vectorized double hashing: idx_i =
          (h1 + i*h2) mod m); the <= tasks partial bitmaps OR-merge via
          treeAggregate (executor-side combine — the driver never sees
          more than `depth` partials at once).
  probe   the merged bitmap broadcasts once; a vectorized pandas_udf
          tests all k probe positions per Arrow batch.

Guarantee: NO false negatives (a key that was inserted always probes
true), so "might_contain == False" is an EXACT "not present" — the
property referential integrity relies on. False-positive rate with
bits_per_key=10 and k=7 is ~1%, which only sizes the residual exact
join, never the answer.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_MIX = np.uint64(0x9E3779B97F4A7C15)  # 64-bit golden-ratio constant


def _h1_h2(hs: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Split one 64-bit hash into the (h1, h2) pair for double hashing.
    int64 → uint64 via view (bit reinterpret — astype would raise on
    negatives); h2 is forced odd so the probe stride never collapses."""
    h1 = hs.to_numpy(dtype=np.int64).view(np.uint64)
    h2 = ((h1 * _MIX) ^ (h1 >> np.uint64(31))) | np.uint64(1)
    return h1, h2


def build_bloom(
    keys: DataFrame,
    col: str,
    expected_items: int,
    bits_per_key: int = 10,
) -> tuple[bytes, int, int]:
    """One pass over ``keys`` → (bitmap bytes, m_bits, k). Nulls are
    skipped (a null key is never 'present')."""
    if expected_items <= 0:
        raise ValueError(f"expected_items must be positive, got {expected_items}")
    m_bits = max(64, expected_items * bits_per_key)
    k = max(1, round(bits_per_key * math.log(2)))
    m = np.uint64(m_bits)

    h = keys.select(F.xxhash64(F.col(col)).alias("h")).filter(F.col(col).isNotNull())

    def partial(batches):
        bits = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
        seen = False
        for b in batches:
            if not len(b):
                continue
            seen = True
            h1, h2 = _h1_h2(b["h"])
            for i in range(k):
                idx = (h1 + np.uint64(i) * h2) % m
                np.bitwise_or.at(
                    bits, (idx >> np.uint64(3)).astype(np.int64),
                    np.left_shift(np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)),
                )
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = h.mapInPandas(partial, schema="bits binary")
    zero = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    merged = parts.rdd.map(lambda r: r.bits).treeAggregate(
        zero,
        lambda acc, b: acc | np.frombuffer(b, dtype=np.uint8),
        lambda a, b: a | b,
        depth=2,
    )
    return merged.tobytes(), m_bits, k


def might_contain_udf(spark, bitmap: bytes, m_bits: int, k: int):
    """Column function: might_contain(xxhash64_col) — vectorized probe
    against the broadcast bitmap. Input column must be the SAME
    F.xxhash64(key) used at build time."""
    bc = spark.sparkContext.broadcast(bitmap)
    m = np.uint64(m_bits)

    @pandas_udf("boolean")
    def might(hs: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        if not len(hs):
            return pd.Series([], dtype=bool)
        h1, h2 = _h1_h2(hs)
        ok = np.ones(len(h1), dtype=bool)
        for i in range(k):
            idx = (h1 + np.uint64(i) * h2) % m
            ok &= (
                bits[(idx >> np.uint64(3)).astype(np.int64)]
                >> (idx & np.uint64(7)).astype(np.uint8)
            ) & 1 == 1
        return pd.Series(ok)

    def apply(key_col: Column | str) -> Column:
        return might(F.xxhash64(F.col(key_col) if isinstance(key_col, str) else key_col))

    return apply
