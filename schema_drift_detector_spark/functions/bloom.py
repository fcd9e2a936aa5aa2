"""Distributed Bloom filter over a key column — the huge-catalog
referential-integrity primitive.

Spark's internal BloomFilterAggregate is not exposed as a SQL function
in this build, so this is the same construction from public pieces:

  build   keys are canonicalized to string and hashed JVM-side
          (xxhash64, codegen'd); an Arrow mapInPandas pass expands each
          key to its k bit indices (vectorized double hashing:
          idx_i = (h1 + i·h2) mod m); indices shuffle to BAND owners
          (each reducer owns one contiguous slice of the bit space) and
          each band builds its slice bitmap; the driver assembles the
          ≤ band_bytes-sized slices. No task ever allocates the full
          bitmap, so m scales past the single-Arrow-cell/task-memory
          cap a per-task-full-bitmap construction hits (~2 GB).
          Shuffle volume: k·|keys| longs — tiny next to the 10^12-ref
          probe side this filter exists to protect.
  probe   the merged bitmap broadcasts once; a vectorized pandas_udf
          tests all k probe positions per Arrow batch.

KEY CANONICALIZATION: both build and probe hash
``xxhash64(cast(key as string))``. An equijoin would coerce mismatched
key dtypes (LONG 123 vs STRING '123'); hashing raw values would not —
casting both sides to string keeps bloom verdicts identical to the
join for any dtype pairing whose string forms agree, and the engine's
media_ref keys are strings throughout.

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
    band_bytes: int = 32 << 20,
    max_bytes: int = 2 << 30,
) -> tuple[bytes, int, int]:
    """One pass over ``keys`` → (bitmap bytes, m_bits, k). Nulls are
    skipped (a null key is never 'present'). Duplicate keys are fine —
    bit-setting is idempotent, so callers need NOT pre-distinct.

    PRACTICAL CEILING (ADVICE r3): the banded build keeps any single
    TASK under ``band_bytes``, but the assembled bitmap still lives on
    the driver and ships as ONE broadcast object — so the usable size
    is bounded by driver memory and Spark's broadcast limit, NOT by the
    build. expected_items·bits_per_key/8 must fit under ``max_bytes``
    (default 2 GiB): ~1.7e9 keys at 10 bits/key. Beyond that, partition
    the catalog and build one filter per shard (probe = OR of shards),
    or lower bits_per_key and accept a higher FP rate (the residual
    exact join still corrects it)."""
    if expected_items <= 0:
        raise ValueError(f"expected_items must be positive, got {expected_items}")
    m_bits = max(64, expected_items * bits_per_key)
    need = (m_bits + 7) // 8
    if need > max_bytes:
        fmt = lambda b: f"{b / 2**30:.1f} GiB" if b >= 1 << 28 else f"{b:,} bytes"
        raise ValueError(
            f"bloom bitmap would be {fmt(need)} "
            f"({expected_items} keys × {bits_per_key} bits/key), over the "
            f"{fmt(max_bytes)} driver/broadcast ceiling (max_bytes). "
            f"Shard the catalog into {math.ceil(need / max_bytes)} "
            f"filters, lower bits_per_key, or raise max_bytes if the driver "
            f"and spark broadcast limits allow it"
        )
    k = max(1, round(bits_per_key * math.log(2)))
    m = np.uint64(m_bits)
    n_bytes = (m_bits + 7) // 8
    band_bits = band_bytes * 8

    h = (
        keys.filter(F.col(col).isNotNull())
        .select(F.xxhash64(F.col(col).cast("string")).alias("h"))
    )

    def indices(batches):
        for b in batches:
            if not len(b):
                continue
            h1, h2 = _h1_h2(b["h"])
            idx = np.concatenate(
                [((h1 + np.uint64(i) * h2) % m) for i in range(k)]
            )
            # m_bits < 2^62 in practice → int64-safe
            yield pd.DataFrame({"idx": idx.astype(np.int64)})

    n_bands = (n_bytes + band_bytes - 1) // band_bytes

    def band_fold(batches):
        # STREAMING fold over Arrow batches — never materializes a
        # band's full index group (a full 32 MB band is ~1.9e8 index
        # rows; applyInPandas would load them as one pandas frame).
        # repartition("band") guarantees a band never splits across
        # partitions; a partition may hold several bands (hash
        # collisions), each owning one band_bytes-sized slice here.
        maps: dict[int, np.ndarray] = {}
        for b in batches:
            if not len(b):
                continue
            bands_arr = b["band"].to_numpy(dtype=np.int64)
            idx = b["idx"].to_numpy(dtype=np.int64)
            for band in np.unique(bands_arr):
                size = min(band_bytes, n_bytes - int(band) * band_bytes)
                bits = maps.setdefault(int(band), np.zeros(size, dtype=np.uint8))
                local = idx[bands_arr == band] - int(band) * band_bits
                np.bitwise_or.at(
                    bits,
                    local >> 3,
                    np.left_shift(np.uint8(1), (local & 7).astype(np.uint8)),
                )
        for band, bits in maps.items():
            yield pd.DataFrame({"band": [band], "bits": [bits.tobytes()]})

    bands = (
        h.mapInPandas(indices, schema="idx long")
        # integer division: a double division would lose exactness for
        # idx >= 2^53 and could route an index to the wrong band (a
        # silent false negative — the one failure mode a bloom RI
        # filter must never have)
        .withColumn("band", F.expr(f"idx div {band_bits}"))
        .repartition(max(n_bands, 1), "band")
        .mapInPandas(band_fold, schema="band long, bits binary")
        .collect()
    )
    merged = np.zeros(n_bytes, dtype=np.uint8)
    for r in bands:
        lo = int(r.band) * band_bytes
        part = np.frombuffer(r.bits, dtype=np.uint8)
        merged[lo : lo + len(part)] |= part
    return merged.tobytes(), m_bits, k


def might_contain_udf(spark, bitmap: bytes, m_bits: int, k: int):
    """Column function: might_contain(key_col) — vectorized probe
    against the broadcast bitmap. Applies the SAME cast-to-string +
    xxhash64 canonicalization as build_bloom."""
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
        c = F.col(key_col) if isinstance(key_col, str) else key_col
        return might(F.xxhash64(c.cast("string")))

    return apply


def bloom_probe_for(
    spark,
    keys: DataFrame,
    col: str,
    bits_per_key: int = 10,
    expected_items: int | None = None,
    max_bytes: int | None = None,
):
    """Build + wrap in one step: the SINGLE sizing/build/broadcast rule
    shared by check_referential_integrity's in-check fallback and
    run_validation's run-scoped prebuild — two call sites encoding the
    rule independently would drift. Returns the probe column function
    (one broadcast, reusable across any number of checks/batches).
    ``max_bytes`` raises build_bloom's driver/broadcast ceiling for
    deployments whose driver is sized for a bigger bitmap (None = the
    build_bloom default)."""
    n = expected_items or max(keys.count(), 1)  # raw count: overestimating
    # vs distinct only makes the filter sparser — no distinct shuffle
    kw = {} if max_bytes is None else {"max_bytes": max_bytes}
    return might_contain_udf(
        spark, *build_bloom(keys.select(col), col, n, bits_per_key, **kw)
    )
