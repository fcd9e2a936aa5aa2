"""Mergeable quantile sketch: a compact t-digest (Dunning & Ertl)
implemented in numpy, serialized to bytes so it can live in profile
rows (BinaryType) and merge across partitions/epochs without touching
data again — the quantile counterpart of the HLL sketches.

Design constraints (SURVEY §7.4): merge must be associative/commutative
up to compression error; serialization is a plain little-endian numpy
layout (version byte + centroid means + weights) so any round can read
old sketches.

Sizes: at delta=128 a sketch is ~2 KB — 10^12 docs × 10^5 partitions of
profile rows stay metadata-scale.
"""

from __future__ import annotations

import numpy as np

_VERSION = 1


def build(values: np.ndarray, delta: int = 128) -> bytes:
    """Build a t-digest from raw values (one partition's column)."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if len(v) == 0:
        return serialize(np.empty(0), np.empty(0))
    v.sort()
    return serialize(*_compress(v, np.ones(len(v)), delta))


def _compress(means: np.ndarray, weights: np.ndarray, delta: int) -> tuple[np.ndarray, np.ndarray]:
    """Greedy size-capped compression with the scale function
    k(q) = delta/2 * (asin(2q-1)/pi + 1/2) — caps centroid count at
    ~delta while keeping tails fine-grained. Inputs must be sorted.

    Vectorized: one cumulative-sum pass over the inputs, then ONE loop
    iteration per OUTPUT centroid (≤ ~delta + tails) using searchsorted
    to find each centroid's absorption cut — build() over 10^6 raw
    values must not spend 10^6 Python iterations on the
    tdigest_profiles hot path. Same greedy rule as the per-element
    form: absorb the longest prefix whose weight fits the k-limit cap,
    with at least one element."""
    total = weights.sum()
    if len(means) <= delta:
        return means.copy(), weights.copy()
    n = len(means)
    cw = np.cumsum(weights)                # inclusive cumulative weight
    cmw = np.cumsum(means * weights)       # cumulative weighted mean sum
    out_m, out_w = [], []
    i = 0
    q0 = 0.0
    while i < n:
        k0 = _k(q0, delta)
        q_limit = _k_inv(k0 + 1.0, delta)
        cap = max(q_limit * total - q0 * total, 1.0)
        base_w = cw[i - 1] if i > 0 else 0.0
        base_m = cmw[i - 1] if i > 0 else 0.0
        # largest j with cw[j] - base_w <= cap, but at least element i
        j = np.searchsorted(cw, base_w + cap, side="right") - 1
        j = max(j, i)
        w_acc = cw[j] - base_w
        m_acc = cmw[j] - base_m
        out_m.append(m_acc / w_acc)
        out_w.append(w_acc)
        q0 += w_acc / total
        i = j + 1
    return np.array(out_m), np.array(out_w)


def _k(q: float, delta: int) -> float:
    return delta / 2.0 * (np.arcsin(2.0 * min(max(q, 0.0), 1.0) - 1.0) / np.pi + 0.5)


def _k_inv(k: float, delta: int) -> float:
    x = np.sin((min(k, float(delta)) / (delta / 2.0) - 0.5) * np.pi)
    return (x + 1.0) / 2.0


def serialize(means: np.ndarray, weights: np.ndarray) -> bytes:
    head = np.array([_VERSION, len(means)], dtype="<i8").tobytes()
    return head + means.astype("<f8").tobytes() + weights.astype("<f8").tobytes()


def deserialize(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    if not blob:
        return np.empty(0), np.empty(0)
    # explicit validation (not assert — stripped under -O): a truncated
    # or foreign blob must fail HERE with a clear message, not deep in
    # np.interp with a shape error
    if len(blob) < 16:
        raise ValueError(f"corrupt t-digest blob: {len(blob)} bytes, need >= 16")
    ver, n = np.frombuffer(blob[:16], dtype="<i8")
    if ver != _VERSION:
        raise ValueError(f"unknown t-digest version {ver} (expected {_VERSION})")
    if n < 0 or len(blob) < 16 + 16 * n:
        raise ValueError(
            f"corrupt t-digest blob: header says {n} centroids but only "
            f"{len(blob)} bytes present"
        )
    means = np.frombuffer(blob[16 : 16 + 8 * n], dtype="<f8")
    weights = np.frombuffer(blob[16 + 8 * n : 16 + 16 * n], dtype="<f8")
    return means.copy(), weights.copy()


def merge(blobs: list[bytes], delta: int = 128) -> bytes:
    """Associative/commutative merge: concatenate centroids, sort,
    recompress. merge([a, b]) ≈ merge([b, a]) within compression error."""
    ms, ws = [], []
    for b in blobs:
        m, w = deserialize(b)
        ms.append(m)
        ws.append(w)
    if not ms:
        return serialize(np.empty(0), np.empty(0))
    m = np.concatenate(ms)
    w = np.concatenate(ws)
    order = np.argsort(m, kind="mergesort")
    return serialize(*_compress(m[order], w[order], delta))


def total_weight(blob: bytes) -> float:
    _, w = deserialize(blob)
    return float(w.sum())


def cdf(blob: bytes, xs: np.ndarray) -> np.ndarray:
    """Empirical CDF at points xs (mid-centroid interpolation)."""
    m, w = deserialize(blob)
    if len(m) == 0:
        return np.zeros(len(xs))
    cum = np.cumsum(w) - w / 2.0
    total = w.sum()
    return np.interp(xs, m, cum / total, left=0.0, right=1.0)


def quantile(blob: bytes, q: float) -> float:
    m, w = deserialize(blob)
    if len(m) == 0:
        return float("nan")
    cum = (np.cumsum(w) - w / 2.0) / w.sum()
    return float(np.interp(q, cum, m))


def ks_statistic(a: bytes, b: bytes) -> float:
    """KS distance between two digests: max |CDF_a - CDF_b| evaluated
    at the union of centroid locations."""
    ma, _ = deserialize(a)
    mb, _ = deserialize(b)
    if len(ma) == 0 or len(mb) == 0:
        return 0.0
    xs = np.union1d(ma, mb)
    return float(np.abs(cdf(a, xs) - cdf(b, xs)).max())
