"""Scalar quantization (SQ8) for embedding columns.

At 100 TB the ANN index's memory footprint is the cost driver: float32
vectors at 64-4096 dims dominate executor memory and shuffle IO. SQ8
(per-dimension min/max scalar quantization to 8-bit codes — the
Faiss `ScalarQuantizer`/Milvus SQ8 shape) cuts that 4x with a bounded,
measurable recall cost, and search stays ASYMMETRIC (full-precision
queries against dequantized corpus codes — ADC), so query-side
precision is never lost.

Deterministic + exactly replayable in ANSI SQL:
  - Range fit: per-dimension lo = min, hi = max over VALID vectors
    (non-NULL, exactly `dim` long, all-finite). min/max have no
    summation-order sensitivity, so the fit is bit-exact cross-engine.
  - Encode: code_d = floor((x_d - lo_d) / (hi_d - lo_d) * (levels-1)
    + 0.5), computed in float64 in exactly this operation order both
    engines, CLAMPED to [0, levels-1] (encoding vectors a fitted range
    has not seen — the incremental-index case — clamps to the edge
    codes); a constant dimension (hi == lo) encodes 0. floor(v + 0.5)
    is used instead of round() so the rule is one IEEE expression with
    no engine rounding-mode reliance (v is >= 0 for in-range values).
  - Decode: x̂_d = lo_d + code_d / (levels-1) * (hi_d - lo_d) — same
    order both engines; constant dimensions decode to lo exactly
    (their code is pinned 0).
  - Invalid vectors encode to NULL codes (and are EXCLUDED from the
    range fit) — no evidence is not zero evidence.

Scale shape:
  - Range fit is ONE corpus scan: an Arrow `mapInPandas` pass emits
    d-row (dim, lo, hi) partials PER BATCH (never the N x d exploded
    rows a posexplode plan would shuffle), then a tiny groupBy(dim)
    reduces batches x d rows.
  - The fitted range is d rows — metadata-scale; collecting it to the
    driver (`fit_sq8`) is the same audited pattern as k-means
    centroids.
  - Encode/decode are Arrow batch passes with the range broadcast in
    the UDF closure; no join, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _valid_mask(vals: np.ndarray, dim: int) -> np.ndarray:
    return np.array(
        [
            v is not None
            and len(v) == dim
            and bool(np.isfinite(np.asarray(v, dtype=np.float64)).all())
            for v in vals
        ]
    )


def embedding_range(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """(dim, lo, hi) per dimension over the VALID vectors — one Arrow
    scan emitting per-batch partials, then a batches x d aggregation.
    `dim` is explicit and checked (a silently-inferred width would let
    a mixed-model table fit a nonsense range)."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")

    def partials(batches):
        for pdf in batches:
            vals = pdf[vec_col].to_numpy()
            m = _valid_mask(vals, dim)
            if not m.any():
                continue
            x = np.vstack(vals[m]).astype(np.float64)
            yield pd.DataFrame(
                {
                    "dim": np.arange(dim, dtype=np.int32),
                    "lo": x.min(axis=0),
                    "hi": x.max(axis=0),
                }
            )

    parts = df.select(vec_col).mapInPandas(partials, "dim int, lo double, hi double")
    return parts.groupBy("dim").agg(
        F.min("lo").alias("lo"), F.max("hi").alias("hi")
    )


def fit_sq8(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> tuple[list[float], list[float]]:
    """Collect the fitted range as (lo, hi) float lists — d rows,
    metadata-scale (the k-means-centroid collect pattern). Fails loud
    when no valid vector exists (an all-invalid corpus has no range)."""
    rows = embedding_range(df, vec_col, dim).collect()
    if len(rows) != dim:
        raise ValueError(
            f"range fit produced {len(rows)} of {dim} dimensions — "
            f"no valid {dim}-wide vector in {vec_col}?"
        )
    by_dim = {r["dim"]: (r["lo"], r["hi"]) for r in rows}
    lo = [by_dim[i][0] for i in range(dim)]
    hi = [by_dim[i][1] for i in range(dim)]
    return lo, hi


def _check_range(lo: list[float], hi: list[float], levels: int) -> None:
    if not (2 <= levels <= 65536):
        raise ValueError(f"levels must be in [2, 65536], got {levels}")
    if len(lo) != len(hi) or not lo:
        raise ValueError(f"lo/hi must be equal-length non-empty, got {len(lo)}/{len(hi)}")
    bad = [i for i, (a, b) in enumerate(zip(lo, hi)) if not (np.isfinite(a) and np.isfinite(b) and a <= b)]
    if bad:
        raise ValueError(f"non-finite or inverted range at dims {bad[:5]}")


def sq8_encode(
    vec: Column | str, lo: list[float], hi: list[float], levels: int = 256
) -> Column:
    """array<int> codes column (NULL for invalid vectors). Column form:
    compose it into any select; the range rides the UDF closure, so no
    join touches the corpus."""
    _check_range(lo, hi, levels)
    c = F.col(vec) if isinstance(vec, str) else vec
    lo_a = np.asarray(lo, dtype=np.float64)
    span = np.asarray(hi, dtype=np.float64) - lo_a
    maxc = float(levels - 1)
    dim = len(lo)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _enc(xs: pd.Series) -> pd.Series:
        vals = xs.to_numpy()
        out = [None] * len(vals)
        if len(vals):
            m = _valid_mask(vals, dim)
            if m.any():
                x = np.vstack(vals[m]).astype(np.float64)
                # one IEEE expression, same operation order as the SQL
                # replay; span==0 dims are pinned to code 0
                with np.errstate(divide="ignore", invalid="ignore"):
                    codes = np.floor((x - lo_a) / span * maxc + 0.5)
                codes[:, span == 0.0] = 0.0
                # values OUTSIDE the fitted range clamp to the edge
                # codes (encoding new vectors with a previously-fitted
                # range is the normal incremental-index case)
                codes = np.clip(codes, 0.0, maxc).astype(np.int32)
                for j, i in enumerate(np.flatnonzero(m)):
                    out[i] = codes[j]
        return pd.Series(out, dtype=object)

    return _enc(c)


def sq8_decode(
    codes: Column | str, lo: list[float], hi: list[float], levels: int = 256
) -> Column:
    """array<double> dequantized vectors (NULL codes stay NULL) — the
    ADC corpus side for asymmetric search."""
    _check_range(lo, hi, levels)
    c = F.col(codes) if isinstance(codes, str) else codes
    lo_a = np.asarray(lo, dtype=np.float64)
    span = np.asarray(hi, dtype=np.float64) - lo_a
    maxc = float(levels - 1)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _dec(xs: pd.Series) -> pd.Series:
        vals = xs.to_numpy()
        out = [None] * len(vals)
        if len(vals):
            m = np.array([v is not None for v in vals])
            if m.any():
                k = np.vstack(vals[m]).astype(np.float64)
                deq = lo_a + k / maxc * span
                for j, i in enumerate(np.flatnonzero(m)):
                    out[i] = deq[j]
        return pd.Series(out, dtype=object)

    return _dec(c)


def pq_fit_deterministic(
    corpus: DataFrame,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic PQ codebook: the `ks` corpus vectors with the
    smallest (md5(cast(id as string)), id) — the same reproducible
    pick rule deterministic_centroids uses (TakeOrderedAndProject, no
    global sort) — sliced into `m` contiguous subspaces of dim/m.
    Returns an (m, ks, dim/m) float64 array (metadata-scale; rides the
    encode/decode UDF closures). Fails loud on a pick containing an
    invalid vector (NULL / ragged / non-finite) — a codebook built on
    garbage would silently quantize everything to garbage.

    Production path: train per-subspace k-means instead and pass the
    resulting array; every consumer below takes the codebook by value."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    if not (2 <= ks <= 256):
        raise ValueError(f"ks must be in [2, 256] (8-bit codes), got {ks}")
    rows = (
        corpus.select(
            F.md5(F.col(id_col).cast("string")).alias("__hk"),
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("vec"),
        )
        .orderBy(F.col("__hk").asc(), F.col("__id").asc())
        .limit(ks)
        .collect()
    )
    if len(rows) < ks:
        raise ValueError(f"corpus has {len(rows)} rows, need >= ks={ks}")
    vecs = [r["vec"] for r in rows]
    mask = _valid_mask(np.array(vecs, dtype=object), dim)
    if not mask.all():
        bad = [rows[i]["__id"] for i in np.flatnonzero(~mask)]
        raise ValueError(f"picked codebook vectors invalid at ids {bad[:5]}")
    cb = np.vstack(vecs).astype(np.float64)  # (ks, dim)
    dsub = dim // m
    return np.stack([cb[:, s * dsub : (s + 1) * dsub] for s in range(m)])


def _check_codebook(codebook: np.ndarray) -> tuple[int, int, int]:
    cb = np.asarray(codebook, dtype=np.float64)
    if cb.ndim != 3:
        raise ValueError(f"codebook must be (m, ks, dsub), got shape {cb.shape}")
    if not np.isfinite(cb).all():
        raise ValueError("codebook contains non-finite values")
    return cb.shape


def pq_encode(vec: Column | str, codebook: np.ndarray) -> Column:
    """array<int> of `m` codes — per subspace, the L2-nearest codebook
    row (first-min tie-break = lowest code id, matching the SQL replay's
    (dist ASC, code_id ASC) rank). Distances use the literal
    sum((x-c)^2) formula — the same arithmetic the DuckDB replay's
    list_distance computes — so the argmin ORDERING is cross-engine
    stable, not just close. Invalid vectors encode NULL. One Arrow
    pass; the codebook rides the closure, no join."""
    cb = np.asarray(codebook, dtype=np.float64)
    m, ks, dsub = _check_codebook(cb)
    dim = m * dsub
    c = F.col(vec) if isinstance(vec, str) else vec
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _enc(xs: pd.Series) -> pd.Series:
        vals = xs.to_numpy()
        out = [None] * len(vals)
        if len(vals):
            msk = _valid_mask(vals, dim)
            if msk.any():
                x = np.vstack(vals[msk]).astype(np.float64)
                xs3 = x.reshape(len(x), m, dsub)
                codes = np.empty((len(x), m), dtype=np.int32)
                for s in range(m):
                    # (n, ks): same formula as SQL list_distance (sans
                    # the order-preserving sqrt)
                    d2 = ((xs3[:, s, None, :] - cb[s][None, :, :]) ** 2).sum(-1)
                    codes[:, s] = d2.argmin(axis=1)
                for j, i in enumerate(np.flatnonzero(msk)):
                    out[i] = codes[j]
        return pd.Series(out, dtype=object)

    return _enc(c)


def pq_decode(codes: Column | str, codebook: np.ndarray) -> Column:
    """array<double> reconstruction: concatenated per-subspace codebook
    rows (NULL codes stay NULL). Exact — the codebook IS the value."""
    cb = np.asarray(codebook, dtype=np.float64)
    m, ks, dsub = _check_codebook(cb)
    c = F.col(codes) if isinstance(codes, str) else codes
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _dec(xs: pd.Series) -> pd.Series:
        vals = xs.to_numpy()
        out = [None] * len(vals)
        for i, v in enumerate(vals):
            if v is not None:
                k = np.asarray(v, dtype=np.int64)
                out[i] = np.concatenate([cb[s, k[s]] for s in range(m)])
        return pd.Series(out, dtype=object)

    return _dec(c)


def topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric top-k, reconstruction form: encode -> decode ->
    full-precision-query cosine -> window rank (the certifiable
    semantics; topk_pq_adc is the equal-answer LUT fast path). Same
    output contract as topk_bruteforce."""
    from .ann import topk_bruteforce

    deq = corpus.select(
        F.col(id_col),
        pq_decode(pq_encode(vec_col, codebook), codebook).alias("__deq"),
    )
    return topk_bruteforce(
        deq, queries, k=k, id_col=id_col, vec_col="__deq",
        query_id_col=id_col, query_vec_col=vec_col,
    )


def topk_pq_adc(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric top-k, LUT form — the 100 TB scorer: per query,
    precompute the (m, ks) table of query-subvector · codebook-row dots
    plus the (m, ks) codebook-row squared norms ONCE, then each corpus
    row's cosine is m table lookups instead of a dim-wide dot
    (dim=4096, m=16: 256x less multiply work per candidate). Computes
    cos(query, reconstruction) EXACTLY like topk_pq up to FP summation
    order (equality tested on separable data); scores round 6dp, ties
    break on vec_id. Corpus codes never decode."""
    cb = np.asarray(codebook, dtype=np.float64)
    m, ks, dsub = _check_codebook(cb)
    dim = m * dsub
    from pyspark.sql.functions import pandas_udf

    cb_norm2 = (cb ** 2).sum(-1)  # (m, ks)

    @pandas_udf("double")
    def _adc(codes: pd.Series, qvecs: pd.Series) -> pd.Series:
        cvals = codes.to_numpy()
        qvals = qvecs.to_numpy()
        # None (not NaN): Spark sorts NaN ABOVE every number, so a NaN
        # score would outrank real matches; NULLs drop from the ranking
        # (the cosine_arrow invalid-row contract)
        out = [None] * len(cvals)
        for i, (cd, qv) in enumerate(zip(cvals, qvals)):
            if cd is None or qv is None or len(qv) != dim:
                continue
            q = np.asarray(qv, dtype=np.float64)
            if not np.isfinite(q).all():
                continue
            qs = q.reshape(m, dsub)
            lut = np.einsum("sd,skd->sk", qs, cb)  # (m, ks) dots
            kk = np.asarray(cd, dtype=np.int64)
            idx = (np.arange(m), kk)
            num = lut[idx].sum()
            den = np.sqrt((q ** 2).sum()) * np.sqrt(cb_norm2[idx].sum())
            if den > 0:
                out[i] = num / den
        return pd.Series(out, dtype=object)

    from pyspark.sql import Window

    enc = corpus.select(
        F.col(id_col).alias("vec_id"), pq_encode(vec_col, codebook).alias("__codes")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = enc.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(_adc(F.col("__codes"), F.col("qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos_sim")
    )


def topk_sq8(
    corpus: DataFrame,
    queries: DataFrame,
    lo: list[float],
    hi: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
) -> DataFrame:
    """Asymmetric (ADC) exact top-k over the SQ8-compressed corpus:
    encode -> decode -> full-precision-query cosine -> window rank.
    Same output contract as topk_bruteforce (query_id, rank, vec_id,
    cos_sim rounded 6dp); invalid corpus vectors score NULL and drop
    from the ranking, the cosine_arrow contract."""
    from .ann import topk_bruteforce

    deq = corpus.select(
        F.col(id_col),
        sq8_decode(sq8_encode(vec_col, lo, hi, levels), lo, hi, levels).alias(
            "__deq"
        ),
    )
    return topk_bruteforce(
        deq, queries, k=k, id_col=id_col, vec_col="__deq",
        query_id_col=id_col, query_vec_col=vec_col,
    )
