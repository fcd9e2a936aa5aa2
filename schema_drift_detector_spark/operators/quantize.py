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
