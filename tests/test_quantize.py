"""SQ8 scalar quantization: range fit, encode/decode round-trip and
error bound, clamping, validity contracts, ADC search parity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from schema_drift_detector_spark.operators.quantize import (
    embedding_range,
    fit_sq8,
    pq_decode,
    pq_encode,
    pq_fit_deterministic,
    sq8_decode,
    sq8_encode,
    topk_pq,
    topk_pq_adc,
    topk_sq8,
)

DIM = 4


def _vecs(spark):
    rows = [
        (0, [0.0, -1.0, 5.0, 2.5]),
        (1, [1.0, 1.0, 5.0, 2.5]),
        (2, [0.5, 3.0, 5.0, 2.5]),
        (3, None),                      # NULL vector
        (4, [1.0, 2.0]),                # ragged
        (5, [0.2, float("nan"), 5.0, 2.5]),  # non-finite
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_range_excludes_invalid_rows(spark):
    rng = {r["dim"]: (r["lo"], r["hi"]) for r in embedding_range(_vecs(spark), dim=DIM).collect()}
    # only vec 0,1,2 are valid
    assert rng == {0: (0.0, 1.0), 1: (-1.0, 3.0), 2: (5.0, 5.0), 3: (2.5, 2.5)}


def test_fit_sq8_fails_loud_without_valid_vectors(spark):
    df = spark.createDataFrame([(1, None)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no valid"):
        fit_sq8(df, dim=DIM)


def test_sq8_encode_decode_contracts(spark):
    df = _vecs(spark)
    lo, hi = fit_sq8(df, dim=DIM)
    out = {
        r["vec_id"]: (r["codes"], r["deq"])
        for r in df.select(
            "vec_id",
            sq8_encode("embedding", lo, hi).alias("codes"),
            sq8_decode(sq8_encode("embedding", lo, hi), lo, hi).alias("deq"),
        ).collect()
    }
    # invalid vectors -> NULL codes and NULL dequant
    for vid in (3, 4, 5):
        assert out[vid] == (None, None)
    # range endpoints hit the edge codes; constant dims encode 0 and
    # decode to lo exactly
    assert out[0][0] == [0, 0, 0, 0] and out[1][0][0] == 255
    assert out[0][1][2] == 5.0 and out[0][1][3] == 2.5
    # round-trip error bounded by half a quantization step per dim
    for vid, raw in ((0, [0.0, -1.0, 5.0, 2.5]), (1, [1.0, 1.0, 5.0, 2.5]), (2, [0.5, 3.0, 5.0, 2.5])):
        deq = out[vid][1]
        for d, (x, xq) in enumerate(zip(raw, deq)):
            step = (hi[d] - lo[d]) / 255 if hi[d] > lo[d] else 0.0
            assert abs(x - xq) <= step / 2 + 1e-12


def test_sq8_encode_clamps_out_of_range(spark):
    lo, hi = [0.0] * DIM, [1.0] * DIM
    df = spark.createDataFrame(
        [(0, [-5.0, 2.0, 0.5, 1.0])], "vec_id long, embedding array<double>"
    )
    codes = df.select(sq8_encode("embedding", lo, hi).alias("c")).first()["c"]
    assert codes[0] == 0 and codes[1] == 255  # clamped, not wrapped
    assert codes[2] == 128 and codes[3] == 255  # floor(0.5*255+0.5)=128


def test_sq8_guards(spark):
    with pytest.raises(ValueError, match="levels"):
        sq8_encode("embedding", [0.0], [1.0], levels=1)
    with pytest.raises(ValueError, match="equal-length"):
        sq8_encode("embedding", [0.0, 1.0], [1.0])
    with pytest.raises(ValueError, match="inverted"):
        sq8_encode("embedding", [1.0], [0.0])


def test_topk_sq8_matches_exact_on_separable_data(spark):
    """ADC search over a quantized corpus must agree with exact search
    when neighbors are well separated (the quantization error is far
    below the similarity gaps)."""
    from schema_drift_detector_spark.operators.ann import topk_bruteforce

    rng = np.random.RandomState(7)
    base = rng.randn(6, 16)
    rows = []
    vid = 0
    for b in base:
        for _ in range(5):
            rows.append((vid, (b + rng.randn(16) * 0.01).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lo, hi = fit_sq8(df, dim=16)
    queries = df.filter(F.col("vec_id") % 5 == 0)
    exact = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in topk_bruteforce(df, queries, k=5).collect()
    }
    adc = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in topk_sq8(df, queries, lo, hi, k=5).collect()
    }
    # same member set per query (ranks within a cluster may swap under
    # sub-step noise; membership may not)
    for q in {k[0] for k in exact}:
        assert {v for (qq, _), v in exact.items() if qq == q} == {
            v for (qq, _), v in adc.items() if qq == q
        }


# ---------------------------------------------------------------- PQ


def _clustered(spark, n_clusters=6, per=5, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    base = rng.randn(n_clusters, dim)
    rows, vid = [], 0
    for b in base:
        for _ in range(per):
            rows.append((vid, (b + rng.randn(dim) * 0.01).tolist()))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_fit_guards(spark):
    df = _vecs(spark)
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit_deterministic(df, m=3, ks=2, dim=DIM)
    with pytest.raises(ValueError, match="ks must be"):
        pq_fit_deterministic(df, m=2, ks=1, dim=DIM)
    # the md5 pick over _vecs lands on an invalid vector -> loud
    with pytest.raises(ValueError, match="invalid"):
        pq_fit_deterministic(df, m=2, ks=4, dim=DIM)


def test_pq_encode_decode_contracts(spark):
    df = _clustered(spark)
    cb = pq_fit_deterministic(df, m=4, ks=8, dim=16)
    assert cb.shape == (4, 8, 4)
    out = {
        r["vec_id"]: (r["codes"], r["deq"])
        for r in df.select(
            "vec_id",
            pq_encode("embedding", cb).alias("codes"),
            pq_decode(pq_encode("embedding", cb), cb).alias("deq"),
        ).collect()
    }
    for vid, (codes, deq) in out.items():
        assert len(codes) == 4 and all(0 <= c < 8 for c in codes)
        # decode is EXACTLY the concatenated codebook rows
        expect = np.concatenate([cb[s, codes[s]] for s in range(4)])
        assert np.array_equal(np.asarray(deq), expect)
    # a codebook-member vector encodes to itself (distance 0 in every
    # subspace) -> its reconstruction is bit-identical to the input
    raw = {r["vec_id"]: np.asarray(r["embedding"]) for r in df.collect()}
    self_hits = sum(
        1 for vid, (codes, deq) in out.items()
        if np.array_equal(np.asarray(deq), raw[vid])
    )
    assert self_hits == 8  # exactly the ks=8 picked codebook members


def test_pq_invalid_vectors_null(spark):
    df = _vecs(spark)
    cb = np.zeros((2, 2, 2))
    cb[:, 1, :] = 1.0
    rows = {r["vec_id"]: r["c"] for r in df.select("vec_id", pq_encode("embedding", cb).alias("c")).collect()}
    for vid in (3, 4, 5):
        assert rows[vid] is None
    assert rows[0] is not None


def test_topk_pq_adc_equals_reconstruction(spark):
    """The LUT scorer and the decode-then-cosine scorer are the same
    math up to summation order: same membership and same 6dp scores on
    separable data."""
    df = _clustered(spark)
    cb = pq_fit_deterministic(df, m=4, ks=8, dim=16)
    from pyspark.sql import functions as FF
    queries = df.filter(FF.col("vec_id") % 5 == 0)
    rec = {(r["query_id"], r["vec_id"]): r["cos_sim"] for r in topk_pq(df, queries, cb, k=5).collect()}
    adc = {(r["query_id"], r["vec_id"]): r["cos_sim"] for r in topk_pq_adc(df, queries, cb, k=5).collect()}
    assert set(rec) == set(adc)
    for key in rec:
        assert abs(rec[key] - adc[key]) <= 1e-6


def test_topk_pq_recall_on_separable_data(spark):
    """With one codebook row near each cluster center, PQ recall@k must
    be exact on well-separated clusters."""
    from schema_drift_detector_spark.operators.ann import topk_bruteforce

    df = _clustered(spark, n_clusters=4, per=6, dim=16)
    cb = pq_fit_deterministic(df, m=4, ks=16, dim=16)
    queries = df.filter(F.col("vec_id") % 6 == 0)
    exact = topk_bruteforce(df, queries, k=6).collect()
    pq = topk_pq(df, queries, cb, k=6).collect()
    for q in {r["query_id"] for r in exact}:
        me = {r["vec_id"] for r in exact if r["query_id"] == q}
        mp = {r["vec_id"] for r in pq if r["query_id"] == q}
        assert len(me & mp) / 6 >= 5 / 6
