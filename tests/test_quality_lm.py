"""CCNet-style bigram stupid-backoff perplexity scoring: parity vs a
pure-Python reference, branch coverage, NULL contracts, tiering."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from schema_drift_detector_spark.functions.text import portable_hash60_py
from schema_drift_detector_spark.operators.quality_lm import (
    lm_perplexity,
    ppl_tiers,
)

N_BUCKETS = 64


def _bkt(tok: str) -> int:
    return portable_hash60_py(tok + ":lm") % N_BUCKETS


def _ref_scores(docs, train, alpha=0.5, backoff=0.4, rd=5):
    """Independent pure-Python stupid-backoff scorer (same contract)."""

    def toks(t):
        return [w for w in t.split(" ") if w] if t is not None else []

    uni: dict[int, int] = {}
    big: dict[tuple[int, int], int] = {}
    n_total = 0
    for _, t in train:
        bs = [_bkt(w) for w in toks(t)]
        for b in bs:
            uni[b] = uni.get(b, 0) + 1
            n_total += 1
        for a, b in zip(bs, bs[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1

    def p_uni(b):
        return (uni.get(b, 0) + alpha) / (n_total + alpha * N_BUCKETS)

    out = {}
    for did, t in docs:
        bs = [_bkt(w) for w in toks(t)]
        if not bs:
            out[did] = (None, None, None)
            continue
        lns = [math.log(p_uni(bs[0]))]
        nbo = 0
        for a, b in zip(bs, bs[1:]):
            if (a, b) in big:
                lns.append(math.log(big[(a, b)] / uni[a]))
            else:
                lns.append(math.log(backoff * p_uni(b)))
                nbo += 1
        out[did] = (-sum(lns) / len(lns), len(bs), nbo)
    return out


TRAIN = [
    (100, "the cat sat on the mat and the cat purred"),
    (101, "the dog sat on the rug and barked at the cat"),
]
DOCS = [
    (1, "the cat sat on the mat"),  # fully covered bigrams
    (2, "quantum flux capacitor hums at dawn"),  # unseen vocabulary
    (3, "the cat barked at dawn"),  # mixed: seen + backoff
    (4, None),  # NULL text
    (5, "   "),  # only split artifacts -> zero tokens
]


def _frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    return docs, train


def test_lm_perplexity_matches_pure_python_reference(spark):
    docs, train = _frames(spark)
    out = lm_perplexity(docs, train, n_buckets=N_BUCKETS)
    got = {r["doc_id"]: (r["avg_nll"], r["n_scored"], r["n_backoff"]) for r in out.collect()}
    ref = _ref_scores(DOCS, TRAIN)
    assert set(got) == set(ref)
    for did, (nll, ns, nbo) in ref.items():
        g_nll, g_ns, g_nbo = got[did]
        if nll is None:
            assert g_nll is None and g_ns is None and g_nbo is None
        else:
            # both engines round after a summation whose order differs;
            # one rounding ulp of slack
            assert abs(g_nll - round(nll, 5)) <= 2e-5, (did, g_nll, nll)
            assert (g_ns, g_nbo) == (ns, nbo)


def test_lm_perplexity_branch_coverage_and_ordering(spark):
    docs, train = _frames(spark)
    got = {
        r["doc_id"]: r
        for r in lm_perplexity(docs, train, n_buckets=N_BUCKETS).collect()
    }
    # train covers doc 1's bigrams entirely; doc 2 is all-backoff after
    # its first token; doc 3 takes both branches
    assert got[1]["n_backoff"] == 0
    assert got[2]["n_backoff"] == got[2]["n_scored"] - 1
    assert 0 < got[3]["n_backoff"] < got[3]["n_scored"] - 1
    # in-domain text must score lower NLL than unseen-vocabulary text
    assert got[1]["avg_nll"] < got[3]["avg_nll"] < got[2]["avg_nll"]


def test_lm_perplexity_null_and_collision_contracts(spark):
    docs, train = _frames(spark)
    out = lm_perplexity(docs, train, n_buckets=N_BUCKETS)
    by_id = {r["doc_id"]: r for r in out.collect()}
    for did in (4, 5):  # NULL text and zero-token text both score NULL
        assert by_id[did]["avg_nll"] is None
        assert by_id[did]["n_scored"] is None
    with pytest.raises(ValueError, match="avg_nll"):
        lm_perplexity(out, train, n_buckets=N_BUCKETS)
    with pytest.raises(ValueError, match="alpha"):
        lm_perplexity(docs, train, n_buckets=N_BUCKETS, alpha=0.0)
    with pytest.raises(ValueError, match="backoff"):
        lm_perplexity(docs, train, n_buckets=N_BUCKETS, backoff=0.0)


def test_lm_perplexity_idless_train_scores_identically(spark):
    """train ids are never used — a bare text-only trusted frame must
    produce the same scores as a fully-keyed one."""
    docs, train = _frames(spark)
    keyed = {
        r["doc_id"]: r["avg_nll"]
        for r in lm_perplexity(docs, train, n_buckets=N_BUCKETS).collect()
    }
    bare = {
        r["doc_id"]: r["avg_nll"]
        for r in lm_perplexity(
            docs, train.select("text"), n_buckets=N_BUCKETS
        ).collect()
    }
    assert keyed == bare


def test_ppl_tiers_rejects_tied_thresholds(spark):
    scored = spark.createDataFrame(
        [(1, 0.5)], "doc_id long, avg_nll double"
    )
    # approx_percentile over tied scores can emit equal cutoffs — the
    # middle tier would be silently unreachable, so it must raise
    with pytest.raises(ValueError, match="strictly ascending"):
        ppl_tiers(scored, thresholds=(1.0, 1.0))


def test_ppl_tiers_exact_thirds_and_null_passthrough(spark):
    rows = [(i, float(i)) for i in range(1, 10)] + [(10, None)]
    scored = spark.createDataFrame(rows, "doc_id long, avg_nll double")
    got = {r["doc_id"]: r["ppl_tier"] for r in ppl_tiers(scored).collect()}
    assert [got[i] for i in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    assert got[10] is None  # unscored rows have no tier


def test_ppl_tiers_thresholds_scale_path(spark):
    rows = [(1, 0.5), (2, 1.0), (3, 1.5), (4, None)]
    scored = spark.createDataFrame(rows, "doc_id long, avg_nll double")
    got = {
        r["doc_id"]: r["ppl_tier"]
        for r in ppl_tiers(scored, thresholds=(0.5, 1.0)).collect()
    }
    # boundary values belong to the lower tier (<= cutoff)
    assert got == {1: "head", 2: "middle", 3: "tail", 4: None}
    with pytest.raises(ValueError, match="ascending"):
        ppl_tiers(scored, thresholds=(1.0, 0.5))
    with pytest.raises(ValueError, match="thresholds"):
        ppl_tiers(scored, thresholds=(1.0,), labels=("a", "b", "c"))


_word = st.text(alphabet="abcde", min_size=1, max_size=3)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    doc_texts=st.lists(_doc, min_size=1, max_size=5),
    train_texts=st.lists(_doc, min_size=1, max_size=4),
)
def test_lm_perplexity_property_parity(spark, doc_texts, train_texts):
    docs_rows = [(i, t) for i, t in enumerate(doc_texts)]
    train_rows = [(1000 + i, t) for i, t in enumerate(train_texts)]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["avg_nll"], r["n_scored"], r["n_backoff"])
        for r in lm_perplexity(docs, train, n_buckets=N_BUCKETS).collect()
    }
    ref = _ref_scores(docs_rows, train_rows)
    assert set(got) == set(ref)
    for did, (nll, ns, nbo) in ref.items():
        g_nll, g_ns, g_nbo = got[did]
        if nll is None:
            assert g_nll is None
        else:
            assert abs(g_nll - round(nll, 5)) <= 2e-5
            assert (g_ns, g_nbo) == (ns, nbo)
