"""DSIR-style importance scoring: hashed-unigram log-ratio scores
against a target sample, rank-based selection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_drift_detector_spark.operators.importance import (
    bucket_counts,
    dsir_scores,
    select_top_k,
)

TARGET_ROWS = [
    (100, "theorem proof lemma corollary axiom theorem proof induction"),
    (101, "proof by induction over the lemma and the axiom"),
]


def _corpus(spark):
    rows = [
        (1, "theorem proof lemma induction axiom proof theorem"),  # on-target
        (2, "buy cheap pills now limited offer click here"),  # off-target
        (3, "the proof of the theorem uses a lemma"),  # mixed
        (4, None),  # null text: no evidence
        (5, "zebra quark nebula sprocket vortex plinth"),  # unseen tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _target(spark):
    return spark.createDataFrame(TARGET_ROWS, "doc_id long, text string")


def test_dsir_scores_rank_on_target_docs_highest(spark):
    out = dsir_scores(_corpus(spark), _target(spark), n_buckets=128)
    by_id = {r["doc_id"]: r["dsir_score"] for r in out.collect()}
    assert len(by_id) == 5
    # on-target > mixed > off-target; unseen-vocabulary doc is also low
    assert by_id[1] > by_id[3] > by_id[2]
    assert by_id[1] > by_id[5]
    # null text scores NULL, not 0 — no evidence is not neutral evidence
    assert by_id[4] is None


def test_dsir_scores_deterministic_and_occurrence_weighted(spark):
    docs = _corpus(spark)
    tg = _target(spark)
    a = {r["doc_id"]: r["dsir_score"] for r in dsir_scores(docs, tg).collect()}
    b = {r["doc_id"]: r["dsir_score"] for r in dsir_scores(docs, tg).collect()}
    assert a == b
    # occurrences weigh: within ONE scoring run (same ratio table —
    # the background comes from the scored corpus itself, so scores
    # are only comparable inside a run), a doc repeating the same
    # tokens k times scores exactly k x the single copy
    extra = spark.createDataFrame(
        [(6, "theorem proof"), (7, "theorem proof theorem proof theorem proof")],
        "doc_id long, text string",
    )
    by_id = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_scores(docs.unionByName(extra), tg).collect()
    }
    assert by_id[7] == pytest.approx(3 * by_id[6], abs=1e-4)


def test_dsir_validation(spark):
    docs, tg = _corpus(spark), _target(spark)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_scores(docs, tg, n_buckets=1)
    with pytest.raises(ValueError, match="alpha"):
        dsir_scores(docs, tg, alpha=0.0)
    with pytest.raises(ValueError, match="k must be"):
        select_top_k(docs, k=-1)


def test_bucket_counts_bounded_and_total(spark):
    docs = _corpus(spark)
    bc = bucket_counts(docs, n_buckets=16).collect()
    assert all(0 <= r["bucket"] < 16 for r in bc)
    # total bucket mass == total token occurrences over non-null docs
    n_tok = docs.filter("text IS NOT NULL").select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).first()["n"]
    assert sum(r["n"] for r in bc) == n_tok


def test_select_top_k_order_ties_nulls_groups(spark):
    rows = [
        ("a", 1, 2.0),
        ("a", 2, 3.0),
        ("a", 3, 3.0),  # tie with doc 2 → doc 2 wins (id asc)
        ("a", 4, None),  # null ranks last
        ("b", 5, -1.0),
        ("b", 6, None),
    ]
    df = spark.createDataFrame(rows, "src string, doc_id long, dsir_score double")
    picked = {
        (r["src"], r["doc_id"])
        for r in select_top_k(df, k=2, group_col="src").collect()
    }
    # group a: 2 (3.0, lower id) and 3 (3.0); group b: scored doc first,
    # then the null fills the remaining slot
    assert picked == {("a", 2), ("a", 3), ("b", 5), ("b", 6)}
    top1 = {
        (r["src"], r["doc_id"])
        for r in select_top_k(df, k=1, group_col="src").collect()
    }
    assert top1 == {("a", 2), ("b", 5)}
    # global (no group): top-2 overall
    g = {r["doc_id"] for r in select_top_k(df, k=2).collect()}
    assert g == {2, 3}


def test_dsir_scoring_plan_broadcasts_ratio_table(spark):
    """The corpus side must never shuffle for the ratio lookup: the
    bucket ratio table (<= n_buckets rows) joins BROADCAST."""
    out = dsir_scores(_corpus(spark), _target(spark), n_buckets=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
