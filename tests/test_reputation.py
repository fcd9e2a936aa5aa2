"""Source-reputation filtering: rank rule, eligibility contracts,
NULL handling, the doc-level broadcast filter, and the plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_drift_detector_spark.operators.reputation import (
    drop_low_reputation_sources,
    source_reputation,
)

ROWS = [
    # src a: high scores (mean 0.9), 3 docs
    (1, "a", 0.9), (2, "a", 0.9), (3, "a", 0.9),
    # src b: mid (mean 0.6), 2 docs
    (4, "b", 0.5), (5, "b", 0.7),
    # src c: low (mean 0.2), 2 docs
    (6, "c", 0.1), (7, "c", 0.3),
    # src d: single doc — ineligible at min_docs=2 despite a top score
    (8, "d", 1.0),
    # NULL source — never eligible
    (9, None, 0.8),
    # src e: NULL score only — n_docs counts it, mean is NULL, ranks last
    (10, "e", None), (11, "e", None),
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, source string, q double")


def test_source_reputation_rank_rule_and_eligibility(spark):
    rep = {
        r["source"]: r
        for r in source_reputation(
            _docs(spark), score=F.col("q"), keep_frac=0.5, min_docs=2
        ).collect()
    }
    # eligible: a, b, c, e (4 sources) -> ceil(0.5*4) = 2 keep
    assert rep["a"]["rep_rank"] == 1 and rep["a"]["keep"]
    assert rep["b"]["rep_rank"] == 2 and rep["b"]["keep"]
    assert rep["c"]["rep_rank"] == 3 and not rep["c"]["keep"]
    # NULL mean ranks last (desc_nulls_last)
    assert rep["e"]["rep_rank"] == 4 and not rep["e"]["keep"]
    # single-doc source: ineligible, NULL rank, top score notwithstanding
    assert rep["d"]["rep_rank"] is None and not rep["d"]["keep"]
    # NULL source: ineligible
    assert rep[None]["rep_rank"] is None and not rep[None]["keep"]
    # evidence columns
    assert rep["a"]["n_docs"] == 3 and rep["b"]["mean_score"] == 0.6
    assert rep["e"]["mean_score"] is None  # avg skips NULLs, none left


def test_source_reputation_tie_breaks_on_source_asc(spark):
    rows = [(1, "x", 0.5), (2, "y", 0.5), (3, "z", 0.5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    rep = {
        r["source"]: r["rep_rank"]
        for r in source_reputation(df, score=F.col("q"), keep_frac=1.0).collect()
    }
    assert rep == {"x": 1, "y": 2, "z": 3}


def test_drop_low_reputation_sources_filters_docs(spark):
    kept = {
        r["doc_id"]
        for r in drop_low_reputation_sources(
            _docs(spark), score=F.col("q"), keep_frac=0.5, min_docs=2
        ).collect()
    }
    assert kept == {1, 2, 3, 4, 5}  # sources a and b only


def test_source_reputation_guards(spark):
    with pytest.raises(ValueError, match="keep_frac"):
        source_reputation(_docs(spark), score=F.col("q"), keep_frac=0.0)
    with pytest.raises(ValueError, match="min_docs"):
        source_reputation(_docs(spark), score=F.col("q"), min_docs=0)


def test_drop_low_reputation_plan_broadcasts(spark):
    plan = drop_low_reputation_sources(
        _docs(spark), score=F.col("q")
    )._jdf.queryExecution().executedPlan().toString()
    # the doc-level filter must be a broadcast semi-join: the corpus
    # side is never exchanged for the filter
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
