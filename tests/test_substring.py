"""Substring-level dedup: planted shared boilerplate inside otherwise-
unique documents (the shape document-granular dedup cannot catch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schema_drift_detector_spark.operators.substring import (
    boilerplate_grams,
    strip_repeated_runs,
    substring_dedup,
    token_gram_occurrences,
)

# 8 tokens — exactly one 8-gram when planted, shared by every carrier
FOOTER = "all rights reserved contact legal department for licensing"


def _docs(spark):
    # unique bodies (>= 8 unique tokens each) + the shared footer on
    # carriers; one doc TOO SHORT to gram; one pure-boilerplate doc pair
    rows = [
        (1, f"alpha bravo charlie delta echo foxtrot golf hotel india {FOOTER}"),
        (2, f"kilo lima mike november oscar papa quebec romeo sierra {FOOTER}"),
        (3, f"tango uniform victor whiskey xray yankee zulu one two {FOOTER}"),
        (4, "three four five six seven eight nine ten eleven twelve"),  # clean
        (5, "short doc"),  # < n tokens: no grams, untouched
        (6, FOOTER),  # pure boilerplate → emptied
        (7, FOOTER),  # its duplicate → emptied
        (8, None),  # null text passes through
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_grams_df_threshold(spark):
    docs = _docs(spark)
    # the footer 8-gram occurs in docs 1,2,3,6,7 → df=5
    assert boilerplate_grams(docs, min_df=5).count() == 1
    assert boilerplate_grams(docs, min_df=6).count() == 0
    with pytest.raises(ValueError, match="min_df"):
        boilerplate_grams(docs, min_df=1)


def test_substring_dedup_strips_footer_keeps_bodies(spark):
    out = substring_dedup(_docs(spark), min_df=3).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 8
    # carriers: footer tokens stripped, body verbatim
    assert by_id[1]["text"] == "alpha bravo charlie delta echo foxtrot golf hotel india"
    assert by_id[1]["n_tokens"] == 17 and by_id[1]["n_removed"] == 8
    assert by_id[2]["n_removed"] == 8 and by_id[3]["n_removed"] == 8
    # clean doc untouched
    assert by_id[4]["text"].startswith("three") and by_id[4]["n_removed"] == 0
    # short doc: no grams possible
    assert by_id[5]["text"] == "short doc" and by_id[5]["n_removed"] == 0
    # pure-boilerplate duplicates emptied (substring dedup after exact
    # dedup would never see them; reaching min_df legitimately empties)
    assert by_id[6]["text"] == "" and by_id[6]["n_removed"] == 8
    assert by_id[7]["text"] == ""
    # null text passes through as null
    assert by_id[8]["text"] is None and by_id[8]["n_tokens"] == 0


def test_substring_dedup_overwrites_preexisting_count_columns(spark):
    """Pipelines often precompute n_tokens; substring_dedup must
    overwrite (not duplicate) colliding count columns — a duplicate
    name makes every downstream F.col('n_tokens') ambiguous (round-7
    advisor finding)."""
    docs = _docs(spark).withColumn("n_tokens", F.lit(-1)).withColumn(
        "n_removed", F.lit(-1)
    )
    out = substring_dedup(docs, min_df=3)
    assert out.columns.count("n_tokens") == 1
    assert out.columns.count("n_removed") == 1
    by_id = {r["doc_id"]: r for r in out.collect()}
    # values are THIS pass's, not the stale precomputed -1s
    assert by_id[1]["n_tokens"] == 17 and by_id[1]["n_removed"] == 8
    # and the column stays selectable downstream
    assert out.filter(F.col("n_tokens") > 0).count() > 0


def test_substring_dedup_overlapping_runs(spark):
    # two overlapping boilerplate grams must strip the UNION of their
    # covered ranges, not double-count: plant a 9-token shared run →
    # two overlapping 8-grams, 9 tokens removed
    run = "one two three four five six seven eight nine"
    rows = [
        (1, f"unique alpha text body here {run}"),
        (2, f"different beta words also present {run}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_dedup(docs, min_df=2).collect()}
    assert out[1]["n_removed"] == 9
    assert out[1]["text"] == "unique alpha text body here"
    assert out[2]["text"] == "different beta words also present"


def test_substring_dedup_broadcast_hits_same_result(spark):
    docs = _docs(spark)
    plain = {
        (r["doc_id"], r["text"], r["n_removed"])
        for r in substring_dedup(docs, min_df=3, broadcast_hits=False).collect()
    }
    bcast = {
        (r["doc_id"], r["text"], r["n_removed"])
        for r in substring_dedup(docs, min_df=3, broadcast_hits=True).collect()
    }
    assert plain == bcast


def test_gram_occurrences_positions_are_one_based(spark):
    df = spark.createDataFrame([("a b c d e f g h i",)], "t string")
    row = df.select(token_gram_occurrences("t", 8).alias("g")).first()["g"]
    assert list(row["pos"]) == [1, 2]
    assert len(row["gh"]) == 2 and len(set(row["gh"])) == 2


def test_strip_repeated_runs_periodic_keeps_one_period(spark):
    # 'a b c' × 4 with n=3: every gram after the first period is a
    # repeat of one of the first three grams → exactly one period kept
    rows = [(1, "a b c a b c a b c a b c")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = strip_repeated_runs(docs, n=3).first()
    assert out["text"] == "a b c"
    assert out["n_tokens"] == 12 and out["n_removed"] == 9


def test_strip_repeated_runs_non_adjacent_repeat(spark):
    # the second occurrence of 'one two three' strips even though it is
    # separated from the first — gram identity, not run adjacency
    rows = [(1, "one two three alpha beta gamma one two three")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = strip_repeated_runs(docs, n=3).first()
    assert out["text"] == "one two three alpha beta gamma"
    assert out["n_removed"] == 3


def test_strip_repeated_runs_passthrough_and_doc_locality(spark):
    rows = [
        (1, "all tokens here are distinct from each other entirely"),
        (2, "short doc"),  # < n tokens: no grams
        (3, None),  # null passthrough
        # doc 4 repeats doc 1's text VERBATIM — cross-doc repetition is
        # substring_dedup's job; the intra pass must NOT touch it
        (4, "all tokens here are distinct from each other entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    by_id = {r["doc_id"]: r for r in strip_repeated_runs(docs, n=3).collect()}
    assert by_id[1]["text"] == rows[0][1] and by_id[1]["n_removed"] == 0
    assert by_id[2]["text"] == "short doc" and by_id[2]["n_tokens"] == 2
    assert by_id[3]["text"] is None and by_id[3]["n_tokens"] == 0
    assert by_id[4]["text"] == rows[0][1] and by_id[4]["n_removed"] == 0


def test_strip_repeated_runs_overwrites_count_columns(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b c")], "doc_id long, text string"
    ).withColumn("n_tokens", F.lit(-1)).withColumn("n_removed", F.lit(-1))
    out = strip_repeated_runs(docs, n=3)
    assert out.columns.count("n_tokens") == 1
    assert out.columns.count("n_removed") == 1
    row = out.first()
    assert row["n_tokens"] == 6 and row["n_removed"] == 3
    with pytest.raises(ValueError, match="n must be"):
        strip_repeated_runs(docs, n=0)


def test_strip_repeated_runs_zero_shuffle_plan(spark):
    """Intra-doc repetition is doc-local: the plan must contain NO
    Exchange — the operator is one Arrow eval over the scan."""
    docs = spark.createDataFrame([(1, "a b c a b c")], "doc_id long, text string")
    plan = strip_repeated_runs(docs, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_substring_dedup_materialize_grams_same_result(spark):
    docs = _docs(spark)
    plain = {
        (r["doc_id"], r["text"], r["n_removed"])
        for r in substring_dedup(docs, min_df=3).collect()
    }
    mat = {
        (r["doc_id"], r["text"], r["n_removed"])
        for r in substring_dedup(docs, min_df=3, materialize_grams=True).collect()
    }
    assert plain == mat
    import pytest

    with pytest.raises(ValueError, match="min_df"):
        substring_dedup(docs, min_df=1, materialize_grams=True).collect()
