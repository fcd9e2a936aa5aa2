"""Benchmark decontamination (operators/decontam.py): overlap
semantics, normalization, short-doc guard, and the broadcast-join plan
shape the 100-TB posture depends on."""

from __future__ import annotations

import pyspark.sql.functions as F

from schema_drift_detector_spark.operators.decontam import (
    contamination_hits,
    decontaminate,
    eval_gram_hashes,
    word_ngram_hashes,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_flags_normalized_overlap(spark):
    """A doc is flagged iff it shares a normalized word n-gram —
    case/punctuation differences must not hide the overlap, and hit
    counts are distinct-gram counts."""
    corpus = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog every single day"),
            (2, "Completely unrelated text about spark partitions and shuffles here"),
            (3, "quick BROWN fox... jumps over the lazy dog!! every single"),
            (4, "too short"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], ["eid", "text"]
    )
    clean, hits = decontaminate(corpus, eval_df, n=8)
    # eval text = 9 tokens -> two 8-grams; doc 1 contains both, doc 3's
    # normalized form contains exactly the second
    assert sorted((r.doc_id, r.n_hit_grams) for r in hits.collect()) == [(1, 2), (3, 1)]
    assert sorted(r.doc_id for r in clean.collect()) == [2, 4]


def test_short_docs_and_short_eval_rows_yield_no_grams(spark):
    """Rows with fewer than n tokens produce NO grams (the sequence
    guard — without it sequence(1,0) descends and fabricates one)."""
    df = spark.createDataFrame([(1, "a b c"), (2, None), (3, "")], ["doc_id", "text"])
    rows = df.select(word_ngram_hashes("text", 8).alias("g")).collect()
    assert all(r.g is None or r.g == [] for r in rows)
    # a whole eval set below n tokens flags nothing
    _, hits = decontaminate(
        spark.createDataFrame([(1, "some much longer corpus document text here ok yes")], ["doc_id", "text"]),
        spark.createDataFrame([(9, "tiny eval")], ["eid", "text"]),
        n=8,
    )
    assert hits.count() == 0


def test_gram_hash64_three_faces_agree(spark):
    """The gram identity's three faces — scalar reference
    (gram_hash64_py), the vectorized Arrow batch the operators run
    (gram_hashes64_batch via word_ngram_hashes), and the DuckDB SQL the
    oracles replay (gram_hash64_sql) — must be bit-identical."""
    import duckdb

    from schema_drift_detector_spark.functions.text import (
        gram_hash64_py,
        gram_hash64_sql,
        tokhash_list_sql,
    )

    text = "the quick brown fox jumps over the lazy dog every single day"
    toks = text.split()
    ref = sorted({gram_hash64_py(toks[i : i + 8]) for i in range(len(toks) - 7)})

    row = (
        spark.createDataFrame([(text,)], ["text"])
        .select(word_ngram_hashes("text", 8).alias("g"))
        .first()
    )
    assert list(row.g) == ref

    gh = gram_hash64_sql("h", "CAST(i AS INT)", 8)
    esc = "', '".join(toks)
    got = duckdb.connect().execute(
        f"WITH tok AS (SELECT ['{esc}'] AS t), "
        f"th AS (SELECT {tokhash_list_sql('t')} AS h, t FROM tok) "
        f"SELECT DISTINCT {gh} AS gh "
        f"FROM th, unnest(generate_series(1, len(t) - 7)) s(i) ORDER BY gh"
    ).fetchall()
    assert [g for (g,) in got] == ref


def test_contamination_join_is_broadcast_no_corpus_shuffle(spark):
    """The eval gram set must broadcast; the only Exchange is the
    hits-only aggregation (bounded by contamination volume), never a
    corpus-wide shuffle join."""
    corpus = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.format_string(
            "alpha beta gamma delta epsilon zeta eta theta doc %d tail", F.col("id")
        ).alias("text"),
    )
    eval_df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")], ["eid", "text"]
    )
    hits = contamination_hits(corpus, eval_gram_hashes(eval_df, "text", 8))
    plan = _plan(hits)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # every doc embeds the eval 8-gram -> all flagged with exactly 1 hit
    got = hits.collect()
    assert len(got) == 2000 and all(r.n_hit_grams == 1 for r in got)
