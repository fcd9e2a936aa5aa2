"""Sequence packing (operators/packing.py): next-fit semantics, cap
invariants, oversize handling, determinism across partitionings, and
input validation."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from schema_drift_detector_spark.operators.packing import pack_next_fit


def test_pack_invariants_and_determinism(spark):
    """Every non-oversize bin fits the cap; oversize docs sit alone and
    flagged; the assignment is identical regardless of input
    partitioning (pure function of ids)."""
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37, F.lit(130)) + 1).alias("n_tokens"),
    )
    out = pack_next_fit(docs, cap_tokens=100, n_shards=4)
    rows = out.collect()
    assert len(rows) == 500
    fills = {}
    for r in rows:
        if r.truncated:
            assert r.n_tokens > 100
        else:
            fills.setdefault((r.shard, r.bin), 0)
            fills[(r.shard, r.bin)] += r.n_tokens
    assert fills and all(v <= 100 for v in fills.values())
    # oversize bins contain exactly their one doc
    from collections import Counter

    per_bin = Counter((r.shard, r.bin) for r in rows)
    for r in rows:
        if r.truncated:
            assert per_bin[(r.shard, r.bin)] == 1
    # repartitioned input -> identical assignment
    out2 = pack_next_fit(docs.repartition(13), cap_tokens=100, n_shards=4)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, out2.collect()))


def test_pack_next_fit_order_is_hash_then_id(spark):
    """The fold order inside a shard is (hash, id) — a single-shard
    fixture packs exactly like the hand-computed next-fit walk."""
    from schema_drift_detector_spark.operators.sampling import hash_bucket

    docs = spark.createDataFrame(
        [(i, 60) for i in range(6)], ["doc_id", "n_tokens"]
    )
    out = {r.doc_id: (r.bin,) for r in pack_next_fit(
        docs, cap_tokens=100, n_shards=1
    ).collect()}
    order = [
        r.doc_id
        for r in docs.select(
            "doc_id", hash_bucket("doc_id", salt=":pack").alias("h")
        ).orderBy("h", "doc_id").collect()
    ]
    # 60-token docs, 100 cap -> one per bin in fold order
    assert [out[d][0] for d in order] == list(range(6))


def test_pack_rejects_bad_rows(spark):
    # null id / bad counts raise from the fold (in-stream validation —
    # no pre-scan), surfacing as PythonException at action time
    with pytest.raises(Exception, match="non-null doc_id"):
        pack_next_fit(
            spark.createDataFrame([(None, 5)], "doc_id bigint, n_tokens bigint")
        ).collect()
    with pytest.raises(Exception, match="non-negative n_tokens"):
        pack_next_fit(
            spark.createDataFrame([(1, -2)], "doc_id bigint, n_tokens bigint")
        ).collect()
    with pytest.raises(ValueError, match="cap_tokens"):
        pack_next_fit(
            spark.createDataFrame([(1, 2)], "doc_id bigint, n_tokens bigint"),
            cap_tokens=0,
        )


def test_chunk_documents_windows_and_clipping(spark):
    """Window arithmetic: overlap, end clipping, single-chunk docs,
    exact-boundary docs, null text, and parameter validation."""
    import pytest

    from schema_drift_detector_spark.operators.packing import chunk_documents

    toks = lambda n: " ".join(f"t{i}" for i in range(1, n + 1))
    rows = [(1, toks(10)), (2, toks(4)), (3, toks(8)), (4, toks(9)), (5, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=4, stride=2)
    got = {
        (r.doc_id, r.chunk_index): (r.n_chunk_tokens, r.chunk_text)
        for r in out.collect()
    }
    # doc 1: 10 tokens -> 1 + ceil(6/2) = 4 chunks; last covers 7..10
    assert [k[1] for k in sorted(got) if k[0] == 1] == [0, 1, 2, 3]
    assert got[(1, 0)] == (4, "t1 t2 t3 t4")
    assert got[(1, 1)] == (4, "t3 t4 t5 t6")
    assert got[(1, 3)] == (4, "t7 t8 t9 t10")
    # doc 2: exactly chunk_tokens -> one chunk
    assert [k[1] for k in sorted(got) if k[0] == 2] == [0]
    # doc 3: 8 tokens -> 3 chunks, all full (exact boundary)
    assert [k[1] for k in sorted(got) if k[0] == 3] == [0, 1, 2]
    assert got[(3, 2)] == (4, "t5 t6 t7 t8")
    # doc 4: 9 tokens -> ceil(5/2)=3 extra; final chunk starts at token
    # 7 and is clipped to the last 3 tokens
    assert got[(4, 3)] == (3, "t7 t8 t9")
    # null text -> no rows
    assert not any(k[0] == 5 for k in got)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, chunk_tokens=4, stride=5)
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, chunk_tokens=0, stride=1)


def test_pack_next_fit_array_tokens_col(spark):
    """Tokenizer seam: an array<string> tokens_col packs by its SIZE —
    identical assignment to the precomputed-count path — and a null
    array fails the in-fold null check (not a silent size()=-1)."""
    rows = [(i, [f"p{j}" for j in range(10 * i)]) for i in range(1, 7)]
    arr = spark.createDataFrame(rows, "doc_id long, pieces array<string>")
    cnt = arr.select("doc_id", F.size("pieces").alias("n_tokens"))
    via_arr = {
        (r.doc_id): (r.shard, r.bin, r.n_tokens, r.truncated)
        for r in pack_next_fit(arr, "doc_id", "pieces", cap_tokens=50).collect()
    }
    via_cnt = {
        (r.doc_id): (r.shard, r.bin, r.n_tokens, r.truncated)
        for r in pack_next_fit(cnt, "doc_id", "n_tokens", cap_tokens=50).collect()
    }
    assert via_arr == via_cnt and len(via_arr) == 6
    assert via_arr[6][3] is True  # 60 pieces > 50 cap -> truncated
    null_arr = spark.createDataFrame(
        [(1, None)], "doc_id long, pieces array<string>"
    )
    with pytest.raises(Exception, match="non-null, non-negative pieces"):
        pack_next_fit(null_arr, "doc_id", "pieces").collect()


def test_chunk_documents_tokens_col_seam(spark):
    """Tokenizer seam: with tokens_col the chunk boundaries follow the
    PROVIDED token array (here character 4-grams), not the whitespace
    split, and joiner reassembles chunk_text; a null array yields no
    rows while text stays unread."""
    from schema_drift_detector_spark.operators.packing import chunk_documents

    text = "abcdefgh ijklmnop qrstuvwx"  # 3 words, 26 chars
    docs = spark.createDataFrame([(1, text), (2, None)], "doc_id long, text string")
    toks = docs.withColumn(
        "toks", F.regexp_extract_all(F.col("text"), F.lit("(?s).{1,4}"), 0)
    )
    out = {
        r.chunk_index: (r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(
            toks, chunk_tokens=4, stride=2, tokens_col="toks", joiner=""
        ).collect()
    }
    # 26 chars -> 7 pieces (6x4 + 1x2): 1 + ceil(3/2) = 3 chunks of
    # 4-char-gram tokens — boundaries at char multiples, NOT at spaces
    assert sorted(out) == [0, 1, 2]
    assert out[0] == (4, "abcdefgh ijklmno")  # pieces 1-4 joined by ''
    assert out[1] == (4, " ijklmnop qrstuv")  # pieces 3-6 (overlap)
    assert out[2] == (3, "p qrstuvwx")        # pieces 5-7, clipped
    # whitespace default on the same doc: 3 words -> ONE chunk — the
    # seam demonstrably changes boundaries
    ws = chunk_documents(docs, chunk_tokens=4, stride=2).collect()
    assert len(ws) == 1 and ws[0].chunk_text == text
