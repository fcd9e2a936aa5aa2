"""Incremental cross-epoch dedup (operators/incremental.py): survivor
semantics, cross-epoch rejection through the persisted index, resume
idempotency, and partition pruning of the history read."""

from __future__ import annotations

import pyspark.sql.functions as F

from schema_drift_detector_spark.operators.incremental import (
    ingest_epoch,
    read_fingerprint_index,
)


def test_ingest_epoch_semantics(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fpidx"))
    b0 = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, None)], ["doc_id", "text"]
    )
    a0 = ingest_epoch(spark, d, b0, 0)
    # within-batch: min id per fingerprint; one null-content survivor
    assert sorted(r.doc_id for r in a0.collect()) == [1, 2, 4]

    b1 = spark.createDataFrame(
        [(10, "bbb"), (11, "ccc"), (12, "ccc"), (13, None)], ["doc_id", "text"]
    )
    a1 = ingest_epoch(spark, d, b1, 1)
    # bbb and the null row are cross-epoch dups via the PERSISTED index;
    # ccc dedups within the batch to its min id
    assert sorted(r.doc_id for r in a1.collect()) == [11]

    idx = read_fingerprint_index(spark, d)
    got = {(r.id, r.ingest_epoch) for r in idx.collect()}
    assert got == {(1, 0), (2, 0), (4, 0), (11, 1)}


def test_ingest_epoch_resume_idempotent(spark, tmp_path_factory):
    """Re-running an epoch (crash/resume) must neither duplicate index
    rows nor change the accepted set — the epoch partition is
    dynamic-overwritten in place."""
    d = str(tmp_path_factory.mktemp("fpidx_r"))
    b0 = spark.createDataFrame([(1, "x"), (2, "y")], ["doc_id", "text"])
    ingest_epoch(spark, d, b0, 0)
    b1 = spark.createDataFrame([(5, "y"), (6, "z")], ["doc_id", "text"])
    first = sorted(r.doc_id for r in ingest_epoch(spark, d, b1, 1).collect())
    again = sorted(r.doc_id for r in ingest_epoch(spark, d, b1, 1).collect())
    assert first == again == [6]
    idx = read_fingerprint_index(spark, d)
    assert idx.count() == 3  # no duplicated epoch-1 rows
    assert idx.filter(F.col("ingest_epoch") == 1).count() == 1


def test_history_read_is_partition_pruned(spark, tmp_path_factory):
    """The anti-join's history scan must prune later/self epoch
    partitions at the source (ingest_epoch is the parquet partition
    key): an epoch-1 ingest reads only the epoch-0 partition."""
    d = str(tmp_path_factory.mktemp("fpidx_p"))
    ingest_epoch(
        spark, d, spark.createDataFrame([(1, "x")], ["doc_id", "text"]), 0
    )
    ingest_epoch(
        spark, d, spark.createDataFrame([(2, "y")], ["doc_id", "text"]), 1
    )
    hist = read_fingerprint_index(spark, d, before_epoch=1)
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert "ingest_epoch" in plan  # partition filter present
    assert {r.ingest_epoch for r in hist.collect()} == {0}
    # pruning is structural: the filtered scan touches 1 of 2 partitions
    n_parts = hist._jdf.queryExecution().executedPlan().toString().count("PartitionFilters")
    assert n_parts >= 1


def test_ingest_epoch_neardup_semantics_and_resume(spark, tmp_path_factory):
    """Near-dup ingest: within-batch cluster min survives; a near-clone
    of an INDEXED doc is rejected by the persisted signatures (no exact
    fingerprint in common); null-text docs pass unjudged; re-running an
    epoch is idempotent."""
    from schema_drift_detector_spark.operators.incremental import (
        ingest_epoch_neardup,
        read_neardup_index,
    )

    d = str(tmp_path_factory.mktemp("ndidx"))
    t = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "all day long without stopping once"
    )
    other = "completely different content about spark shuffles and partitions"
    b0 = spark.createDataFrame(
        [(2, t), (4, t + " v2"), (6, other)], ["doc_id", "text"]
    )
    a0 = sorted(r.doc_id for r in ingest_epoch_neardup(spark, d, b0, 0).collect())
    assert a0 == [2, 6]  # 4 is a near-dup of 2; cluster min 2 survives

    b1 = spark.createDataFrame(
        [(11, t + " v3"), (13, "fresh text on benchmarks and duckdb oracles"), (15, None)],
        ["doc_id", "text"],
    )
    a1 = sorted(r.doc_id for r in ingest_epoch_neardup(spark, d, b1, 1).collect())
    assert a1 == [13, 15]  # 11 near-dups indexed 2; 15 has no signature
    # 15 (null text) is accepted but NOT indexed: no shingles -> no
    # signature row (char_shingles(NULL) is empty — an all-NULL sig
    # would give every null doc the same hot band bucket forever)
    assert sorted(
        (r.id, r.ingest_epoch) for r in read_neardup_index(spark, d).collect()
    ) == [(2, 0), (6, 0), (13, 1)]
    # resume: same accepted set, no duplicated index rows
    a1b = sorted(r.doc_id for r in ingest_epoch_neardup(spark, d, b1, 1).collect())
    assert a1b == a1
    assert read_neardup_index(spark, d).count() == 3
    # parameter drift fails loud instead of silently never matching
    import pytest as _pytest

    with _pytest.raises(ValueError, match="incompatible signatures"):
        ingest_epoch_neardup(spark, d, b1, 2, k=32)
    with _pytest.raises(ValueError, match="bands"):
        ingest_epoch_neardup(spark, d, b1, 2, k=64, bands=48)


def test_neardup_param_gate_catches_mixed_index(spark, tmp_path_factory):
    """The parameter gate must see EVERY distinct (k, n, hash_fn) tuple
    in the index, not a sampled row: a re-ingested epoch with different
    params leaves the index mixed, and a limit(1) sample could pick the
    compatible tuple while the incompatible epochs silently never match
    (ADVICE r5)."""
    import pytest

    from schema_drift_detector_spark.operators.incremental import ingest_epoch_neardup

    d = str(tmp_path_factory.mktemp("nd_mixed"))
    docs = [(i, f"the quick brown fox jumps over lazy dog number {i} " * 3)
            for i in range(6)]
    b0 = spark.createDataFrame(docs, ["doc_id", "text"])
    ingest_epoch_neardup(spark, d, b0, 0, k=8, bands=4)
    b1 = spark.createDataFrame(
        [(10, "completely fresh text for the follow-up epoch")], ["doc_id", "text"]
    )
    ingest_epoch_neardup(spark, d, b1, 1, k=8, bands=4)
    # epoch 0 RE-ingested with different params AFTER epoch 1 exists:
    # its own gate sees only strictly-earlier epochs (none), so this
    # passes — and the static per-epoch overwrite leaves the index
    # genuinely mixed (epoch 0 @ k=12, epoch 1 @ k=8)
    ingest_epoch_neardup(spark, d, b0, 0, k=12, bands=6)
    b2 = spark.createDataFrame(
        [(20, "a third epoch that must now fail loud")], ["doc_id", "text"]
    )
    with pytest.raises(ValueError, match="MIXED parameters"):
        ingest_epoch_neardup(spark, d, b2, 2, k=12, bands=6)
