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


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ingest_epoch_bucketed_equivalence_and_colocated_plan(spark, tmp_path_factory):
    """bucket_table (r5 verdict #3): the bucketed index layout must (a)
    accept exactly the parquet layout's rows across epochs including an
    idempotent re-ingest, and (b) read the index side of the per-ingest
    anti-join PRE-SHUFFLED — zero Exchange under the bucketed scan, the
    one Exchange in the plan being the new batch's (the whole point:
    each ingest shuffles only the batch, never the standing index)."""
    import uuid

    from schema_drift_detector_spark.operators.incremental import (
        _fingerprinted,
        ingest_epoch,
        read_fingerprint_index,
    )

    d = str(tmp_path_factory.mktemp("fpidx_b"))
    bt = f"fpidx_{uuid.uuid4().hex[:8]}"
    b0 = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, None)], ["doc_id", "text"]
    )
    b1 = spark.createDataFrame(
        [(10, "bbb"), (11, "ccc"), (12, "ccc"), (13, None)], ["doc_id", "text"]
    )
    try:
        for b, e in ((b0, 0), (b1, 1)):
            ap = sorted(r.doc_id for r in ingest_epoch(spark, d, b, e).collect())
            ab = sorted(
                r.doc_id
                for r in ingest_epoch(
                    spark, None, b, e, bucket_table=bt, buckets=8
                ).collect()
            )
            assert ap == ab
        # re-ingest epoch 1: idempotent (static-partition INSERT OVERWRITE)
        again = sorted(
            r.doc_id
            for r in ingest_epoch(spark, None, b1, 1, bucket_table=bt, buckets=8).collect()
        )
        assert again == [11]
        idx_p = {(r.id, r.ingest_epoch) for r in read_fingerprint_index(spark, d).collect()}
        idx_b = {
            (r.id, r.ingest_epoch)
            for r in read_fingerprint_index(spark, None, bucket_table=bt).collect()
        }
        assert idx_p == idx_b == {(1, 0), (2, 0), (4, 0), (11, 1)}

        # epoch 2 CONTENT correctness with history spanning an
        # INSERT-OVERWRITE-written partition (epoch 1): "ccc" was
        # accepted at epoch 1 via the SQL insert path — if that path
        # ever wrote mis-bucketed files, the bucketed sort-merge
        # anti-join would silently MISS it and accept 20; the plan
        # assertions alone cannot catch that
        b2 = spark.createDataFrame([(20, "ccc"), (21, "ddd")], ["doc_id", "text"])
        a2 = sorted(
            r.doc_id
            for r in ingest_epoch(spark, None, b2, 2, bucket_table=bt, buckets=8).collect()
        )
        assert a2 == [21]

        # plan shape: the operator's literal anti-join recipe — batch
        # survivors LEFT ANTI history — with broadcast off (a 10^12-row
        # index never broadcasts) must show the bucketed index scan and
        # exactly ONE Exchange (the batch side)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            hist = read_fingerprint_index(
                spark, None, before_epoch=2, bucket_table=bt
            ).select(F.col("fingerprint").alias("__fp"))
            batch_fp = _fingerprinted(b1, "text")
            plan = _plan(batch_fp.join(hist, "__fp", "left_anti"))
            assert "Bucketed: true" in plan
            assert plan.count("Exchange hashpartitioning") == 1
            assert "Exchange" not in plan.split("FileScan")[1]  # none below the scan
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {bt}")


def test_ingest_epoch_neardup_bucketed_equivalence_and_band_plan(spark, tmp_path_factory):
    """Bucketed near-dup index: same accepted sets as the parquet
    layout (incl. cross-epoch rejection through the persisted
    signatures and idempotent re-ingest), and BOTH history-side joins
    read pre-shuffled — the (band, bucket) candidate join and the
    id-keyed estimate fetch each show a bucketed scan with no Exchange
    on the index side."""
    import uuid

    from schema_drift_detector_spark.operators.dedup import band_buckets
    from schema_drift_detector_spark.operators.incremental import (
        ingest_epoch_neardup,
        read_neardup_band_index,
        read_neardup_index,
    )

    d = str(tmp_path_factory.mktemp("ndidx_b"))
    bt = f"ndidx_{uuid.uuid4().hex[:8]}"
    t = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "all day long without stopping once"
    )
    other = "completely different content about spark shuffles and partitions"
    b0 = spark.createDataFrame([(2, t), (4, t + " v2"), (6, other)], ["doc_id", "text"])
    b1 = spark.createDataFrame(
        [(11, t + " v3"), (13, "fresh text on benchmarks and duckdb oracles"), (15, None)],
        ["doc_id", "text"],
    )
    try:
        for b, e in ((b0, 0), (b1, 1)):
            ap = sorted(
                r.doc_id for r in ingest_epoch_neardup(spark, d, b, e).collect()
            )
            ab = sorted(
                r.doc_id
                for r in ingest_epoch_neardup(
                    spark, None, b, e, bucket_table=bt, buckets=8
                ).collect()
            )
            assert ap == ab
        # epoch 1: 11 rejected through the PERSISTED index (near-dup of
        # indexed 2), 15 unjudged null text — non-vacuous cross-epoch path
        assert ab == [13, 15]
        # re-ingest idempotent + indexes agree (sig face)
        again = sorted(
            r.doc_id
            for r in ingest_epoch_neardup(
                spark, None, b1, 1, bucket_table=bt, buckets=8
            ).collect()
        )
        assert again == [13, 15]
        sig_p = {
            (r.id, r.ingest_epoch) for r in read_neardup_index(spark, d).collect()
        }
        sig_b = {
            (r.id, r.ingest_epoch)
            for r in read_neardup_index(spark, None, bucket_table=bt).collect()
        }
        assert sig_p == sig_b == {(2, 0), (6, 0), (13, 1)}
        # epoch 2: near-dup of doc 13 — accepted at epoch 1, i.e. its
        # sigs AND band rows were written via the INSERT OVERWRITE path;
        # rejection proves insert-written partitions feed candidate
        # generation correctly (content check the plan asserts can't do)
        b2 = spark.createDataFrame(
            [(21, "fresh text on benchmarks and duckdb oracles v2"),
             (23, "entirely new material about bucketed layouts")],
            ["doc_id", "text"],
        )
        a2 = sorted(
            r.doc_id
            for r in ingest_epoch_neardup(
                spark, None, b2, 2, bucket_table=bt, buckets=8
            ).collect()
        )
        assert a2 == [23]
        # the precomputed band face equals band_buckets over the stored sigs
        hist = read_neardup_index(spark, None, bucket_table=bt).select(
            F.col("id").alias("doc"), "sig"
        )
        want = {
            (r.doc, r.band, r.bucket) for r in band_buckets(hist, 16).collect()
        }
        got = {
            (r.id, r.band, r.bucket)
            for r in read_neardup_band_index(spark, bt).collect()
        }
        assert got == want and len(got) > 0

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            # candidate join: batch bands vs the bucketed band index
            nb = band_buckets(
                spark.createDataFrame([(99, [1, 2] * 32)], "doc long, sig array<bigint>"),
                16,
            ).alias("nb")
            hb = (
                read_neardup_band_index(spark, bt, before_epoch=2)
                .select(F.col("id").alias("doc"), "band", "bucket")
                .alias("hb")
            )
            cand = nb.join(
                hb,
                (F.col("nb.band") == F.col("hb.band"))
                & (F.col("nb.bucket") == F.col("hb.bucket")),
            )
            plan = _plan(cand)
            assert "Bucketed: true" in plan
            # exactly one Exchange: the batch band rows; the index side
            # arrives pre-shuffled through the bucketed scan
            assert plan.count("Exchange hashpartitioning") == 1
            # estimate fetch: candidates vs the id-bucketed sig index
            fetch = spark.createDataFrame([(2,)], "old_doc long").join(
                read_neardup_index(spark, None, bucket_table=bt).select(
                    F.col("id").alias("old_doc"), "sig"
                ),
                "old_doc",
            )
            plan2 = _plan(fetch)
            assert "Bucketed: true" in plan2
            assert plan2.count("Exchange hashpartitioning") == 1
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {bt}_sigs")
        spark.sql(f"DROP TABLE IF EXISTS {bt}_bands")


def test_bucketed_neardup_bands_gate_and_crash_detection(spark, tmp_path_factory):
    """Bucketed-only fail-loud guards (round-6 review findings): (a) the
    band face is precomputed with the accept-time `bands`, so an ingest
    with a different value must raise instead of silently accepting
    every cross-epoch near-dup (the parquet layout derives bands at
    read time and supports changing them — confirmed-by-repro silent
    regression otherwise); (b) a crash between the _sigs and _bands
    writes leaves the two faces inconsistent and must be detected, not
    silently skip candidate generation for the orphaned epoch."""
    import uuid

    import pytest

    from schema_drift_detector_spark.operators.incremental import ingest_epoch_neardup

    t = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "all day long without stopping once"
    )
    b0 = spark.createDataFrame([(2, t)], ["doc_id", "text"])
    b1 = spark.createDataFrame([(11, t + " v3")], ["doc_id", "text"])

    # (a) bands drift
    bt = f"ndg_{uuid.uuid4().hex[:8]}"
    try:
        ingest_epoch_neardup(spark, None, b0, 0, bucket_table=bt, buckets=8, bands=16)
        with pytest.raises(ValueError, match="precomputed with bands"):
            ingest_epoch_neardup(
                spark, None, b1, 1, bucket_table=bt, buckets=8, bands=8
            )
        # same bands: the near-dup is caught through the index
        a1 = ingest_epoch_neardup(
            spark, None, b1, 1, bucket_table=bt, buckets=8, bands=16
        ).collect()
        assert a1 == []
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {bt}_sigs")
        spark.sql(f"DROP TABLE IF EXISTS {bt}_bands")

    # (b) crash detection: missing band table entirely. A DIFFERENT
    # epoch's ingest cannot repair it and must name the drop; but
    # re-ingesting the orphaned epoch itself IS the repair (the static
    # overwrite recreates both faces) and must proceed — otherwise the
    # error's own advice wedges the index (round-7 advisor finding)
    bt2 = f"ndc_{uuid.uuid4().hex[:8]}"
    try:
        ingest_epoch_neardup(spark, None, b0, 0, bucket_table=bt2, buckets=8)
        spark.sql(f"DROP TABLE {bt2}_bands")  # simulate crash before band write
        with pytest.raises(ValueError, match="_sigs exists without _bands"):
            ingest_epoch_neardup(spark, None, b1, 1, bucket_table=bt2, buckets=8)
        a0 = ingest_epoch_neardup(
            spark, None, b0, 0, bucket_table=bt2, buckets=8
        ).collect()
        assert [r.doc_id for r in a0] == [2]
        assert spark.catalog.tableExists(f"{bt2}_bands")
        # index healthy again: the next epoch's near-dup is rejected
        a1 = ingest_epoch_neardup(
            spark, None, b1, 1, bucket_table=bt2, buckets=8
        ).collect()
        assert a1 == []
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {bt2}_sigs")
        spark.sql(f"DROP TABLE IF EXISTS {bt2}_bands")

    # (b') crash detection: one epoch's band partition orphaned. The
    # epoch-1 batch must be ACCEPTED (fresh text, not the near-dup b1 —
    # a rejected batch leaves both faces legitimately empty and there
    # is nothing to orphan)
    b1f = spark.createDataFrame(
        [(12, "fresh epoch one content that is not a near dup")], ["doc_id", "text"]
    )
    bt3 = f"ndo_{uuid.uuid4().hex[:8]}"
    try:
        ingest_epoch_neardup(spark, None, b0, 0, bucket_table=bt3, buckets=8)
        ingest_epoch_neardup(spark, None, b1f, 1, bucket_table=bt3, buckets=8)
        # wipe epoch 1's band rows only (what a crash between the two
        # epoch-1 writes leaves behind)
        spark.createDataFrame(
            [], "id bigint, band int, bucket bigint, bands int"
        ).createOrReplaceTempView("__empty_bands")
        spark.sql(
            f"INSERT OVERWRITE TABLE {bt3}_bands PARTITION (ingest_epoch=1) "
            f"SELECT * FROM __empty_bands"
        )
        b2 = spark.createDataFrame([(31, "anything else at all here")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="re-ingest epoch"):
            ingest_epoch_neardup(spark, None, b2, 2, bucket_table=bt3, buckets=8)
        # repair path: re-ingesting the NAMED epoch rewrites both faces
        ingest_epoch_neardup(spark, None, b1f, 1, bucket_table=bt3, buckets=8)
        a2 = ingest_epoch_neardup(
            spark, None, b2, 2, bucket_table=bt3, buckets=8
        ).collect()
        assert [r.doc_id for r in a2] == [31]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {bt3}_sigs")
        spark.sql(f"DROP TABLE IF EXISTS {bt3}_bands")
