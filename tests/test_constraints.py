"""Constraint tests against the synthesizer's injected violations
(FIXTURES.md F1): duplicates only in partitions {2,5}, dangling refs
only in partition 3, distribution drift only in partitions {1,4}."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from schema_drift_detector_spark.operators.constraints import (
    check_distribution_drift,
    check_referential_integrity,
    check_uniqueness,
    drift_statistics,
    duplicate_keys,
)
from schema_drift_detector_spark.operators.profile import numeric_histogram
from schema_drift_detector_spark.sources.synth import (
    SynthConfig,
    synth_asset_catalog,
    synth_documents,
)

CFG = SynthConfig(n_docs=6_400, n_partitions=8, n_assets=4_000)


@pytest.fixture(scope="module")
def docs(spark):
    return synth_documents(spark, CFG, epoch=0).cache()


@pytest.fixture(scope="module")
def catalog(spark):
    return synth_asset_catalog(spark, CFG).cache()


def test_uniqueness_localized(spark, docs):
    verdicts, violations = check_uniqueness(docs, run_id="r1")
    v = {r.partition_id: r for r in verdicts.collect()}
    assert len(v) == 8
    failing = {p for p, r in v.items() if not r.passed}
    assert failing == set(CFG.dup_partitions)
    for p in failing:
        assert v[p].severity == "high"
        assert "duplicate rows" in v[p].summary
    for p in set(range(8)) - failing:
        assert v[p].severity == "info" and v[p].summary == "uniqueness ok"

    viol = violations.collect()
    assert len(viol) > 0
    assert {r.partition_id for r in viol} <= set(CFG.dup_partitions)
    assert all(r.constraint == "uniqueness" for r in viol)
    # every violating doc_id really is duplicated
    dup_ids = {r["doc_id"] for r in duplicate_keys(docs).collect()}
    assert {r.doc_id for r in viol} <= dup_ids


def test_referential_integrity_localized(spark, docs, catalog):
    verdicts, violations = check_referential_integrity(docs, catalog, run_id="r1")
    v = {r.partition_id: r for r in verdicts.collect()}
    failing = {p for p, r in v.items() if not r.passed}
    assert failing == {CFG.dangling_partition}
    viol = violations.collect()
    assert len(viol) > 0
    assert {r.partition_id for r in viol} == {CFG.dangling_partition}
    # violation rows carry span-sequence evidence per input_hint
    for r in viol[:20]:
        assert r.media_ref.startswith("asset-")
        assert int(r.media_ref.split("-")[1]) >= CFG.n_assets
        assert r.kind in {"image", "audio", "table"}
        assert r.span_order >= 0


def test_ri_plan_uses_broadcast(spark, docs, catalog):
    _, violations = check_referential_integrity(docs, catalog, run_id="r1")
    plan = violations._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_distribution_drift_localized(spark, docs):
    e2 = synth_documents(spark, CFG, epoch=2)
    base = numeric_histogram(
        docs.select("partition_id", F.explode("spans.offset").alias("off")),
        "off", 0.0, 60.0, 16, ["partition_id"],
    )
    curr = numeric_histogram(
        e2.select("partition_id", F.explode("spans.offset").alias("off")),
        "off", 0.0, 60.0, 16, ["partition_id"],
    )
    verdicts = check_distribution_drift(base, curr, run_id="r1", epoch=2)
    v = {r.partition_id: r for r in verdicts.collect()}
    failing = {p for p, r in v.items() if not r.passed}
    assert set(CFG.drift_partitions) <= failing
    # non-drifted partitions must pass (same generator, same seed)
    assert failing <= set(CFG.drift_partitions)


def test_drift_statistics_identity(spark, docs):
    base = numeric_histogram(
        docs.select("partition_id", F.explode("spans.offset").alias("off")),
        "off", 0.0, 60.0, 16, ["partition_id"],
    )
    stats = drift_statistics(base, base).collect()
    for r in stats:
        assert r.ks_stat == 0.0
        assert r.chi2_stat < 1e-9


def test_categorical_drift_on_span_kinds(spark, docs):
    """Chi-square over the span-kind histograms: e0 vs e0 passes
    everywhere; a synthetic kind-shift fails only where injected."""
    import pyspark.sql.functions as F

    from schema_drift_detector_spark.operators.constraints import check_categorical_drift

    kinds = docs.select("partition_id", F.explode("spans.kind").alias("category")).groupBy(
        "partition_id", "category"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    v = {
        r.partition_id: r
        for r in check_categorical_drift(kinds, kinds, "r", 0).collect()
    }
    assert all(r.passed for r in v.values())
    # shift: in partitions {1,4} relabel all 'image' spans as 'audio'
    shifted = docs.select("partition_id", F.explode("spans.kind").alias("category"))
    shifted = shifted.withColumn(
        "category",
        F.when(
            F.col("partition_id").isin(1, 4) & (F.col("category") == "image"), "audio"
        ).otherwise(F.col("category")),
    ).groupBy("partition_id", "category").agg(F.count(F.lit(1)).alias("cnt"))
    v2 = {
        r.partition_id: r
        for r in check_categorical_drift(kinds, shifted, "r", 1).collect()
    }
    failing = {p for p, r in v2.items() if not r.passed}
    assert failing == {1, 4}


def test_quantile_drift_fails_closed_on_one_sided_groups(spark):
    """A partition with a baseline digest but no current one (vanished),
    or vice versa (new), must FAIL — not silently drop out of an inner
    join."""
    import numpy as np

    from schema_drift_detector_spark.functions import sketch
    from schema_drift_detector_spark.operators.constraints import check_quantile_drift

    blob = bytearray(sketch.build(np.arange(100, dtype=np.float64)))
    base = spark.createDataFrame(
        [(0, blob, 100), (1, blob, 100)], "partition_id int, tdigest binary, n long"
    )
    curr = spark.createDataFrame(
        [(0, blob, 100), (2, blob, 100)], "partition_id int, tdigest binary, n long"
    )
    v = {r.partition_id: r for r in check_quantile_drift(base, curr, "q", 1).collect()}
    assert set(v) == {0, 1, 2}
    assert v[0].passed is True            # identical digests
    assert v[1].passed is False           # vanished from current
    assert v[2].passed is False           # new without baseline
    assert "missing baseline or current digest" in v[1].summary


def test_ri_bloom_catalog_matches_plain_join(spark):
    """bloom_catalog=True must produce BIT-IDENTICAL verdicts and
    violation rows to the plain join (no false negatives: a bloom miss
    is an exact 'dangling'); the synth fixture injects dangling
    media_refs in partition 3. Also check the scale property: the
    residual exact join's input is a small fraction of all refs."""
    import pyspark.sql.functions as F

    from schema_drift_detector_spark.operators.constraints import check_referential_integrity
    from schema_drift_detector_spark.sources.synth import (
        SynthConfig,
        synth_asset_catalog,
        synth_documents,
    )

    cfg = SynthConfig(n_docs=2_000, n_partitions=8, n_assets=3_000)
    docs = synth_documents(spark, cfg, epoch=0)
    catalog = synth_asset_catalog(spark, cfg)

    v_plain, viol_plain = check_referential_integrity(docs, catalog, "r")
    v_bloom, viol_bloom = check_referential_integrity(
        docs, catalog, "r", bloom_catalog=True
    )
    vp = {(r.partition_id): (r.passed, r.summary) for r in v_plain.collect()}
    vb = {(r.partition_id): (r.passed, r.summary) for r in v_bloom.collect()}
    assert vp == vb and vb[3][0] is False
    p = {(r.doc_id, r.span_order, r.media_ref) for r in viol_plain.collect()}
    b = {(r.doc_id, r.span_order, r.media_ref) for r in viol_bloom.collect()}
    assert p == b and len(b) > 0

    # scale property: most refs are resolved by the bloom alone —
    # the residual join sees only maybes (present keys + ~1% fpp)
    from schema_drift_detector_spark.functions.bloom import build_bloom, might_contain_udf

    cat = catalog.select("media_ref").distinct()
    bits, m, k = build_bloom(cat, "media_ref", cat.count())
    mc = might_contain_udf(spark, bits, m, k)
    refs = docs.select(F.explode("spans.media_ref").alias("media_ref")).filter(
        F.col("media_ref").isNotNull()
    )
    stats = refs.withColumn("maybe", mc("media_ref")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("maybe").cast("int")).alias("n_maybe"),
    ).first()
    dang = refs.join(cat, "media_ref", "left_anti").count()
    # every present ref probes true; absent refs mostly probe false
    assert stats.n_maybe >= stats.n - dang
    assert stats.n_maybe - (stats.n - dang) <= max(3, 0.03 * dang + 0.02 * stats.n)

    # ADVICE r3: the assembled bitmap lives on the driver and ships as
    # one broadcast — sizes past the ceiling fail loud with guidance,
    # before any Spark job runs
    with pytest.raises(ValueError, match="GiB.*ceiling"):
        build_bloom(cat, "media_ref", expected_items=10**10, bits_per_key=10)
