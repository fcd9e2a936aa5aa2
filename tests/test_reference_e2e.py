"""The reference's original use case end-to-end: a CSV lands, the
crawler snapshots its header (metadata only), the store chains
versions, the detector diffs, healing/notification/decision fire —
exactly the examples/{no_drfit,drift} scenario, on this engine."""

from __future__ import annotations

import pytest

from schema_drift_detector_spark.operators.diff import diff_fields, drift_report
from schema_drift_detector_spark.operators.snapshot import fields_from_headers
from schema_drift_detector_spark.plans import store
from schema_drift_detector_spark.plans.policy import decide, healing_plan, notification

V1 = "name,date_of_birth,gender,company,designation\nAda,1815-12-10,f,Analytical,Engineer\n"
V2 = "name,date_of_birth,gender,company,designation,country\nAda,1815-12-10,f,Analytical,Engineer,UK\n"


def _csv_headers(spark, tmp, content, fname):
    p = f"{tmp}/{fname}"
    with open(p, "w") as f:
        f.write(content)
    df = spark.read.option("header", True).csv(p)
    return df.columns


def test_csv_drift_scenario(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("csv"))
    store_dir = f"{tmp}/store"

    # day 1: v1 lands → first snapshot
    h1 = _csv_headers(spark, tmp, V1, "people-info-v1.csv")
    f1 = fields_from_headers(spark, h1)
    s1 = store.persist_snapshot(spark, store_dir, "people-info.csv", 0, f1)

    # day 2: v2 lands (adds country) → diff vs previous
    h2 = _csv_headers(spark, tmp, V2, "people-info-v2.csv")
    f2 = fields_from_headers(spark, h2)
    s2 = store.persist_snapshot(spark, store_dir, "people-info.csv", 1, f2)
    prev = store.previous_snapshot(spark, store_dir, "people-info.csv", s2)
    assert prev == s1

    before = store.fields_of(spark, store_dir, prev)
    rep = drift_report(diff_fields(before, f2)).collect()[0]
    # golden: examples/drift/detector_agent_output.json
    assert rep.drift_detected is True
    assert rep.summary == "add country (low)"
    assert rep.severity == "info"
    change = rep.changes[0]
    assert change["op"] == "add" and change["field"] == "country"
    assert change["after"]["dtype"] == "string" and change["after"]["ordinal"] == 5

    # healing + notification + decision (healer_agent.py golden strings)
    changes = [c.asDict(recursive=True) if hasattr(c, "asDict") else c for c in rep.changes]
    heal = healing_plan(True, changes, request_id="e2e")
    assert heal["healing"]["recommended_actions"][0]["script"] == (
        "ALTER TABLE {table_name} ADD COLUMN country string;"
    )
    assert heal["healing"]["next_steps"] == "auto_heal"
    notif = notification(True, True, rep.severity, rep.summary, ["email"])
    assert notif["sent"] is True
    assert decide(True, rep.severity, heal, auto_heal_policy=True) == "auto_heal"

    # day 3: v2 lands again → no drift → continue
    s3 = store.persist_snapshot(spark, store_dir, "people-info.csv", 2, f2)
    prev3 = store.previous_snapshot(spark, store_dir, "people-info.csv", s3)
    rep3 = drift_report(
        diff_fields(store.fields_of(spark, store_dir, prev3), f2)
    ).collect()[0]
    assert rep3.drift_detected is False
    assert rep3.summary == "no schema drift detected"
    assert decide(False, "info", healing_plan(False, []), True) == "continue"


def test_salted_uniqueness_extreme_skew(spark):
    """40% of half a million rows share ONE key: the salted two-phase
    aggregation must stay correct (and not funnel the hot key through
    a single reducer — salt splits it across buckets first)."""
    import pyspark.sql.functions as F

    from schema_drift_detector_spark.operators.dedup import exact_duplicates
    from schema_drift_detector_spark.operators.constraints import duplicate_keys

    n = 500_000
    df = spark.range(n).select(
        F.when(F.col("id") % 5 < 2, F.lit("HOT-KEY"))
        .otherwise(F.format_string("key-%012d", F.col("id")))
        .alias("doc_id")
    )
    dups = {r["doc_id"]: r["n_occurrences"] for r in duplicate_keys(df, "doc_id", 32).collect()}
    assert dups == {"HOT-KEY": n // 5 * 2}


def test_winnowing_expr_vs_arrow_shapes(spark):
    """Both winnowing forms produce non-empty, deterministic
    fingerprint sets; identical texts agree within each form."""
    from schema_drift_detector_spark.functions.text import (
        winnowing_fingerprint,
        winnowing_fingerprint_arrow,
    )
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("a", "the quick brown fox jumps over the lazy dog"),
         ("b", "the quick brown fox jumps over the lazy dog"),
         ("c", "completely different content here entirely")],
        ["id", "t"],
    )
    for fn in (winnowing_fingerprint, winnowing_fingerprint_arrow):
        rows = {r.id: set(r.fp) for r in df.select("id", fn("t").alias("fp")).collect()}
        assert rows["a"] == rows["b"]
        assert rows["a"] != rows["c"]
        assert len(rows["a"]) > 0
