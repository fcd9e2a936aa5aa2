"""Catalog/policy lookup parity (R1/R2/R13) + multimodal resize."""

from __future__ import annotations

import pytest

from schema_drift_detector_spark.operators.multimodal import decode_media, resize_media, synth_media
from schema_drift_detector_spark.plans.catalog import (
    demo_catalog,
    fetch_healing_policy,
    fetch_integration_catalog,
    fetch_notification_policy,
    impacted_pipelines_for,
)
from schema_drift_detector_spark.sources.synth import SynthConfig


def test_catalog_lookups(spark):
    cat, heal, notif = demo_catalog(spark)
    c = fetch_integration_catalog(cat, "CRM-To-Finance-PeopleData")
    assert c["source_component"] == "people-info.csv"
    assert fetch_integration_catalog(cat, "nope") is None
    h = fetch_healing_policy(heal, None, "Docs-To-Corpus")
    assert h["auto_heal"] is True and h["strategy"] == "quarantine_partition"
    n = fetch_notification_policy(notif, "CRM-To-Finance-PeopleData")
    assert n["enabled"] is True and n["preferred_channel"] == "email"


def test_impacted_pipelines_semi_join(spark):
    cat, _, _ = demo_catalog(spark)
    entities = spark.createDataFrame([("documents",), ("unknown",)], ["entity"])
    got = {r.pipeline for r in impacted_pipelines_for(cat, entities).collect()}
    assert got == {"Docs-To-Corpus"}


def test_resize_media(spark):
    media = synth_media(spark, SynthConfig(), n=40).cache()
    small = resize_media(media, factor=2)
    dec = {r.media_ref: r for r in decode_media(small).collect()}
    orig = {r.media_ref: r for r in media.collect()}
    for ref, d in dec.items():
        assert d.decoder == "sdxm"
        assert d.width == max(1, orig[ref].width // 2)
        assert d.height == max(1, orig[ref].height // 2)
