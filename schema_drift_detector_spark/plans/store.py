"""Snapshot store: immutable append of snapshot metadata + fields +
profiles, with the PREVIOUS_SNAPSHOT chain materialized by window
functions (reference: snapshot_persistence_agent.py:154-273,
infra/neo4j/init_schema.cypher:16-32).

Layout (parquet fallback; Iceberg identifiers work identically through
sources.io.write_table):
    <store>/snapshots         one row per snapshot (entity, epoch, ts, id)
    <store>/snapshot_fields   FieldMeta rows keyed by snapshot_id
    <store>/profiles          per-partition column profiles
All tables are metadata-scale — tiny next to the data table.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import SNAPSHOT_SCHEMA
from ..operators.snapshot import (
    ensure_metadata_only,
    latest_snapshot_per_entity,
    new_snapshot_id,
)


def persist_snapshot(
    spark: SparkSession,
    store_dir: str,
    entity: str,
    epoch: int,
    fields: DataFrame,
    profiles: DataFrame | None = None,
    created_by: str = "schema_drift_detector_spark",
    source_path: str | None = None,
) -> str:
    """Append an immutable snapshot; returns its uuid
    (≙ snapshot_persistence_agent.py:116 identity semantics)."""
    snapshot_id = new_snapshot_id()
    # write-ahead ordering: fields/profiles land FIRST, the snapshot
    # meta row LAST — the meta row is the commit point every reader
    # discovers snapshots through (previous_snapshot, get_or_create).
    # A crash mid-persist then leaves only unreferenced field rows,
    # never a discoverable-but-empty snapshot that would poison the
    # diff chain permanently (same discipline as plans/manifest.py).
    f = fields.withColumn("snapshot_id", F.lit(snapshot_id)).withColumn("entity", F.lit(entity))
    ensure_metadata_only(f)
    f.write.mode("append").parquet(f"{store_dir}/snapshot_fields")
    if profiles is not None:
        ensure_metadata_only(profiles)
        profiles.withColumn("snapshot_id", F.lit(snapshot_id)).withColumn(
            "entity", F.lit(entity)
        ).write.mode("append").parquet(f"{store_dir}/profiles")
    meta = spark.createDataFrame(
        [
            (
                snapshot_id,
                entity,
                int(epoch),
                datetime.now(timezone.utc),
                created_by,
                source_path,
            )
        ],
        SNAPSHOT_SCHEMA,
    )
    meta.coalesce(1).write.mode("append").parquet(f"{store_dir}/snapshots")
    return snapshot_id


def get_or_create_snapshot(
    spark: SparkSession,
    store_dir: str,
    entity: str,
    epoch: int,
    fields: DataFrame,
    run_id: str,
) -> str:
    """Idempotent snapshot for a run: a resumed run reuses the snapshot
    it already persisted (keyed by source_path == run_id) instead of
    appending a duplicate — keeps the PREVIOUS_SNAPSHOT chain and the
    drift report stable across interruptions."""
    existing = (
        read_snapshots(spark, store_dir)
        .filter(
            (F.col("entity") == entity)
            & (F.col("epoch") == int(epoch))
            & (F.col("source_path") == run_id)
        )
        .limit(1)
        .collect()
    )
    if existing:
        return existing[0].snapshot_id
    return persist_snapshot(spark, store_dir, entity, epoch, fields, source_path=run_id)


def read_snapshots(spark: SparkSession, store_dir: str) -> DataFrame:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(f"{store_dir}/snapshots")
    except AnalysisException:
        # store not initialized yet; transient IO/corruption errors must
        # propagate — treating them as "no snapshots" would both produce
        # a false first-snapshot all-adds diff and append a duplicate
        # snapshot row
        return spark.createDataFrame([], SNAPSHOT_SCHEMA)


def previous_snapshot(spark: SparkSession, store_dir: str, entity: str, before_id: str) -> str | None:
    """Most recent snapshot for entity other than ``before_id`` (R11)."""
    snaps = read_snapshots(spark, store_dir).filter(
        (F.col("entity") == entity) & (F.col("snapshot_id") != before_id)
    )
    latest = latest_snapshot_per_entity(snaps).collect()
    return latest[0].snapshot_id if latest else None


def fields_of(spark: SparkSession, store_dir: str, snapshot_id: str) -> DataFrame:
    return (
        spark.read.parquet(f"{store_dir}/snapshot_fields")
        .filter(F.col("snapshot_id") == snapshot_id)
        .select("name", "dtype", "nullable", "ordinal")
    )
