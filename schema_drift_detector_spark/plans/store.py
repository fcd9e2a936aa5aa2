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
    snapshot_id: str | None = None,
) -> str:
    """Append an immutable snapshot; returns its uuid
    (≙ snapshot_persistence_agent.py:116 identity semantics).
    ``snapshot_id`` lets a caller that minted the id up front (see
    resolve_snapshot_chain) persist under it; default mints a fresh
    uuid."""
    snapshot_id = snapshot_id or new_snapshot_id()
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


def resolve_snapshot_chain(
    spark: SparkSession,
    store_dir: str,
    entity: str,
    epoch: int,
    run_id: str,
) -> tuple[str, str | None, bool]:
    """Resolve (snapshot_id, previous_snapshot_id, needs_persist) with
    ONE collect of the (tiny) snapshots meta table, instead of the
    get_or_create + previous_snapshot pair's two separate parquet
    reads + three collect jobs. The meta table is metadata-scale by
    construction (one row per snapshot), so driver-side resolution is
    the right altitude — each avoided Spark job is ~0.5-1 s of serial
    driver latency that Amdahls short runs (BENCH/BASELINE.md phase
    decomposition; r4 verdict #1).

    Matches get_or_create_snapshot (reuse iff a snapshot with this
    entity/epoch/source_path==run_id exists) and previous_snapshot
    (most recent OTHER snapshot for the entity; timestamp desc,
    snapshot_id as a deterministic tie-break). When ``needs_persist``
    is True the caller owns writing the snapshot via
    persist_snapshot(..., snapshot_id=...) — and must do so before
    anything downstream becomes externally visible (manifest commit),
    preserving the write-ahead chain discipline.
    """
    rows = read_snapshots(spark, store_dir).filter(F.col("entity") == entity).collect()
    existing = [
        r
        for r in rows
        if r.epoch == int(epoch) and r.source_path == run_id
    ]
    if existing:
        snapshot_id, created = existing[0].snapshot_id, False
    else:
        snapshot_id, created = new_snapshot_id(), True
    others = sorted(
        (r for r in rows if r.snapshot_id != snapshot_id),
        key=lambda r: (r.timestamp, r.snapshot_id),
        reverse=True,
    )
    prev_id = others[0].snapshot_id if others else None
    return snapshot_id, prev_id, created


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
