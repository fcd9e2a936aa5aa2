"""Checkpoint manifest with partition-granular resume (north_rule).

The reference persists immutable snapshots with a version chain
(snapshot_persistence_agent.py:154-273); the north_rule generalizes
that lineage to run checkpoints: one manifest row per (run_id,
partition) with status, timing, metrics and lineage JSON. A partition's
manifest row is appended only AFTER its verdict/violation writes
complete, so the manifest is the commit point: an interrupted run
leaves no row, and resume recomputes exactly the missing partitions.

Resume is an anti-join of the partition universe against completed
manifest entries — no driver-side bookkeeping files, no scans of the
(10^12-doc) data table to discover progress.
"""

from __future__ import annotations

import json
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import MANIFEST_SCHEMA


def manifest_path(out_dir: str) -> str:
    return f"{out_dir.rstrip('/')}/manifest"


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(manifest_path(out_dir))
    except AnalysisException:
        # first run (no manifest yet); transient read errors propagate —
        # swallowing them would reset resume and recompute every partition
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def completed_partitions(spark: SparkSession, out_dir: str, run_id: str) -> DataFrame:
    return (
        read_manifest(spark, out_dir)
        .filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
        .select("partition_id")
        .distinct()
    )


def pending_partitions(
    spark: SparkSession, universe: DataFrame, out_dir: str, run_id: str
) -> list[int]:
    """Partition ids still to validate: universe ⟕̸ completed (left_anti).

    The universe is tiny (one row per partition id) — collecting it to
    drive batch scheduling is metadata-scale, not data-scale.
    """
    done = completed_partitions(spark, out_dir, run_id)
    pend = universe.select("partition_id").distinct().join(done, "partition_id", "left_anti")
    return sorted(r.partition_id for r in pend.collect())


def commit_partitions(
    spark: SparkSession,
    out_dir: str,
    run_id: str,
    partition_stats: list[dict],
) -> None:
    """Append 'done' rows — the atomic commit point for a batch.

    partition_stats: [{partition_id, docs_validated, started_at (epoch s),
    metrics (dict), lineage (dict)}]
    """
    now = datetime.now(timezone.utc)
    rows = [
        (
            run_id,
            int(p["partition_id"]),
            "done",
            datetime.fromtimestamp(p.get("started_at", time.time()), tz=timezone.utc),
            now,
            int(p.get("docs_validated", 0)),
            json.dumps(p.get("metrics", {}), sort_keys=True),
            json.dumps(p.get("lineage", {}), sort_keys=True),
        )
        for p in partition_stats
    ]
    spark.createDataFrame(rows, MANIFEST_SCHEMA).coalesce(1).write.mode("append").parquet(
        manifest_path(out_dir)
    )
