"""spark-submit entry point for a cluster validation run.

    zip -r engine.zip schema_drift_detector_spark
    spark-submit --py-files engine.zip \
        [--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
         --conf spark.sql.catalog.lake=...] \
        examples/validate_job.py \
        --docs lake.db.documents --catalog lake.db.asset_catalog \
        --out s3a://bucket/validation --run-id nightly-2026-08-16 --epoch 3

Re-running with the same --run-id resumes at partition granularity.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from schema_drift_detector_spark.plans.run import (
    DEFAULT_SPEC,
    baseline_histogram,
    baseline_kind_counts,
    baseline_tdigest,
    run_validation,
)
from schema_drift_detector_spark.sources.io import read_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents table (Iceberg id or path)")
    ap.add_argument("--catalog", required=True, help="asset catalog table")
    ap.add_argument("--out", required=True, help="output root (verdicts/violations/manifest)")
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--epoch", type=int, default=0)
    ap.add_argument("--partition-batches", type=int, default=1)
    ap.add_argument(
        "--baseline-docs",
        help="baseline-epoch documents table: enables distribution/quantile/"
        "categorical drift checks against it",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName(f"validate-{args.run_id}").getOrCreate()
    baselines = {}
    if args.baseline_docs:
        base = read_table(spark, args.baseline_docs)
        baselines = {
            "baseline_hist": baseline_histogram(base, DEFAULT_SPEC),
            "baseline_td": baseline_tdigest(base),
            "baseline_kinds": baseline_kind_counts(base),
        }
    envelope = run_validation(
        spark,
        read_table(spark, args.docs),
        read_table(spark, args.catalog),
        args.out,
        run_id=args.run_id,
        epoch=args.epoch,
        partition_batches=args.partition_batches,
        **baselines,
    )
    print(json.dumps(envelope, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
