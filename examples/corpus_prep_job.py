"""spark-submit entry point for the composed LLM-corpus preparation
pipeline — the certified hygiene chain (corpus_pipeline_e2e's operator
composition) over an arbitrary documents table:

    [URL governance (--url-col)] → Unicode normalization → Gopher
    quality filter → exact dedup → cross-doc boilerplate strip →
    intra-doc repetition strip → PII redaction → benchmark
    decontamination → MinHash near-dup drop → CCNet LM-perplexity
    tier drop → mixing (per-source token budget, or mT5-style
    temperature quotas with --mix temperature) → context chunking →
    next-fit sequence packing

    zip -r engine.zip schema_drift_detector_spark
    spark-submit --py-files engine.zip examples/corpus_prep_job.py \
        --docs /path/to/documents.parquet \
        --out /path/to/prep_out \
        [--eval-docs /path/to/eval.parquet]   # decontamination source
        [--budget-tokens 1000000] [--chunk-tokens 2048] [--stride 1024] \
        [--pack-cap 4096] [--shards 64] [--min-words 50] [--skip-quality] \
        [--skip-normalize] \
        [--skip-lm-tier] [--lm-buckets 4096] [--lm-train-frac 0.1] \
        [--url-col url --url-blocklist evil.example \
         --url-hard-kw /xxx --url-soft-kw casino=2,free=1 \
         --url-soft-threshold 3 --url-drop-null] \
        [--mix temperature --mix-total 0 --mix-alpha 0.3]

Input schema: (doc_id long, source string, text string) — extra
columns pass through to the survivors output, EXCEPT the reserved
internal names n_tokens/n_removed (the job fails loud on those) and
NULL-text rows (dropped up front, counted in the stats). Outputs
under --out:
  survivors/   cleaned, deduped, budgeted docs (doc_id, source, text)
  chunks/      (doc_id, chunk_index, chunk_text, n_chunk_tokens)
  packed/      the packed-sequence manifest (chunk_uid, shard, bin,
               n_tokens, truncated)
  stats.json   per-stage row counts (drop-rate audit)

Stage knobs mirror the certified operators' defaults; every stage is
the exact operator the entry-board certifies (nothing re-implemented
here). Decontamination is skipped unless --eval-docs is given.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet path/table")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--eval-docs", help="benchmark/eval docs to decontaminate against")
    ap.add_argument("--budget-tokens", type=int, default=1_000_000)
    ap.add_argument("--chunk-tokens", type=int, default=2048)
    ap.add_argument("--stride", type=int, default=1024)
    ap.add_argument("--pack-cap", type=int, default=4096)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--min-words", type=int, default=50)
    ap.add_argument("--min-stopword-hits", type=int, default=2)
    ap.add_argument("--gram-n", type=int, default=8)
    ap.add_argument("--boilerplate-min-df", type=int, default=4)
    ap.add_argument("--lsh-threshold", type=float, default=0.6)
    ap.add_argument("--skip-quality", action="store_true")
    ap.add_argument(
        "--skip-normalize",
        action="store_true",
        help="skip Unicode normalization (strip controls, NFC, space "
        "mapping, whitespace collapse) — ON by default because "
        "un-normalized text defeats every downstream dedup/decontam "
        "gram identity",
    )
    ap.add_argument("--skip-lm-tier", action="store_true")
    ap.add_argument(
        "--url-col",
        help="run URL governance FIRST over this column (RefinedWeb "
        "§3.1: drop crawl records whose URL hits the domain blocklist "
        "or the keyword rules) — requires at least one of "
        "--url-blocklist / --url-hard-kw / --url-soft-kw",
    )
    ap.add_argument(
        "--url-blocklist", default="",
        help="comma-separated lowercase blocked domains (subdomains "
        "blocked too)",
    )
    ap.add_argument(
        "--url-hard-kw", default="",
        help="comma-separated lowercase substrings — one occurrence "
        "anywhere in the URL drops the record",
    )
    ap.add_argument(
        "--url-soft-kw", default="",
        help="comma-separated kw=weight pairs; weighted occurrence sum "
        ">= --url-soft-threshold drops the record",
    )
    ap.add_argument("--url-soft-threshold", type=int, default=3)
    ap.add_argument(
        "--url-drop-null",
        action="store_true",
        help="ALSO drop records whose URL is NULL (unattributable). "
        "Default keeps them: a NULL verdict means 'no attribution', "
        "not 'pass' — this knob is where the caller decides, per the "
        "urlmeta contract",
    )
    ap.add_argument(
        "--mix", choices=["budget", "temperature"], default="budget",
        help="final mixing rule: 'budget' = per-source token budget "
        "(--budget-tokens; NULL-source docs are budgeted as their own "
        "group); 'temperature' = mT5-style doc quotas proportional to "
        "source_size**alpha (--mix-total, --mix-alpha; NULL-source "
        "docs are DROPPED — they cannot be attributed to a mixture "
        "component)",
    )
    ap.add_argument(
        "--mix-total", type=int, default=0,
        help="temperature mix: total docs to draw (default: half the "
        "surviving docs)",
    )
    ap.add_argument("--mix-alpha", type=float, default=0.3)
    ap.add_argument("--lm-buckets", type=int, default=4096)
    ap.add_argument(
        "--lm-train-frac",
        type=float,
        default=0.1,
        help="deterministic doc_id-hash fraction of the survivors used "
        "as the LM's trusted counting corpus (CCNet's in-domain side)",
    )
    args = ap.parse_args()

    from schema_drift_detector_spark.functions.pii import pii_redact
    from schema_drift_detector_spark.functions.text import token_count
    from schema_drift_detector_spark.operators.cleaning import gopher_quality_filter
    from schema_drift_detector_spark.operators.decontam import (
        contamination_hits,
        eval_gram_hashes,
    )
    from schema_drift_detector_spark.operators.dedup import (
        connected_components,
        drop_exact_duplicates,
        minhash_near_duplicates,
    )
    from schema_drift_detector_spark.operators.packing import (
        chunk_documents,
        pack_next_fit,
    )
    from schema_drift_detector_spark.operators.sampling import take_token_budget
    from schema_drift_detector_spark.operators.substring import (
        strip_repeated_runs,
        substring_dedup,
    )
    from schema_drift_detector_spark.sources.io import read_table

    spark = SparkSession.builder.appName("corpus-prep").getOrCreate()
    stats: dict[str, int] = {}

    docs = read_table(spark, args.docs)
    # n_tokens/n_removed are produced-and-consumed internally by the
    # strip stages; a caller's same-named columns would be silently
    # destroyed — fail loud instead (the gopher clash-guard discipline)
    reserved_names = {"n_tokens", "n_removed"}
    if not args.skip_lm_tier:
        reserved_names |= {"avg_nll", "n_scored", "n_backoff", "ppl_tier"}
    reserved = reserved_names & set(docs.columns)
    if reserved:
        raise SystemExit(
            f"input carries reserved column(s) {sorted(reserved)} — rename them"
        )
    stats["input"] = docs.count()

    # NULL text can never survive the chain usefully (token_count on
    # NULL is the classic size(-1) trap under legacy sizeOfNull) —
    # drop it up front, audited
    docs = docs.filter(F.col("text").isNotNull())
    stats["after_null_text_drop"] = docs.count()

    if args.url_col:
        # stage -1: URL governance — the crawl-record drop, before any
        # text stage (the RefinedWeb ordering)
        from schema_drift_detector_spark.functions.urlmeta import url_verdict

        block = [d for d in args.url_blocklist.split(",") if d]
        hard = [k for k in args.url_hard_kw.split(",") if k]
        soft = {}
        for pair in args.url_soft_kw.split(","):
            if pair:
                k, _, w = pair.partition("=")
                try:
                    soft[k] = int(w or 1)
                except ValueError:
                    raise SystemExit(
                        f"--url-soft-kw weights must be integers, got {pair!r}"
                    )
        if not (block or hard or soft):
            raise SystemExit(
                "--url-col given but no rule configured (--url-blocklist / "
                "--url-hard-kw / --url-soft-kw) — the stage would be a no-op"
            )
        if args.url_col not in docs.columns:
            raise SystemExit(f"input has no column {args.url_col!r}")
        if args.url_drop_null:
            docs = docs.filter(F.col(args.url_col).isNotNull())
        docs = docs.filter(
            url_verdict(
                args.url_col, block, hard, soft, args.url_soft_threshold
            ).isNull()
        )
        stats["after_url_governance"] = docs.count()

    if not args.skip_normalize:
        # stage 0: Unicode normalization (zero-shuffle Arrow scan) —
        # row-preserving, so no stats entry; everything downstream
        # (dedup grams, PII regexes, LM counts, token budgets) reads
        # the normalized text
        from schema_drift_detector_spark.functions.normalize import (
            normalize_text_arrow,
        )

        docs = docs.select(
            *[c for c in docs.columns if c != "text"],
            normalize_text_arrow("text").alias("text"),
        )

    if not args.skip_quality:
        from schema_drift_detector_spark.operators.cleaning import GOPHER_RULE_COLS

        docs = (
            gopher_quality_filter(
                docs,
                min_words=args.min_words,
                min_stopword_hits=args.min_stopword_hits,
                include_input=True,
            )
            .filter(F.col("keep"))
            .drop("n_words", "mean_word_len", "keep", *GOPHER_RULE_COLS)
        )
        stats["after_quality_filter"] = docs.count()

    # checkpoint after exact dedup: both the count and the two gram
    # passes read it (un-checkpointed, each would replay the scan +
    # quality filter + md5 window)
    docs = drop_exact_duplicates(docs, "doc_id", "text").localCheckpoint(eager=True)
    stats["after_exact_dedup"] = docs.count()

    docs = substring_dedup(docs, n=args.gram_n, min_df=args.boilerplate_min_df)
    docs = strip_repeated_runs(docs, n=args.gram_n).drop("n_tokens", "n_removed")
    docs = docs.select(
        *[c for c in docs.columns if c != "text"], pii_redact("text").alias("text")
    ).localCheckpoint(eager=True)  # several consumers; don't re-run the strips

    if args.eval_docs:
        eval_df = read_table(spark, args.eval_docs)
        hits = contamination_hits(
            docs,
            eval_gram_hashes(eval_df, "text", n=args.gram_n),
            "doc_id",
            "text",
            n=args.gram_n,
        )
        docs = docs.join(hits.select("doc_id"), "doc_id", "left_anti").localCheckpoint(
            eager=True
        )
        stats["after_decontamination"] = docs.count()

    pairs = minhash_near_duplicates(
        docs, "doc_id", "text", n=5, k=64, bands=16,
        threshold=args.lsh_threshold, hash_fn="md5",
    )
    drops = connected_components(pairs).filter(F.col("doc") != F.col("cluster"))
    docs = docs.join(
        drops.select(F.col("doc").alias("doc_id")), "doc_id", "left_anti"
    ).localCheckpoint(eager=True)
    stats["after_neardup_drop"] = docs.count()

    if not args.skip_lm_tier:
        from schema_drift_detector_spark.operators.quality_lm import (
            lm_perplexity,
            ppl_tiers,
        )
        from schema_drift_detector_spark.operators.sampling import hash_bucket

        # CCNet tier drop: score every survivor against a bigram LM
        # counted from the in-domain hash subset; the 'tail' perplexity
        # third drops (zero-token docs score NULL and drop too — they
        # cannot contribute training tokens anyway)
        train = docs.filter(
            hash_bucket("doc_id", salt=":lmT")
            < int(round(args.lm_train_frac * 1_000_000))
        )
        docs = (
            ppl_tiers(
                lm_perplexity(docs, train, n_buckets=args.lm_buckets),
                id_col="doc_id",
            )
            .filter(F.col("ppl_tier").isin("head", "middle"))
            .drop("avg_nll", "n_scored", "n_backoff", "ppl_tier")
            .localCheckpoint(eager=True)
        )
        stats["after_lm_tier_drop"] = docs.count()

    if args.mix == "temperature":
        from schema_drift_detector_spark.operators.sampling import temperature_mix

        # after_neardup_drop is set unconditionally just above — no
        # stage between it and the mix changes the row count, so no
        # extra count() action is needed (review catch)
        n_surv = stats.get("after_lm_tier_drop", stats["after_neardup_drop"])
        total = args.mix_total or max(1, n_surv // 2)
        docs = temperature_mix(
            docs, "source", "doc_id", total, alpha=args.mix_alpha
        ).localCheckpoint(eager=True)
        stats["after_temperature_mix"] = docs.count()
    else:
        docs = take_token_budget(
            docs.withColumn("__nt", token_count("text")),
            "source",
            "doc_id",
            "__nt",
            args.budget_tokens,
        ).drop("__nt").localCheckpoint(eager=True)
        stats["after_token_budget"] = docs.count()
    docs.write.mode("overwrite").parquet(f"{args.out}/survivors")

    chunks = chunk_documents(
        docs, chunk_tokens=args.chunk_tokens, stride=args.stride
    ).localCheckpoint(eager=True)
    stats["chunks"] = chunks.count()
    chunks.write.mode("overwrite").parquet(f"{args.out}/chunks")

    packed = pack_next_fit(
        chunks.select(
            F.concat_ws(
                ":", F.col("doc_id").cast("string"), F.col("chunk_index")
            ).alias("chunk_uid"),
            "n_chunk_tokens",
        ),
        "chunk_uid",
        "n_chunk_tokens",
        cap_tokens=args.pack_cap,
        n_shards=args.shards,
    ).localCheckpoint(eager=True)
    stats["packed_chunks"] = packed.count()
    packed.write.mode("overwrite").parquet(f"{args.out}/packed")

    line = json.dumps(stats)
    # the documented stats.json artifact (stdout alone drowns in
    # spark-submit noise); local filesystem outputs only — for remote
    # --out (s3a:// etc.) the stdout line is the record
    if "://" not in args.out:
        import os

        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "stats.json"), "w") as fh:
            fh.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
