"""Benchmark harness (driver contract).

Headline metric (BASELINE.json): validated documents/sec for the
profile + constraint pass over the interleaved documents table.
Also times representative __spark_entry__ queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <validate-pass seconds>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "docs_per_sec": ..., "n_docs": ..., "cores": ...}

The synthetic documents table (FIXTURES.md F1, ~500k docs ≙ sf0.1
guidance) is generated once into .bench_cache/ and re-read from parquet
so the timed pass measures scan+profile+constraints, not generation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from schema_drift_detector_spark.operators.constraints import (
    check_referential_integrity,
    check_uniqueness,
    duplicate_keys,
)
from schema_drift_detector_spark.operators.profile import profile_columns, profile_spans
from schema_drift_detector_spark.session import get_spark
from schema_drift_detector_spark.sources.synth import (
    SynthConfig,
    synth_asset_catalog,
    synth_documents,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "500000"))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

# Core-pin the whole process tree (JVM compute AND helper threads, probe
# workers) to cores 0..CPUS-1 — the same discipline tools/bench_scaling.py
# applies to scaling runs. On this host-steal-prone VM, unpinned helper
# threads migrate across the advertised-but-contended cores and add
# run-to-run variance that three rounds of bench adjudication traced to
# the host, not the engine. Done before the JVM exists so it inherits.
try:
    os.sched_setaffinity(0, set(range(CPUS)))
    PINNED = True
except (AttributeError, OSError):  # non-Linux / restricted
    PINNED = False

# The bench input is a few hundred MB, so the 128MB cluster default for
# maxPartitionBytes would give the scan fewer tasks than cores; 8MB keeps
# scan parallelism ≥ cores here. (On a 100TB table the default is right —
# this is a small-input knob, not an engine knob.)
BENCH_CONF = {
    "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": str(1024 * 1024),
}

BENCH_QUERIES = [
    "schema_diff",
    "drift_report",
    "latest_order_per_customer",
    "order_chain",
    "nations_order_stats",
    "profile_events",
    "heavy_hitter_users",
    "distribution_drift_events",
    "exact_dedup_props",
    "jaccard_pairs_sample",
    "token_stats_by_lang",
    "lang_id",
    "quality_scores",
    "fingerprints",
    "corpus_prep",
    "ann_topk",
    "ivf_assign",
    "ann_topk_ivf",
    "embedding_near_dups",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "dedup_clusters",
    "corpus_prep_full",
    "decontaminate",
    "pack_sequences",
    "incremental_dedup",
    "salted_join_hot_events",
    "substring_dedup",
    # r6 additions: repetition signals ride the wide text-features scan;
    # pii_scrub prices the codegen regexp scrub + injection
    "text_doc_features",
    "pii_scrub",
    "chunk_documents",
    "asof_join",
    "range_join_sessions",
    # r7: the composed corpus pipeline (quality filter → dedup →
    # substring strip → PII → decontam → near-dup drop → token budget →
    # chunk → pack) priced end-to-end; NEW row (10-stage composition
    # from late-r7 on — annotated in BENCH/BASELINE.md)
    "corpus_pipeline_e2e",
    # late-r7 new entries (rows price the certified entry incl. its
    # non-vacuity gates + checkpoint, the composition from day one)
    "bm25_topk",
    "zorder_layout",
    # late-r7 NEW row: CCNet bigram stupid-backoff LM scoring + ntile
    # tiering (the bare 'ppl' face of the stratified_split board entry)
    "lm_perplexity",
    # late-r7 NEW rows: SQ8 fit + encode/decode + ADC top-k and PQ
    # codebook + per-subspace argmin encode + reconstruction top-k
    # (the bare 'sq8'/'pq' faces of the ann_topk_methods board entry);
    # new series — the existing ann_topk/ivf rows continue unbroken
    "ann_topk_sq8",
    "ann_topk_pq",
    # late-r7 NEW row: mT5-style temperature-scaled mixture sampling
    # (the bare 'temperature' face of the source_quota board entry);
    # new series from r7
    "temperature_mix",
    # late-r7 NEW row: supervised Naive Bayes quality/domain classifier
    # (the bare 'nb' face of the stratified_split board entry — the
    # fastText-style model-based filter stand-in: one-pass train +
    # broadcast-model scoring + codegen argmax); new series from r7
    "nb_classify",
    # late-r7 NEW row: count-min sketch build + estimate vs exact
    # counts (the bare 'cms' face of the salted_join board entry);
    # new series from r7
    "cms_sketch",
]


# Per-face sub-timings for BENCH_QUERIES rows whose helper computes a
# UNION of faces (possibly plus eager gates): the row's headline time prices all faces together, so
# the moment a new face merges into an existing q_<name> helper its time
# series silently re-prices (profile_events r6 jumped 2.18× this way).
# Each face is timed via a dedicated q_<name>__<face> helper building
# ONLY that face's plan when one exists (mandatory for entries that
# checkpoint/gate eagerly — there a post-hoc filter prices the whole
# union), else via .filter(face == v) on the un-checkpointed union,
# where the per-branch face literal lets Catalyst fold the other
# branches to empty. RULE: any future face merge into a BENCH_QUERIES
# helper must add its faces here (plus a __face helper if the entry
# checkpoints) AND write a series-break annotation in BENCH/BASELINE.md.
FACE_SPLITS: dict[str, list[str]] = {
    # 'json' joined late-r7 (semi-structured extraction face) — the
    # row re-prices; profile/pivot sub-timings continue their series;
    # 'unpivot' (wide→long melt) joined later still — the row
    # re-prices again (annotated in BENCH/BASELINE.md)
    "profile_events": ["profile", "pivot", "json", "unpivot"],
    # r7: tokenizer-seam face merged into the entry — 'ws' continues the
    # ≤r6 single-face series; 'bpe' (GPT-2-style regex pre-tokenization)
    # joined late-r7 (annotated in BENCH/BASELINE.md r7 notes)
    "chunk_documents": ["ws", "chargram", "bpe"],
    # late-r7: TF-IDF distinctive-terms face merged in — 'stats'
    # continues the ≤r7-early single-face series; PMI 'collocations'
    # joined later still — the row re-prices again (annotated in
    # BENCH/BASELINE.md r7 notes)
    "token_stats_by_lang": ["stats", "distinctive", "collocations"],
    # r7: intra-doc repetition strip merged in — 'cross' continues the
    # ≤r6 single-face series (annotated in BENCH/BASELINE.md r7 notes)
    "substring_dedup": ["cross", "intra"],
    # NOTE (late r7): the salted_join/heavy_hitter BOARD merges need no
    # entry here — bench resolves getattr-first, so the
    # 'salted_join_hot_events' and 'heavy_hitter_users' ROWS still
    # price their original bare helpers and their series continue
    # unbroken (a FACE_SPLITS entry for the merged 'salted_join' board
    # name would be unreachable: it is not a BENCH_QUERIES row).
    # late-r7: analytic window-function face merged into the BOARD
    # entry; the bench 'order_chain' row resolves the bare chain-face
    # helper (series unbroken) and these faces add per-face detail
    "order_chain": ["chain", "latest", "analytic"],
    # r7: C4 line cleaning + Gopher quality rules merged in —
    # 'features' continues the ≤r7-early single-face series;
    # 'normalize' (Unicode normalization) joined late-r7 — the row
    # re-prices again (annotated in BENCH/BASELINE.md)
    # 'url' (RefinedWeb URL governance) joined late-r7 — the row
    # re-prices again (annotated in BENCH/BASELINE.md)
    "text_doc_features": ["features", "c4", "gopher", "normalize", "url"],
}


def _steal_jiffies() -> int:
    """Steal jiffies from the aggregate /proc/stat cpu line (field 8).
    Hypervisor steal is DIRECTLY measurable on this host — bracketing
    the run with these readings turns 'the drift is probably steal'
    (three rounds of adjudication, r4-r6) into a number."""
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def steal_bracket(fn):
    """Run fn(), returning (result, steal_metrics): steal jiffies and
    the steal fraction of total machine capacity over fn's wall time.
    The numerator is MACHINE-wide (aggregate cpu line), so the
    capacity denominator must be machine-wide too — os.cpu_count(),
    NOT the CPUS knob (review catch: SPARK_GRAFT_CPUS=16 on a 32-core
    host would double-read steal)."""
    import os

    hz = os.sysconf("SC_CLK_TCK")
    ncpu = os.cpu_count() or CPUS
    s0 = _steal_jiffies()
    w0 = time.time()
    result = fn()
    wall = time.time() - w0
    s1 = _steal_jiffies()
    cap = ncpu * wall * hz  # jiffies of capacity the wall clock offered
    return result, {
        "steal_jiffies": s1 - s0,
        "steal_pct_of_capacity": round(100.0 * (s1 - s0) / cap, 2) if cap else 0.0,
        "wall_s": round(wall, 1),
    }


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def host_probe() -> dict:
    """Spark-free busy-loop capacity probe, embedded so every BENCH_rNN
    is self-interpreting: this virtualized host has time-varying
    hypervisor steal (observed ~1.5x swings between sessions), so raw
    wall times are only comparable across rounds when normalized by the
    host's own deliverable throughput at measurement time.

    Reports single-worker M ops/s and CPUS-worker aggregate M ops/s;
    effective_cores = aggregate / single. A round-over-round wall-time
    change that tracks the probe ratio is host steal, not the engine."""
    import multiprocessing as mp

    # spawn, not fork: the post-run probe executes with the py4j/JVM
    # gateway threads live, and a forked worker can inherit a held lock
    # and hang before ever reaching _burn
    ctx = mp.get_context("spawn")
    out: dict = {}
    for procs in (1, CPUS):
        with ctx.Pool(procs) as p:
            p.map(_burn, [200_000] * procs)  # pool warm-up, excluded
            t0 = time.time()
            p.map(_burn, [20_000_000] * procs * 2)
            out[f"mops_{procs}w"] = round(
                procs * 2 * 20_000_000 / (time.time() - t0) / 1e6, 1
            )
    out["effective_cores"] = round(out[f"mops_{CPUS}w"] / out["mops_1w"], 1)
    return out


def bench_cfg() -> SynthConfig:
    return SynthConfig(n_docs=N_DOCS, n_partitions=64, n_assets=200_000)


def ensure_bench_data(spark) -> tuple[str, str]:
    docs_path = f"{CACHE}/documents_e0_{N_DOCS}"
    cat_path = f"{CACHE}/asset_catalog_{N_DOCS}"
    cfg = bench_cfg()
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        synth_documents(spark, cfg, epoch=0, parallelism=CPUS * 2).write.mode(
            "overwrite"
        ).parquet(docs_path)
    if not os.path.exists(os.path.join(cat_path, "_SUCCESS")):
        synth_asset_catalog(spark, cfg).write.mode("overwrite").parquet(cat_path)
    return docs_path, cat_path


def _force(df) -> None:
    """Materialize a DataFrame fully without driver transfer."""
    df.write.format("noop").mode("overwrite").save()


def validate_pass(spark, docs_path: str, cat_path: str) -> float:
    """The headline pass: scan → column profiles + span profiles +
    uniqueness + referential integrity, all materialized.

    The independent outputs are submitted CONCURRENTLY (thread pool →
    concurrent Spark jobs): on a real cluster the scheduler interleaves
    their stages across executors, so per-job fixed overhead doesn't
    serialize — same effect here.

    Measured alternative (rejected): persisting the docs frame
    (MEMORY_AND_DISK) and running the same jobs over the cache. At 16M
    docs / local[32]: materialization cost 328s (JVM object caching of
    the nested spans column thrashes GC even at 48g heap), warm passes
    18.9s vs 21.9s scan-based — a 1.16x steady-state win that never
    amortizes. The concurrent scans already share the OS page cache for
    parquet bytes; re-decoding columns per job is cheaper than caching
    deserialized nested rows. Keep the scan layout.

    Also measured (rejected): fusing the span profile + RI verdict into
    one explode + broadcast-join + per-kind aggregation (caching the
    tiny per-kind rows and deriving both outputs). 15.9s vs 18.0s warm
    at 16M docs — 1.13x, under the 1.2x complexity bar, because the RI
    *violation rows* still require their own span pass either way."""
    from concurrent.futures import ThreadPoolExecutor

    docs = spark.read.parquet(docs_path)
    catalog = spark.read.parquet(cat_path)
    # explicit dup-key cache, unpersisted (blocking) at the end of the
    # pass: check_uniqueness's internal cache would otherwise be plan-
    # matched by Spark's CacheManager across passes, silently excluding
    # the whole uniqueness key scan from every timed run after warm-up
    dups = duplicate_keys(docs).persist()
    uq_v, uq_viol = check_uniqueness(docs, "bench", dups=dups)
    ri_v, ri_viol = check_referential_integrity(docs, catalog, "bench")
    # union same-schema outputs → 4 concurrent jobs instead of 6
    # (same compute; fewer fixed per-job costs)
    outputs = [
        profile_columns(docs, snapshot_id="bench", entity="documents"),
        profile_spans(docs),
        uq_v.unionByName(ri_v),
        uq_viol.unionByName(ri_viol),
    ]
    t0 = time.time()
    try:
        with ThreadPoolExecutor(max_workers=len(outputs)) as pool:
            list(pool.map(_force, outputs))
        return time.time() - t0
    finally:
        dups.unpersist(blocking=True)


def main() -> None:
    probe_pre = host_probe()  # before the JVM exists — clean host reading

    spark = get_spark(
        "bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
        extra_conf=BENCH_CONF,
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs_path, cat_path = ensure_bench_data(spark)
    # warm-up (JVM/codegen/page cache), excluded; best of 3 timed passes
    # (the virtualized host has time-varying steal — single samples are noisy)
    validate_pass(spark, docs_path, cat_path)
    elapsed, steal_validate = steal_bracket(
        lambda: min(validate_pass(spark, docs_path, cat_path) for _ in range(3))
    )

    import __spark_entry__ as E

    qtimes: dict[str, float] = {}
    qface: dict[str, float] = {}
    qsteals: dict[str, float] = {}
    qs = E.queries()

    def _queries_section() -> None:
        for name in BENCH_QUERIES:
            # per-variant q_<name> helper FIRST; registry as fallback —
            # the round-6 board merges (jaccard full+sample, ann brute/
            # ivf/trained, corpus_prep stats+full, …) kept every
            # q_<name> function precisely so this time series stays
            # comparable across rounds; registry-first would silently
            # re-point a name like corpus_prep at its merged union and
            # distort the series
            fn = getattr(E, f"q_{name}", None) or qs[name]
            samples = []

            def _three() -> None:
                for _ in range(3):  # best of 3 — host steal noise
                    t0 = time.time()
                    _force(fn(spark, SF_DIR))
                    samples.append(time.time() - t0)

            # per-row steal bracket: section-level averages hide the
            # BURSTS that actually re-price individual queries (r7:
            # median 1.12x drift vs r6 at 1.67% section-average steal)
            _, qsteal = steal_bracket(_three)
            qtimes[name] = round(min(samples), 3)
            qsteals[name] = qsteal["steal_pct_of_capacity"]
            for face in FACE_SPLITS.get(name, ()):
                # a dedicated q_<name>__<face> helper builds ONLY that
                # face's plan — required when the merged entry eagerly
                # checkpoints/gates both faces before returning (there a
                # post-hoc .filter(face) would price the whole union; r7
                # review catch). The filter fallback is correct only for
                # non-checkpointed, gate-free unions, where the face
                # literal lets Catalyst fold the other branches to
                # empty — as of late-r7 EVERY FACE_SPLITS entry ships
                # dedicated helpers (profile_events gained an eager
                # json gate), so the fallback is a safety net only.
                ffn = getattr(E, f"q_{name}__{face}", None)
                fsamples = []
                for _ in range(3):
                    t0 = time.time()
                    if ffn is not None:
                        _force(ffn(spark, SF_DIR))
                    else:
                        _force(fn(spark, SF_DIR).filter(F.col("face") == face))
                    fsamples.append(time.time() - t0)
                qface[f"{name}:{face}"] = round(min(fsamples), 3)

    _, steal_queries = steal_bracket(_queries_section)

    probe_post = host_probe()  # steal drifts within a session — bracket it

    out = {
        # (metric, value, unit) names the VALUE: wall seconds of the
        # validate pass. Throughput lives in docs_per_sec — a reader of
        # the conventional triple must not mistake 4.0 for docs/sec.
        "metric": "validate-pass wall time (profile+constraint pass; throughput in docs_per_sec)",
        "value": round(elapsed, 3),
        "unit": "sec",
        "queries": qtimes,
        # per-face sub-timings for face-merged rows (see FACE_SPLITS):
        # compare a merged row across rounds via its faces, not its total
        "query_faces": qface,
        "sf": SF_DIR,
        "n_docs": N_DOCS,
        "pinned_cores": PINNED,
        "docs_per_sec": round(N_DOCS / elapsed, 1),
        "cores": CPUS,
        # host-capacity probes bracketing the run (see host_probe docstring):
        # compare docs_per_sec across rounds only after normalizing by
        # mops_{CPUS}w — a wall-time delta that tracks the probe delta is
        # hypervisor steal, not an engine change
        "host_probe_pre": probe_pre,
        "host_probe_post": probe_post,
        # DIRECTLY measured hypervisor steal (Δ/proc/stat steal jiffies
        # as % of CPUS×wall capacity) bracketing the validate pass and
        # the per-query section — r4-r6 spent a round each adjudicating
        # wall drift the probes could only suggest was steal; this
        # measures it. A round with steal_pct_of_capacity >> the
        # comparison round's is re-priced by the host, not the engine.
        "steal_validate": steal_validate,
        "steal_queries": steal_queries,
        # steal % of capacity over each row's own 3-sample window —
        # adjudicate a single row's drift against ITS steal, not the
        # section average
        "query_steal_pct": qsteals,
        # self-normalized headline (r3 verdict housekeeping): docs/sec per
        # host-probe M ops/s, using the mean of the bracketing aggregate
        # probes — directly comparable across rounds without manual
        # steal arithmetic
        "docs_per_sec_per_mops": round(
            N_DOCS
            / elapsed
            / ((probe_pre[f"mops_{CPUS}w"] + probe_post[f"mops_{CPUS}w"]) / 2),
            2,
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
