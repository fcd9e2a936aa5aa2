"""Structured-Streaming extension: continuous epoch validation.

The reference is strictly request-triggered batch (api.py:30-55), so
this is an extension, not parity (SURVEY §2B "Streaming"): micro-batch
epochs replace the request trigger.

Two building blocks:

  windowed_event_counts   watermarked sliding-window aggregation over an
                          event-time column — the standard late-data-
                          tolerant profile stream.

  stream_validate         readStream → foreachBatch(run the SAME batch
                          operators per micro-batch). Each micro-batch
                          is an epoch: profile + constraints + drift vs
                          a static baseline histogram; verdicts append
                          to the sink dir. Checkpointing comes from
                          Spark's streaming checkpoint, composing with
                          the engine's own manifest.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked (sliding) window counts + ``value_col`` min/max stats
    per group. Works on a streaming OR batch DataFrame (same plan)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win = F.window(F.col(ts_col), window, slide or window)
    return src.groupBy(win.alias("win"), F.col(group_col)).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def session_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "1 hour",
    watermark: str = "2 hours",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Session-window (dynamic gap) counts + ``value_col`` min/max per
    group —
    the windowing cell tumbling/sliding cannot express: window extent
    is data-driven (a session closes only when the group goes quiet for
    ``gap``), so the state store MERGES adjacent windows as events
    arrive rather than routing rows into precomputed buckets.

    Gap boundary, pinned empirically on Spark 4.1: an event exactly
    ``gap`` after the previous one JOINS the session (same-session iff
    diff <= gap; the session's end extends to last_ts + gap). SQL
    replay is the gaps-and-islands form: new session iff
    ts - lag(ts) > gap. Works on a streaming OR batch DataFrame.

    WATERMARK WARNING (pinned empirically, Spark 4.1): unlike plain
    window aggregations — where complete output mode ignores the
    watermark — the session MERGE path drops/fragments arrivals older
    than the watermark in EVERY output mode, silently. Measured: a
    2-day watermark over 4 randomly-split files of a 30-day table
    yielded 1238 fragmented sessions vs the 626 true ones. Size
    ``watermark`` to the worst-case event-time disorder of the source,
    not to the gap; for bounded replays it must exceed the full data
    span."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return src.groupBy(
        F.session_window(F.col(ts_col), gap).alias("win"), F.col(group_col)
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def stream_time_bounded_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    within: str,
    watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join, time-bounded: pair every left row with
    the right rows of the same key whose timestamp falls in
    [left_ts, left_ts + within]. Both sides are watermarked — the time
    bound plus the watermarks let Spark EVICT buffered rows that can no
    longer match, so state is proportional to rate × horizon, not the
    stream's history (the property that makes stream-stream joins
    viable at all at scale). ``how`` is 'inner' (default) or
    'left_outer' — see the per-``how`` emission contracts below.

    ``watermark`` is deliberately REQUIRED (no default): it must cover
    the source's worst-case EVENT-TIME DISORDER, not the join bound —
    a buffered row is evicted once the watermark passes it, and a
    late-arriving counterpart then finds nothing and the pair is
    silently LOST (the same silent-loss class as the session-window
    WATERMARK WARNING above). Over a non-time-ordered finite replay
    (e.g. random file splits) it must exceed the full data span.

    Inner-join semantics on a finite replay with sufficient watermark:
    matches emit as soon as BOTH rows have arrived (the watermark
    bounds state, it does not gate inner-join output), so the UNION of
    all emitted micro-batches equals the batch join — the certifiable
    face.

    Left-outer semantics (how='left_outer'): matched pairs emit like
    the inner join; a left row that found NO match emits ONE
    null-padded row only when the watermark passes the end of its
    match window (left_ts + within) — before that, a match could still
    arrive. Two consequences, both certified per-horizon
    (tests/test_multimodal_streaming.py + the stream_stream_join
    'outer' face): (a) on a finite stream, unmatched left rows whose
    window the FINAL watermark (min over both sides of max event time
    seen − delay) never passes are silently HELD BACK forever — the
    certifiable set is the flushed horizon, not the whole stream;
    (b) correctness of the null-pads requires event-time-ordered
    arrival relative to the watermark delay: if a matching right row
    arrives after the watermark already passed the window, the left
    row has ALREADY emitted a null-pad and the true pair is lost —
    the same silent-loss class as the session-window warning above,
    but here it manufactures a WRONG row, not just a missing one."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how)


def stream_dedup_exact(
    docs_stream: DataFrame,
    ts_col: str = "ingest_ts",
    content_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: md5 content fingerprint +
    dropDuplicatesWithinWatermark. The dedup state is BOUNDED by the
    watermark horizon — an unbounded dropDuplicates would accumulate
    one state row per distinct document forever, which cannot work at
    10^12 docs; within-watermark semantics keep state proportional to
    the ingest rate × horizon instead. Batch analog:
    operators.dedup.drop_exact_duplicates."""
    fp = docs_stream.withColumn("__fp", F.md5(F.col(content_col)))
    return (
        fp.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def stream_ingest_dedup(
    docs_stream: DataFrame,
    index_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    content_col: str = "text",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming ingestion dedup with UNBOUNDED lookback: every
    micro-batch is an ingest epoch against the persisted fingerprint
    index (operators.incremental.ingest_epoch, epoch = batch_id) — the
    complementary design point to stream_dedup_exact above:

      - stream_dedup_exact bounds state by the WATERMARK horizon
        (state-store rows ∝ rate × horizon; dups beyond the horizon
        re-admit). Right when "duplicate" means "within the window".
      - this operator keeps NO streaming state at all: history lives in
        the epoch-partitioned parquet index, so a duplicate of ANY
        previously-accepted doc is rejected forever, state survives
        checkpoint loss, and the lookback cost is the index anti-join
        (partition-pruned to epochs < batch). Right when "duplicate"
        means "ever ingested" — the pre-training corpus case.

    Accepted rows land under ``out_dir/batch_id=N`` (static overwrite —
    a replayed micro-batch after checkpoint recovery rewrites exactly
    its own output and its own index partition, so the pipeline is
    end-to-end idempotent). Returns the started query."""
    from ..operators.incremental import ingest_epoch

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        accepted = ingest_epoch(
            spark, index_dir, batch_df, int(batch_id), id_col, content_col
        )
        accepted.write.mode("overwrite").parquet(f"{out_dir}/batch_id={int(batch_id)}")

    writer = docs_stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_validate(
    docs_stream: DataFrame,
    catalog: DataFrame,
    out_dir: str,
    baseline_hist: DataFrame | None = None,
    baseline_kinds: DataFrame | None = None,
    spec: dict[str, Any] | None = None,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """readStream → foreachBatch validate. Returns the started query.

    Each micro-batch runs the batch constraint operators with
    run_id = f"stream-{batch_id}" and writes verdicts/violations —
    identical semantics to the batch engine, so tests can diff the two.

    Exactly-once sink: foreachBatch may RE-RUN a batch_id after a
    failure, so the writes are dynamic-partition-OVERWRITE keyed by
    (run_id, partition_id) — a replayed batch rewrites its own rows in
    place instead of appending duplicates (same discipline as
    plans/run.py's batch writes).
    """
    from ..operators import constraints as C
    from ..operators.profile import numeric_histogram

    spec = spec or {}
    # section-level merge like plans/run.py — a partial override of one
    # threshold must not KeyError the stream on its first micro-batch
    d = {
        "lo": 0.0, "hi": 60.0, "nbins": 16,
        "ks_threshold": 0.1, "chi2_per_bin_threshold": 10.0,
        **spec.get("distribution_drift", {}),
    }

    def _write_idempotent(df: DataFrame, path: str) -> None:
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            df.write.mode("overwrite").partitionBy("run_id", "partition_id").parquet(path)
        finally:
            if prev is not None:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
            else:
                spark.conf.unset("spark.sql.sources.partitionOverwriteMode")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from ..plans.run import baseline_kind_counts

        run_id = f"stream-{batch_id}"
        # per-batch dup-key cache is released before the batch ends — a
        # long-running stream must not accumulate one dead cache per
        # trigger in the CacheManager
        dups = C.duplicate_keys(batch_df).cache()
        uq_v, uq_viol = C.check_uniqueness(batch_df, run_id, dups=dups)
        ri_v, ri_viol = C.check_referential_integrity(batch_df, catalog, run_id)
        verdicts = uq_v.unionByName(ri_v)
        # drift verdicts are scoped to partitions PRESENT in this
        # micro-batch: the fail-closed full-outer checks would otherwise
        # emit a FAILED row for every baseline partition a trigger
        # happens not to touch, on every trigger (metadata-scale collect)
        batch_parts = None
        if baseline_hist is not None or baseline_kinds is not None:
            batch_parts = [
                int(r.partition_id)
                for r in batch_df.select("partition_id").distinct().collect()
                if r.partition_id is not None
            ]
        if baseline_hist is not None:
            curr = numeric_histogram(
                batch_df.select("partition_id", F.explode("spans.offset").alias("off")),
                "off", d["lo"], d["hi"], d["nbins"], ["partition_id"],
            )
            verdicts = verdicts.unionByName(
                C.check_distribution_drift(
                    baseline_hist, curr, run_id, epoch=batch_id,
                    ks_threshold=d["ks_threshold"],
                    chi2_per_bin_threshold=d["chi2_per_bin_threshold"],
                ).filter(F.col("partition_id").isin(batch_parts))
            )
        if baseline_kinds is not None:
            verdicts = verdicts.unionByName(
                C.check_categorical_drift(
                    baseline_kinds, baseline_kind_counts(batch_df), run_id, epoch=batch_id,
                    chi2_per_category_threshold=spec.get("categorical_drift", {}).get(
                        "chi2_per_category_threshold", 10.0
                    ),
                ).filter(F.col("partition_id").isin(batch_parts))
            )
        try:
            _write_idempotent(verdicts, f"{out_dir}/verdicts")
            _write_idempotent(uq_viol.unionByName(ri_viol), f"{out_dir}/violations")
        finally:
            dups.unpersist()

    writer = docs_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir or f"{out_dir}/_checkpoint"
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
