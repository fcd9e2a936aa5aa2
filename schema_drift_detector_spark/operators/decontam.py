"""Benchmark decontamination: drop corpus documents that share word
n-grams with a held-out evaluation set.

The standard pre-training hygiene pass (the 8-13-gram overlap rule used
since GPT-2/GPT-3-era data work): a training document that contains any
normalized word n-gram of an eval benchmark is "contaminated" — keeping
it inflates benchmark scores without improving the model. The reference
engine has no analogue; this is one of the LLM-data-pipeline operators
the graft adds as first-class (r4 verdict #5).

Scale shape (the part that must survive 100 TB):
  - The EVAL side is tiny by construction (benchmarks are 10^3-10^6
    items) — its distinct gram-hash set is built once and BROADCAST.
  - The CORPUS side is one scan: explode normalized gram hashes
    (narrow, no shuffle), broadcast-inner-join against the eval grams,
    and aggregate hits by doc id. Only HIT rows reach the aggregation,
    so the one shuffle is bounded by the contamination volume, not the
    corpus. The final drop is a broadcast anti-join on the (small) hit
    id set — the corpus itself is never shuffled or replicated.
  - Grams travel as the engine's 64-bit gram hash (8 bytes each,
    DuckDB-reproducible: functions.text.gram_hash64_py — a uint64
    polynomial fold of per-token portable-hash60 values), not as
    strings — a 10^6-gram eval set broadcasts at ~8 MB. A 64-bit
    collision (~1e-7 at 10^6 grams vs 2^64) can only OVER-flag a clean
    doc, never leak a contaminated one; acceptable for a hygiene
    filter, and what makes the operator certifiable cross-engine.

Normalization: lowercase, split on non-alphanumeric runs, drop empties
— punctuation/casing differences between the benchmark dump and the
crawled copy must not hide an overlap. Documents with fewer than ``n``
tokens yield no grams and are never flagged.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_tokens_normalized(text: Column | str) -> Column:
    """Lowercased alphanumeric word tokens (the decontamination unit —
    NOT the whitespace tokens of token_count, which preserve case and
    punctuation for quality metrics)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"[^a-z0-9]+"), lambda t: t != "")


def word_ngram_hashes(text: Column | str, n: int) -> Column:
    """Sorted distinct gram_hash64 values of the normalized word
    n-grams of ``text``. Tokenization (lower + regex split) stays in
    whole-stage codegen; the gram pass runs as ONE Arrow pandas_udf per
    batch whose body is fully vectorized (functions.text.
    gram_hashes64_batch): md5 once per DISTINCT token via pd.factorize,
    then one flat uint64 polynomial fold — the pre-r6 md5-per-gram loop
    measured ~4.7× slower, and the pure-expression form ~6× slower
    again (same lesson as winnowing_fingerprint_arrow). Hash identity:
    functions.text.gram_hash64_py, DuckDB-replayable via
    gram_hash64_sql."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from pyspark.sql.functions import pandas_udf

    from ..functions.text import gram_hashes64_batch

    @pandas_udf("array<long>")
    def _grams(tok_lists: pd.Series) -> pd.Series:
        return pd.Series(gram_hashes64_batch(list(tok_lists), n))

    return _grams(word_tokens_normalized(text))


def eval_gram_hashes(eval_df: DataFrame, text_col: str = "text", n: int = 8) -> DataFrame:
    """The eval side's distinct gram-hash set: one column ``gram_hash``.
    Metadata-scale output (distinct grams of a benchmark), safe to
    broadcast."""
    return (
        eval_df.select(
            F.explode(word_ngram_hashes(text_col, n)).alias("gram_hash")
        )
        .distinct()
    )


def contamination_hits(
    corpus: DataFrame,
    eval_grams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document contamination evidence: (id_col, n_hit_grams) for
    every corpus doc sharing >= 1 normalized word n-gram with the eval
    set; n_hit_grams counts the DISTINCT shared grams (each doc's grams
    are already distinct). Clean docs do not appear.

    Plan: corpus-side explode (narrow) → broadcast hash join against
    the eval gram set → hash aggregation keyed by doc id over HIT rows
    only. The corpus is scanned once and never shuffled."""
    grams = corpus.select(
        F.col(id_col), F.explode(word_ngram_hashes(text_col, n)).alias("gram_hash")
    )
    return (
        grams.join(F.broadcast(eval_grams), "gram_hash", "inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean_corpus, hits): the corpus minus every doc that
    shares an ``n``-gram with ``eval_df``, plus the per-doc evidence
    frame (contamination_hits). The drop is a broadcast LEFT ANTI join
    on the hit id set — contaminated ids are a small fraction by
    assumption; if a corpus is so contaminated the hit set cannot
    broadcast, the right move is investigating the eval leak, not a
    bigger join."""
    hits = contamination_hits(corpus, eval_gram_hashes(eval_df, eval_text_col, n), id_col, text_col, n)
    clean = corpus.join(F.broadcast(hits.select(id_col)), id_col, "left_anti")
    return clean, hits
