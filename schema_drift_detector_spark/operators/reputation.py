"""Source/domain-level reputation filtering (RefinedWeb §3.1 /
CCNet-style corpus governance).

Web-scale corpora are filtered at the DOMAIN granularity before the
document granularity: a domain whose documents are consistently
low-quality is dropped wholesale (blocklists, reputation scores). The
reference app has no corpus operators — this is part of the
LLM-training-data surface (SURVEY.md §2C). Here the grouping column is
the corpus's ``source`` (the domain analogue in the test tables).

Decision rule (deterministic, DuckDB-replayable):
  - Per-source evidence: n_docs and the mean of a per-doc score
    (default: `quality_score`), rounded.
  - Sources with fewer than ``min_docs`` docs are ineligible (too
    little evidence) — keep = false, rank NULL, never consume a slot.
  - NULL sources are ineligible (reputation cannot attach to an
    unattributed doc) — keep = false.
  - Eligible sources rank by (mean_score desc, source asc); the top
    ``ceil(keep_frac * n_eligible)`` keep. A RELATIVE rule, not an
    absolute threshold: corpus quality drifts over crawls, the budget
    share should not.

Scale shape (100 TB posture): the corpus aggregates ONCE
(map-side-combinable sum/count, shuffle output = n_sources rows — a
domain table is ~1e7 rows at web scale, trivially a broadcast); the
rank window runs over that tiny relation; the doc-level filter is a
broadcast semi-join, so the corpus itself never shuffles to be
filtered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def source_reputation(
    docs: DataFrame,
    group_col: str = "source",
    score: Column | None = None,
    keep_frac: float = 0.5,
    min_docs: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """Per-source reputation verdicts:
    (group_col, n_docs, mean_score, rep_rank, keep).

    ``score`` is the per-doc quality column expression (default
    `quality_score('text')`); docs whose score is NULL contribute to
    n_docs but not to the mean (avg skips NULLs — no evidence is not
    zero evidence). mean_score is rounded to ``round_digits`` (the
    engine-wide certified-double discipline). rep_rank is NULL for
    ineligible sources (n_docs < min_docs, or NULL source)."""
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    if score is None:
        from ..functions.text import quality_score

        score = quality_score("text")

    agg = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(score), round_digits).alias("mean_score"),
    )
    eligible = F.col(group_col).isNotNull() & (F.col("n_docs") >= min_docs)
    w = Window.partitionBy("__elig").orderBy(
        F.col("mean_score").desc_nulls_last(), F.col(group_col).asc()
    )
    n_elig = Window.partitionBy("__elig")
    return (
        agg.withColumn("__elig", eligible)
        .withColumn(
            "rep_rank",
            F.when(F.col("__elig"), F.row_number().over(w)).cast("int"),
        )
        .withColumn(
            "keep",
            F.col("__elig")
            & (
                F.col("rep_rank")
                <= F.ceil(F.lit(keep_frac) * F.count(F.lit(1)).over(n_elig))
            ),
        )
        .drop("__elig")
    )


def drop_low_reputation_sources(
    docs: DataFrame,
    group_col: str = "source",
    score: Column | None = None,
    keep_frac: float = 0.5,
    min_docs: int = 1,
) -> DataFrame:
    """Docs from kept sources only — the doc-level filter. NULL-source
    docs drop (they never equi-join), matching source_reputation's
    ineligibility contract. The kept-source relation is broadcast, so
    the corpus is filtered without shuffling."""
    rep = source_reputation(
        docs, group_col, score, keep_frac=keep_frac, min_docs=min_docs
    )
    kept = rep.filter(F.col("keep")).select(group_col)
    return docs.join(F.broadcast(kept), group_col, "left_semi")
