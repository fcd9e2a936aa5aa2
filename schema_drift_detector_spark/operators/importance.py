"""DSIR-style importance scoring for training-data selection.

Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) scores every corpus document by how much more likely
its tokens are under a TARGET distribution (the domain you want more
of — certified here over an eval-style sample) than under the corpus
BACKGROUND distribution, both estimated as hashed unigram bucket
frequencies. High-scoring docs are the ones to up-select when mixing a
pretraining corpus toward a target domain.

Semantics (deterministic, DuckDB-replayable):
  - Tokens are the literal single-space split of ``text_col`` (the
    engine-wide portable tokenization; callers pre-normalize case if
    they want case-folded matching).
  - Each token maps to a bucket via the engine's portable hash
    (operators.sampling.hash_bucket — salt ':dsir'): hashed vocabulary
    of ``n_buckets``, the DSIR trick that makes the two "LMs" fixed-
    size regardless of vocabulary.
  - Bucket probabilities are add-alpha smoothed:
    p[b] = (count[b] + alpha) / (total + alpha * n_buckets) — alpha
    keeps buckets unseen on one side finite instead of -inf.
  - A doc's score is sum over its TOKENS (occurrences, not distinct)
    of ln(p_target[b]) - ln(p_background[b]), ROUNDED to
    ``round_digits`` decimals. Rounding absorbs float summation-order
    and libm ULP differences — the same discipline every certified
    double aggregate in this engine uses.
  - Selection is RANK-based, not threshold-based: ``select_top_k``
    keeps the top ``k`` docs per group by (score desc, id asc) — a
    deterministic total order on rounded scores, immune to the
    exp()/boundary ULP hazards a probabilistic acceptance rule has.
    (True DSIR resamples with Gumbel noise; a deterministic engine
    certifies the ranked variant and leaves noise injection to the
    caller via an extra hash column if wanted.)

Scale shape (100 TB posture):
  - Background counts: one corpus scan, explode to (bucket) and count —
    the aggregate result is ``n_buckets`` rows (10^4), trivially
    collected and BROADCAST back as a literal ratio table join.
  - Target counts: the target sample is small by construction (an eval
    set or domain seed); same shape.
  - Scoring: tokens explode → broadcast-join the ratio table → per-doc
    sum. The explode is wide but narrow-schema (id, bucket); the join
    is broadcast so the corpus never shuffles; the per-doc sum is the
    one aggregation, with map-side partial aggregation.
  - select_top_k is one window over (group) — the same single-shuffle
    shape as take_token_budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket

_DSIR_SALT = ":dsir"


def _validate(n_buckets: int, alpha: float) -> None:
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if alpha <= 0.0:
        raise ValueError(
            f"alpha must be > 0 (zero readmits -inf log-ratios for buckets "
            f"unseen on one side), got {alpha}"
        )


def bucket_counts(
    docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Hashed unigram bucket counts over every token occurrence in
    ``text_col``: (bucket, n). Null text contributes nothing. The
    result has at most ``n_buckets`` rows — collectable and
    broadcastable at any corpus size."""
    _validate(n_buckets, 1.0)
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(F.split(F.col(text_col), " ")).alias("__tok"))
        # '' tokens (empty text, runs of spaces) are split artifacts,
        # not evidence — dropping them here also makes token-less docs
        # score NULL in dsir_scores (no occurrence rows) as documented
        .filter(F.col("__tok") != "")
        .select(hash_bucket(F.col("__tok"), n_buckets, _DSIR_SALT).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dsir_scores(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str | None = None,
    n_buckets: int = 10_000,
    alpha: float = 0.5,
    round_digits: int = 5,
) -> DataFrame:
    """Per-document DSIR importance score: ``docs``'s columns plus
    ``dsir_score`` (rounded double; docs whose text is NULL or holds no
    non-empty tokens score NULL — no evidence is not zero evidence;
    '' split artifacts from empty text or space runs are not tokens).

    The log-ratio table ln(p_target[b]) - ln(p_background[b]) is built
    from two bucket-count aggregates and joined back BROADCAST, so the
    corpus-side plan is scan → explode → broadcast join → per-doc sum:
    zero corpus shuffles beyond the final (id)-keyed aggregation."""
    _validate(n_buckets, alpha)
    tcol = target_text_col or text_col

    bg = bucket_counts(docs, text_col, n_buckets)
    tg = bucket_counts(target, tcol, n_buckets)
    # full outer: buckets seen on one side only still need their
    # smoothed ratio; totals are computed over the SAME frame so the
    # denominators see every bucket
    joined = (
        bg.withColumnRenamed("n", "n_bg")
        .join(tg.withColumnRenamed("n", "n_tg"), "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_bg", F.lit(0)).alias("n_bg"),
            F.coalesce("n_tg", F.lit(0)).alias("n_tg"),
        )
    )
    denom_bg = F.sum("n_bg").over(Window.partitionBy()) + F.lit(
        alpha
    ) * F.lit(float(n_buckets))
    denom_tg = F.sum("n_tg").over(Window.partitionBy()) + F.lit(
        alpha
    ) * F.lit(float(n_buckets))
    ratios = joined.select(
        "bucket",
        (
            F.log((F.col("n_tg") + F.lit(alpha)) / denom_tg)
            - F.log((F.col("n_bg") + F.lit(alpha)) / denom_bg)
        ).alias("__lr"),
    )

    occ = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
        )
        .filter(F.col("__tok") != "")  # same '' rule as bucket_counts
        .select(
            id_col,
            hash_bucket(F.col("__tok"), n_buckets, _DSIR_SALT).alias("bucket"),
        )
    )
    scores = (
        occ.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.round(F.sum("__lr"), round_digits).alias("dsir_score"))
    )
    return docs.join(scores, id_col, "left")


def select_top_k(
    df: DataFrame,
    k: int,
    score_col: str = "dsir_score",
    id_col: str = "doc_id",
    group_col: str | None = None,
    flag_col: str | None = None,
) -> DataFrame:
    """Deterministic rank-based selection: keep the ``k`` highest-score
    rows (ties broken by ``id_col`` ascending — a total order), per
    ``group_col`` when given, globally otherwise. NULL scores rank
    LAST (never selected while any scored row remains) — a doc with no
    evidence must not beat a scored one. One window shuffle; the same
    shape as take_token_budget.

    ``flag_col``: instead of filtering, return EVERY row with a boolean
    selection column of that name — the audit form (a selection
    manifest needs the rejected rows too), and the form that avoids a
    self-join when a caller wants both the scores and the decision."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    part = Window.partitionBy(group_col) if group_col else Window.partitionBy()
    w = part.orderBy(F.col(score_col).desc_nulls_last(), F.col(id_col).asc())
    ranked = df.withColumn("__rk", F.row_number().over(w))
    if flag_col is not None:
        return ranked.withColumn(flag_col, F.col("__rk") <= k).drop("__rk")
    return ranked.filter(F.col("__rk") <= k).drop("__rk")
