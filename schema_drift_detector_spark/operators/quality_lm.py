"""CCNet-style n-gram language-model perplexity scoring.

CCNet (Wenzek et al. 2020, arXiv:1911.00359) filters web text by the
perplexity of a language model trained on a trusted corpus, then carves
the corpus into head / middle / tail tiers by perplexity thirds. The
real pipeline uses a KenLM 5-gram model; this operator implements the
same decision with a **bigram stupid-backoff LM over a hashed
vocabulary** (Brants et al. 2007 "Large Language Models in Machine
Translation" — stupid backoff was designed exactly for distributed
count-based LMs), which is deterministic and exactly replayable in
ANSI SQL. A caller with a real KenLM can feed its scores through
``ppl_tiers`` unchanged.

Semantics (deterministic, DuckDB-certifiable):
  - Tokens are the non-empty single-space split of ``text_col`` (the
    engine-wide portable tokenization; '' split artifacts are not
    tokens).
  - Each token hashes to one of ``n_buckets`` buckets via the portable
    60-bit md5 hash (operators.sampling.hash_bucket, salt ':lm') — the
    DSIR trick that keeps the model fixed-size at any vocabulary.
  - Model counts come from ``train``: unigram bucket counts c(b) over
    every token occurrence, bigram counts c(b1,b2) over every adjacent
    pair.
  - Position scores (stupid backoff):
      first token       p = p_uni(b)            (no left context)
      seen bigram       p = c(b1,b2) / c(b1)    (c(b1) >= 1 whenever
                                                 the pair was seen)
      unseen bigram     p = backoff * p_uni(b2)
    with p_uni(b) = (c(b) + alpha) / (N + alpha * n_buckets) — add-alpha
    smoothing keeps never-seen buckets finite. Stupid backoff is a
    SCORE, not a normalized probability — by design (ibid. §4).
  - A document's ``avg_nll`` is -mean(ln p) over its positions, ROUNDED
    to ``round_digits`` (absorbs cross-engine summation-order ULP — the
    engine-wide certified-double discipline). exp(avg_nll) would be the
    perplexity; the log form is emitted because it is the one the
    rounding contract protects.
  - Docs with NULL text or zero non-empty tokens score NULL (no
    evidence is not zero evidence — same contract as dsir_scores).

Scale shape (100 TB posture):
  - Unigram table: <= n_buckets rows — always broadcast (joined twice:
    left-context count c(b1) and smoothed p_uni(b2); the full
    [0, n_buckets) domain is materialized from ``spark.range`` so the
    total N rides each row and unseen buckets still join).
  - Bigram table: at most the observed distinct pairs (bounded by
    n_buckets^2, Zipf-concentrated in practice). ``broadcast_model=True``
    (default) broadcasts it; flip to False when the trained table
    outgrows executor memory — the join then shuffles only the narrow
    (id, b1, b2) occurrence rows and AQE picks the strategy.
  - Scoring: one corpus scan -> pair explode (array-side, zero
    pre-aggregation shuffle) -> (broadcast) joins -> one per-doc
    aggregation. The only unavoidable wide exchange is that final
    (id)-keyed mean — the same single-shuffle shape as dsir_scores.
  - ``ppl_tiers`` exact form is a GLOBAL ntile window (single-reducer
    sort): certification-exact but not a 10^12-row plan. At scale pass
    ``thresholds=(lo, hi)`` (e.g. from ``approx_percentile(avg_nll,
    array(1/3, 2/3))``) — a pure whole-stage-codegen CASE, zero
    shuffles; the tiers then follow the thresholds contract instead of
    exact thirds.

Reference parity note: the reference app has no LM scoring — this is
part of the LLM-training-data operator surface the north rule adds on
top of schema-drift parity (SURVEY.md §2C).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket

_LM_SALT = ":lm"


def _validate(n_buckets: int, alpha: float, backoff: float) -> None:
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if alpha <= 0.0:
        raise ValueError(
            f"alpha must be > 0 (zero re-admits ln(0) = -inf for buckets "
            f"never seen in train), got {alpha}"
        )
    if not (0.0 < backoff <= 1.0):
        raise ValueError(f"backoff must be in (0, 1], got {backoff}")


def lm_ppl_sql_ctes(
    sfx: str,
    src: str,
    n_buckets: int = 4096,
    train_pred: str | None = None,
    alpha: float = 0.5,
    backoff: float = 0.4,
    round_digits: int = 5,
) -> str:
    """DuckDB CTE block replaying ``lm_perplexity`` + exact-thirds
    ``ppl_tiers`` over the relation ``src`` (must expose doc_id, text).
    ONE definition feeds both the standalone certification face and any
    composed-pipeline oracle (the _intra_strip_ctes discipline), so the
    replays cannot desynchronize. Emits CTEs prefixed ``sfx``; the
    final CTE ``{sfx}tier`` has one row per src doc:
    (doc_id, avg_nll, n_scored, n_backoff, ppl_tier), NULLs for
    unscored docs. ``train_pred`` filters the trusted counting subset
    (over {sfx}occ rows; default = the ':lmT' 10% doc_id hash).
    Position pairing happens over the FILTERED token list (adjacency is
    post-empty-removal, mirroring pair_occurrences); integer '/' is
    float division in DuckDB (n12 / c matches Spark's bigint/bigint ->
    double); sum(int) is HUGEINT -> CAST. occ/tocc are MATERIALIZED:
    each is referenced more than once, and DuckDB re-inlines
    non-materialized CTEs per reference — over a deep upstream
    pipeline that re-runs the whole chain."""
    _validate(n_buckets, alpha, backoff)
    from .sampling import hash_bucket_sql

    if train_pred is None:
        train_pred = (
            f"{hash_bucket_sql('CAST(doc_id AS VARCHAR)', salt=':lmT')} < 100000"
        )
    s = sfx
    puni = (
        f"(coalesce(u2.c, 0) + {alpha!r}) / ({s}ttot.n + {alpha * n_buckets!r})"
    )
    return f"""{s}lf AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
  FROM {src} WHERE text IS NOT NULL
), {s}pos AS (
  SELECT doc_id,
         CASE WHEN i = 1 THEN NULL ELSE ts[i - 1] END AS w1,
         ts[i] AS w2
  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i
        FROM {s}lf WHERE len(ts) >= 1)
), {s}occ AS MATERIALIZED (
  SELECT doc_id, {hash_bucket_sql("w1", n_buckets, _LM_SALT)} AS b1,
         {hash_bucket_sql("w2", n_buckets, _LM_SALT)} AS b2
  FROM {s}pos
), {s}tocc AS MATERIALIZED (
  SELECT * FROM {s}occ WHERE {train_pred}
), {s}uni AS (SELECT b2 AS b, count(*) AS c FROM {s}tocc GROUP BY 1),
{s}ttot AS (SELECT count(*) AS n FROM {s}tocc),
{s}big AS (SELECT b1, b2, count(*) AS n12 FROM {s}tocc
           WHERE b1 IS NOT NULL GROUP BY 1, 2),
{s}lns AS (
  SELECT o.doc_id,
         CASE WHEN o.b1 IS NULL THEN ln({puni})
              WHEN g.n12 IS NOT NULL THEN ln(g.n12 / u1.c)
              ELSE ln({backoff!r} * ({puni}))
         END AS l,
         CASE WHEN o.b1 IS NOT NULL AND g.n12 IS NULL THEN 1 ELSE 0 END AS bo
  FROM {s}occ o
  LEFT JOIN {s}big g ON g.b1 = o.b1 AND g.b2 = o.b2
  LEFT JOIN {s}uni u1 ON u1.b = o.b1
  LEFT JOIN {s}uni u2 ON u2.b = o.b2
  CROSS JOIN {s}ttot
), {s}sc AS MATERIALIZED (
  SELECT doc_id, round(-avg(l), {round_digits}) AS avg_nll,
         count(*) AS n_scored, CAST(sum(bo) AS BIGINT) AS n_backoff
  FROM {s}lns GROUP BY 1
), {s}tn AS (
  SELECT doc_id, ntile(3) OVER (ORDER BY avg_nll ASC, doc_id ASC) AS t
  FROM {s}sc
), {s}tier AS (
  SELECT s.doc_id, sc.avg_nll, sc.n_scored, sc.n_backoff,
         -- no ELSE: an unscored doc's NULL tn.t must yield a NULL
         -- tier, not fall through to 'tail'
         CASE tn.t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                   WHEN 3 THEN 'tail' END AS ppl_tier
  FROM (SELECT doc_id FROM {src}) s
  LEFT JOIN {s}sc sc USING (doc_id)
  LEFT JOIN {s}tn tn USING (doc_id)
)"""


def pair_occurrences(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    out_id: str = "__id",
) -> DataFrame:
    """(id, b1, b2) bucket rows, one per token POSITION of every doc:
    b2 is the token's bucket, b1 the previous token's (NULL at position
    one — so b2 alone enumerates every token occurrence, and the
    b1-NOT-NULL subset enumerates every adjacent pair). Pairing happens
    array-side (indexed ``transform``) before the explode: zero
    shuffles, and docs with no non-empty tokens vanish (they must score
    NULL, not 0)."""
    toks = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias(out_id),
            F.filter(
                F.split(F.col(text_col), " "), lambda t: t != ""
            ).alias("__ts"),
        )
        .filter(F.size("__ts") >= 1)
    )
    # hash each token ONCE into its bucket array, THEN pair by index —
    # the (w1, w2) string-struct form hashed every token twice (once as
    # w2 at position i, once as w1 at i+1), i.e. 2× the md5 work of the
    # scan for identical bucket values (r8 measurement; guide §1.2
    # "per-task work"). arr[i] is 0-based in Spark SQL; i = 0 has no
    # left context.
    bucketed = toks.select(
        out_id,
        F.transform(
            F.col("__ts"), lambda t: hash_bucket(t, n_buckets, _LM_SALT)
        ).alias("__bs"),
    )
    pairs = F.expr(
        "transform(__bs, (b, i) -> struct("
        "  CASE WHEN i = 0 THEN CAST(NULL AS BIGINT) ELSE __bs[i - 1] END AS b1,"
        "  b AS b2))"
    )
    return bucketed.select(out_id, F.explode(pairs).alias("__p")).select(
        out_id, F.col("__p.b1").alias("b1"), F.col("__p.b2").alias("b2")
    )


def lm_perplexity(
    docs: DataFrame,
    train: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_text_col: str | None = None,
    n_buckets: int = 4096,
    alpha: float = 0.5,
    backoff: float = 0.4,
    round_digits: int = 5,
    broadcast_model: bool = True,
) -> DataFrame:
    """``docs``'s columns plus three scoring columns:

      avg_nll    -mean(ln p) over the doc's token positions, rounded
                 (NULL when the doc has no non-empty tokens)
      n_scored   number of positions scored (= token count)
      n_backoff  positions that took the unseen-bigram backoff branch —
                 the model-coverage diagnostic (0 when ``train`` covers
                 every adjacent pair, e.g. train ⊇ docs)

    ``train`` is the trusted corpus the LM is counted from (CCNet's
    "clean" side); it only needs the text column (``train_text_col``,
    defaulting to ``text_col``) — ids are never read from it. Output
    collides loudly rather than silently overwriting (or dropping)
    pre-existing columns of the same names."""
    _validate(n_buckets, alpha, backoff)
    for c in ("avg_nll", "n_scored", "n_backoff", "__id"):
        if c in docs.columns:
            raise ValueError(
                f"docs already carries a '{c}' column — rename it or drop "
                f"it before scoring (silent overwrite/drop would corrupt "
                f"the caller's frame)"
            )
    sess = docs.sparkSession

    # train ids are never used (only bucket counts survive), so train
    # does NOT need the docs id column — a bare trusted text frame works
    t_occ = pair_occurrences(
        train.select(
            F.lit(0).alias("__lm_tid"),
            F.col(train_text_col or text_col).alias("__lm_txt"),
        ),
        "__lm_tid",
        "__lm_txt",
        n_buckets,
        out_id="__tid",
    )
    # ONE pass over train: the (b1, b2) pair counts (b1 NULL at first
    # positions) are the finest grain — bigram counts are the b1-NOT-NULL
    # subset and unigram counts fold out as sum(n12) per b2, since every
    # position appears exactly once as a b2
    pc = t_occ.groupBy("b1", "b2").agg(F.count(F.lit(1)).alias("n12"))
    # full [0, n_buckets) domain so (a) the total N rides every row and
    # (b) buckets unseen in train still join with c = 0 at score time
    uni = pc.groupBy(F.col("b2").alias("bucket")).agg(
        F.sum("n12").alias("n")
    )
    dom = sess.range(n_buckets).select(F.col("id").alias("bucket"))
    # total column must NOT be named "N": Spark resolves column names
    # case-insensitively by default, so withColumn("N", ...) would
    # silently REPLACE "n" and every per-bucket count becomes the total
    uni_full = (
        dom.join(uni, "bucket", "left")
        .select("bucket", F.coalesce("n", F.lit(0)).alias("n"))
        .withColumn("n_total", F.sum("n").over(Window.partitionBy()))
    )
    big = pc.filter(F.col("b1").isNotNull())

    occ = pair_occurrences(docs, id_col, text_col, n_buckets, out_id="__id")
    big_j = F.broadcast(big) if broadcast_model else big
    u1 = F.broadcast(
        uni_full.select(F.col("bucket").alias("b1"), F.col("n").alias("c1"))
    )
    u2 = F.broadcast(
        uni_full.select(F.col("bucket").alias("b2"), F.col("n").alias("c2"), "n_total")
    )

    denom = F.col("n_total") + F.lit(alpha * n_buckets)
    p_uni = (F.col("c2") + F.lit(alpha)) / denom
    lns = (
        F.when(F.col("b1").isNull(), F.log(p_uni))
        .when(F.col("n12").isNotNull(), F.log(F.col("n12") / F.col("c1")))
        .otherwise(F.log(F.lit(backoff) * p_uni))
    )
    scored_pos = (
        occ.join(big_j, ["b1", "b2"], "left")
        .join(u1, "b1", "left")  # c1 unused on the b1-NULL branch
        .join(u2, "b2")  # b2 always in [0, n_buckets): inner is total
        .select(
            "__id",
            lns.alias("__lns"),
            F.when(F.col("b1").isNotNull() & F.col("n12").isNull(), 1)
            .otherwise(0)
            .alias("__bo"),
        )
    )
    per_doc = scored_pos.groupBy("__id").agg(
        F.round(-F.avg("__lns"), round_digits).alias("avg_nll"),
        F.count(F.lit(1)).alias("n_scored"),
        F.sum("__bo").cast("bigint").alias("n_backoff"),
    )
    return docs.join(
        per_doc, docs[id_col] == per_doc["__id"], "left"
    ).drop("__id")


def ppl_tiers(
    scored: DataFrame,
    score_col: str = "avg_nll",
    id_col: str = "doc_id",
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    thresholds: tuple[float, ...] | None = None,
    tier_col: str = "ppl_tier",
) -> DataFrame:
    """CCNet tiering: label every SCORED row with its perplexity tier
    (lowest avg_nll = most in-domain = ``labels[0]``); NULL-score rows
    get a NULL tier (they were never scored, they have no tier).

    Exact form (``thresholds=None``): ntile(len(labels)) over the total
    order (score asc, id asc) — exact thirds, single-reducer global
    sort, certification-scale only.

    Scale form: ``thresholds`` = len(labels)-1 ascending cutoffs (e.g.
    from approx_percentile) — tier = first label whose cutoff the score
    does not exceed. Pure codegen CASE, zero shuffles: the 10^12-row
    plan."""
    if len(labels) < 2:
        raise ValueError(f"need >= 2 tier labels, got {labels!r}")
    for c in (tier_col, "__tid"):
        if c in scored.columns:
            raise ValueError(f"scored already carries a '{c}' column")
    if thresholds is not None:
        if len(thresholds) != len(labels) - 1:
            raise ValueError(
                f"{len(labels)} labels need {len(labels) - 1} thresholds, "
                f"got {len(thresholds)}"
            )
        # STRICTLY ascending: approx_percentile over heavily-tied scores
        # can return equal cutoffs, which would silently shadow the
        # middle tier (head's <= wins every row the middle WHEN claims)
        if any(a >= b for a, b in zip(thresholds, thresholds[1:])):
            raise ValueError(
                f"thresholds must be strictly ascending (equal adjacent "
                f"cutoffs make a tier unreachable), got {thresholds}"
            )
        tier: Column = F.lit(labels[-1])
        for lab, cut in zip(reversed(labels[:-1]), reversed(thresholds)):
            tier = F.when(F.col(score_col) <= F.lit(cut), F.lit(lab)).otherwise(
                tier
            )
        return scored.withColumn(
            tier_col,
            F.when(F.col(score_col).isNull(), F.lit(None).cast("string")).otherwise(
                tier
            ),
        )
    w = Window.orderBy(F.col(score_col).asc(), F.col(id_col).asc())
    tiered = (
        scored.filter(F.col(score_col).isNotNull())
        .select(F.col(id_col).alias("__tid"), F.ntile(len(labels)).over(w).alias("__tn"))
        .select(
            "__tid",
            F.element_at(
                F.array(*[F.lit(l) for l in labels]), F.col("__tn")
            ).alias(tier_col),
        )
    )
    return scored.join(
        tiered, scored[id_col] == tiered["__tid"], "left"
    ).drop("__tid")
