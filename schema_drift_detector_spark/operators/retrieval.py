"""Lexical top-k retrieval (BM25) over a document corpus.

The text-search counterpart to ``operators/ann.py``: where ANN ranks by
embedding cosine, this ranks by BM25 — the inverted-index scoring
function of Lucene/Elasticsearch (Robertson & Zaragoza 2009, "The
Probabilistic Relevance Framework: BM25 and Beyond"). The reference app
has no search surface (it is a metadata pipeline; see SURVEY.md §2B
"beyond-reference LLM-pipeline operators") — this operator exists for
the training-data side of the engine: retrieval-based corpus QA
("which documents match this probe query"), decontamination triage,
and prompt/eval-set neighborhood inspection.

Scale shape (the 100 TB plan, asserted in tests/test_plans.py):

- The corpus is tokenized ONCE and postings are pruned to the query
  vocabulary BEFORE the (doc, term) aggregation — the one data-scale
  shuffle moves only rows whose term appears in some query (a
  vocab-sized fraction of the corpus token stream), never the full
  posting list.
- Query terms, per-term document frequencies, and the corpus-stats row
  (N, avgdl) are all broadcast — vocab-sized / single-row frames; the
  corpus side never reshuffles for them.
- The final (query, doc) score aggregation and per-query top-k window
  operate on matched candidates only (≤ matched docs × queries), not
  the corpus.
- No ``collect()`` anywhere: corpus statistics join in via a broadcast
  single-row cross join.

Determinism contract (same discipline as ``ann.py``): scores are
rounded to ``score_decimals`` BEFORE ranking and ties break by
ascending doc id, so the returned top-k is a pure function of the
inputs and reproduces bit-identically in the DuckDB oracle replay
(float sums may differ in the last bits across engines; the rounding
absorbs that, exactly as the certified cosine entries do).

NULL/edge contract:
- Docs with NULL text tokenize to NULL and are dropped from scoring
  (they can never match a term); they still count toward N, mirroring
  an index whose docCount includes unparseable docs. Documented rather
  than silent: callers wanting them excluded should filter first.
- Empty-string tokens (doubled separators) are dropped.
- Duplicate terms within one query are collapsed (``array_distinct``)
  — classic BM25 with query term frequency capped at 1; documented.
- A query whose terms match nothing simply returns no rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# BM25 saturation defaults (Robertson & Zaragoza 2009); module-level so
# oracle builders can interpolate the SAME constants the operator uses
DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def _toks(text_col: str) -> Column:
    """THE tokenization rule — one definition shared by corpus_stats
    and bm25_topk so precomputed stats can never use a different
    normalization than scoring."""
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != "")


def _dl(text_col: str) -> Column:
    """Doc length; NULL (not -1) for NULL text on every Spark version
    (3.x legacy sizeOfNull returns -1, which would silently corrupt
    avgdl — guard explicitly rather than rely on ANSI mode)."""
    return F.when(
        F.col(text_col).isNull(), F.lit(None).cast("int")
    ).otherwise(F.size(_toks(text_col)))


def corpus_stats(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Single-row (``__n_docs``, ``__avgdl``) frame for ``bm25_topk``'s
    ``stats`` parameter. An index serves MANY query batches against one
    corpus — computing this once and passing it in saves a full corpus
    scan per ``bm25_topk`` call (the tokenize-for-dl pass; the postings
    scan is per-vocabulary and unavoidable). Tokenization is shared
    with ``bm25_topk`` (one ``_toks`` rule), so stats cannot be built
    under a different normalization than scoring."""
    return docs.select(_dl(text_col).alias("__dl")).agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.avg("__dl").alias("__avgdl"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    score_decimals: int = 6,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents per query under BM25.

    ``docs``: corpus with (``id_col``, ``text_col``) — text is
    whitespace-tokenized (match your indexing normalization upstream;
    this operator does not lowercase).
    ``queries``: SMALL frame with (``query_id_col``, ``terms_col``:
    array<string>) — broadcast; one row per query.

    Returns (query_id, rank, doc_id, score): ``rank`` is 1-based by
    (rounded score desc, doc_id asc); at most ``k`` rows per query.

    idf is the Lucene non-negative form ln(1 + (N - df + .5)/(df + .5));
    tf normalization is the standard k1/b saturation with dl/avgdl.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    ids = F.col(id_col)

    # one corpus scan: doc length (ALL tokens — BM25's dl, computed
    # before vocab pruning) alongside the token array
    tokenized = docs.select(
        ids.alias("__doc"),
        _toks(text_col).alias("__toks"),
        _dl(text_col).alias("__dl"),
    )

    # single-row corpus stats, broadcast back via cross join (no collect);
    # N counts every doc (NULL-text included — see module contract),
    # avgdl averages over docs that actually tokenized. Callers serving
    # many query batches pass a precomputed `stats` (see corpus_stats)
    # to skip this per-call corpus scan.
    if stats is None:
        stats = tokenized.agg(
            F.count(F.lit(1)).alias("__n_docs"),
            F.avg("__dl").alias("__avgdl"),
        )

    # query vocabulary (distinct terms across all queries) — broadcast
    # prune BEFORE the posting aggregation so the one data-scale shuffle
    # carries only query-relevant tokens
    qterms = queries.select(
        F.col(query_id_col).alias("__query"),
        F.explode(F.array_distinct(F.col(terms_col))).alias("__term"),
    )
    vocab = qterms.select("__term").distinct()

    postings = (
        tokenized.filter(F.col("__dl") > 0)
        .select("__doc", "__dl", F.explode("__toks").alias("__term"))
        .join(F.broadcast(vocab), "__term")
    )

    # tf per (doc, term); __dl rides in the grouping key (constant per doc)
    tf = postings.groupBy("__doc", "__term", "__dl").agg(
        F.count(F.lit(1)).alias("__tf")
    )

    # document frequency per term: tf already has one row per (doc, term)
    df_t = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))

    scored = (
        tf.join(F.broadcast(df_t), "__term")
        .join(F.broadcast(stats))
        .join(F.broadcast(qterms), "__term")
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("__n_docs") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    tf_norm = (F.col("__tf") * (k1 + 1)) / (
        F.col("__tf") + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
    )

    per_qd = scored.groupBy("__query", "__doc").agg(
        F.round(F.sum(idf * tf_norm), score_decimals).alias("score")
    )

    w = Window.partitionBy("__query").orderBy(
        F.col("score").desc(), F.col("__doc").asc()
    )
    return (
        per_qd.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__query").alias(query_id_col),
            "rank",
            F.col("__doc").alias(id_col),
            "score",
        )
    )


def distinctive_terms(
    docs: DataFrame,
    group_col: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    score_decimals: int = 6,
) -> DataFrame:
    """Top-``k`` DISTINCTIVE terms per group by TF-IDF — the corpus
    comparison report every mixture pipeline runs ("what is source X
    full of that the rest of the corpus is not"): term frequency is
    the group's token-occurrence count, document frequency is
    corpus-wide (how many DOCS contain the term), and
    ``score = (1 + ln(tf)) * ln((1 + N) / (1 + df))`` — SUBLINEAR tf
    scaling (Manning et al., IR ch. 6): a term in every doc scores ~0
    no matter how frequent (stopwords self-suppress), and raw
    occurrence counts can't buy rank linearly (a corpus-wide word with
    tf in the thousands would otherwise out-score a genuinely
    group-exclusive term — observed on the fixture before pinning
    this). No +1 idf floor on purpose: this ranks DISTINCTIVENESS,
    not relevance, and the floor would re-admit ubiquitous terms.

    Determinism: scores are rounded to ``score_decimals`` BEFORE
    ranking and ties break by ascending term (total order) — the BM25/
    ANN discipline, so the DuckDB replay reproduces the exact top-k.

    NULL contract: NULL-``group_col`` rows are dropped (no
    attribution — the temperature_mix contract); NULL text contributes
    no tokens but the doc still counts toward N (the bm25 docCount
    contract).

    Scale shape: the data-scale shuffles are the (group, term) and
    per-term df partial-aggregated counts. The df table is
    VOCAB-sized — on web-scale text the distinct-token universe is
    10^8-10^9 rows (URLs, typos, numbers), NOT bounded the way
    n_buckets×K model tables are — so it joins back key-aligned on
    ``term`` with NO forced broadcast: AQE picks broadcast when the
    measured side is actually small and falls back to a shuffle join
    when it is not (an explicit hint would bypass
    autoBroadcastJoinThreshold and OOM at 100 TB — r7 verdict).
    N arrives as a broadcast single-row cross join (bounded by
    construction, no collect); the top-k window shuffles only the
    (group, term) counts (vocab x groups rows, not the corpus).
    Output: (group_col, rank, term, tf, df, score).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    grouped = docs.filter(F.col(group_col).isNotNull())
    n = grouped.agg(F.count(F.lit(1)).alias("__n"))
    occ = grouped.select(
        group_col, id_col, F.explode(_toks(text_col)).alias("term")
    )
    tf = occ.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = (
        occ.select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        # NO broadcast hint on the vocab-sized df side (see docstring):
        # the join is key-aligned on `term`; AQE broadcasts iff small
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                (F.lit(1.0) + F.log("tf"))
                * F.log((F.lit(1) + F.col("__n")) / (F.lit(1) + F.col("df"))),
                score_decimals,
            ),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, "rank", "term", "tf", "df", "score")
    )


def distinctive_terms_sql_ctes(
    sfx: str,
    src: str,
    group_expr: str,
    k: int = 10,
    score_decimals: int = 6,
) -> str:
    """DuckDB CTE block replaying ``distinctive_terms`` over the
    relation ``src`` (must expose doc_id, text, and ``group_expr``).
    Emits CTEs prefixed ``sfx``; the final CTE ``{sfx}top`` has
    (grp, rank, term, tf, df, score). ONE definition per oracle (the
    nb_sql_ctes discipline)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    s = sfx
    return f"""{s}g AS MATERIALIZED (
  SELECT doc_id, {group_expr} AS grp, text FROM {src}
  WHERE {group_expr} IS NOT NULL
), {s}occ AS MATERIALIZED (
  SELECT doc_id, grp, unnest(list_filter(string_split(text, ' '),
         t -> t <> '')) AS term
  FROM {s}g WHERE text IS NOT NULL
), {s}tf AS (SELECT grp, term, count(*) AS tf FROM {s}occ GROUP BY 1, 2),
{s}df AS (SELECT term, count(DISTINCT doc_id) AS df FROM {s}occ GROUP BY 1),
{s}n AS (SELECT count(*) AS n FROM {s}g),
{s}sc AS (
  SELECT tf.grp, tf.term, tf.tf, df.df,
         round((1 + ln(tf.tf)) * ln((1 + n.n) * 1.0 / (1 + df.df)), {score_decimals}) AS score
  FROM {s}tf tf JOIN {s}df df USING (term) CROSS JOIN {s}n n
), {s}top AS (
  SELECT grp, rank, term, tf, df, score FROM (
    SELECT grp, term, tf, df, score,
           row_number() OVER (PARTITION BY grp
                              ORDER BY score DESC, term ASC) AS rank
    FROM {s}sc
  ) WHERE rank <= {k}
)"""


def pmi_collocations(
    docs: DataFrame,
    group_col: str,
    *,
    text_col: str = "text",
    k: int = 10,
    min_count: int = 3,
    score_decimals: int = 6,
) -> DataFrame:
    """Top-``k`` adjacent-token COLLOCATIONS per group by pointwise
    mutual information — the other half of the corpus-comparison
    report distinctive_terms gives ("which word PAIRS travel
    together"):

        pmi(x, y) = ln( (n_xy / N_bi) / ((n_x / N_uni) · (n_y / N_uni)) )

    with n_xy the group's adjacent-bigram occurrence count, n_x/n_y
    its unigram occurrence counts, N_bi/N_uni the group totals.
    Bigrams under ``min_count`` occurrences are dropped FIRST (rare
    pairs produce unboundedly high PMI from noise — the classic PMI
    failure mode; Church & Hanks 1990 use exactly this floor).

    Determinism: scores rounded to ``score_decimals`` before ranking,
    ties by bigram string ascending (total order) — the engine-wide
    discipline, so the DuckDB replay reproduces the exact top-k.

    NULL contract: NULL-``group_col`` rows drop (no attribution);
    NULL text contributes nothing.

    Scale shape: TWO data-scale aggregations (the (group, bigram) and
    (group, token) counts, both partial-aggregated). The unigram count
    table is VOCAB-sized — unbounded on web-scale text, NOT bounded
    the way model tables are — so it joins back key-aligned on
    (group, w) with NO forced broadcast: AQE broadcasts iff the
    measured side is small, else a plain shuffle join (a forced hint
    would bypass autoBroadcastJoinThreshold and OOM at 100 TB — r7
    verdict). Only the per-GROUP totals (bounded by the group universe,
    like n_sources) broadcast explicitly; the top-k window shuffles
    only the surviving bigram counts. The
    adjacent-pair fan-out is arrays_zip over two slices — JVM
    expressions, no interpreted lambda in the hot path. Output:
    (group_col, rank, bigram, n_xy, pmi)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    grouped = docs.filter(F.col(group_col).isNotNull())
    toks = grouped.select(group_col, _toks(text_col).alias("__t")).filter(
        F.col("__t").isNotNull()
    )
    n = F.size("__t")
    pairs = (
        toks.filter(n >= 2)
        .select(
            group_col,
            F.explode(
                F.arrays_zip(
                    F.slice("__t", 1, n - 1).alias("w1"),
                    F.slice("__t", 2, n - 1).alias("w2"),
                )
            ).alias("__p"),
        )
        .select(group_col, F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
    )
    bi = pairs.groupBy(group_col, "w1", "w2").agg(F.count(F.lit(1)).alias("n_xy"))
    uni = (
        toks.select(group_col, F.explode("__t").alias("w"))
        .groupBy(group_col, "w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    tot = uni.groupBy(group_col).agg(F.sum("n_w").alias("n_uni"))
    tot_bi = bi.groupBy(group_col).agg(F.sum("n_xy").alias("n_bi"))
    scored = (
        # NO broadcast hints on the vocab-sized unigram sides (see
        # docstring): key-aligned joins; AQE broadcasts iff small
        bi.filter(F.col("n_xy") >= min_count)
        .join(
            uni.select(group_col, F.col("w").alias("w1"), F.col("n_w").alias("n_x")),
            [group_col, "w1"],
        )
        .join(
            uni.select(group_col, F.col("w").alias("w2"), F.col("n_w").alias("n_y")),
            [group_col, "w2"],
        )
        .join(F.broadcast(tot), group_col)
        .join(F.broadcast(tot_bi), group_col)
        .select(
            group_col,
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            "n_xy",
            F.round(
                F.log(
                    (F.col("n_xy") / F.col("n_bi"))
                    / ((F.col("n_x") / F.col("n_uni")) * (F.col("n_y") / F.col("n_uni")))
                ),
                score_decimals,
            ).alias("pmi"),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("pmi").desc(), F.col("bigram").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, "rank", "bigram", "n_xy", "pmi")
    )


def pmi_collocations_sql_ctes(
    sfx: str,
    src: str,
    group_expr: str,
    k: int = 10,
    min_count: int = 3,
    score_decimals: int = 6,
) -> str:
    """DuckDB CTE block replaying ``pmi_collocations`` over ``src``
    (must expose text and ``group_expr``). Final CTE ``{sfx}top``:
    (grp, rank, bigram, n_xy, pmi). One definition per oracle (the
    nb_sql_ctes discipline)."""
    if k < 1 or min_count < 1:
        raise ValueError(f"k and min_count must be >= 1, got {k}, {min_count}")
    s = sfx
    return f"""{s}lf AS MATERIALIZED (
  SELECT {group_expr} AS grp,
         list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM {src} WHERE {group_expr} IS NOT NULL AND text IS NOT NULL
), {s}pr AS MATERIALIZED (
  SELECT grp, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT grp, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM {s}lf WHERE len(t) >= 2)
), {s}un AS MATERIALIZED (
  SELECT grp, unnest(t) AS w FROM {s}lf
), {s}bi AS (SELECT grp, w1, w2, count(*) AS n_xy FROM {s}pr GROUP BY 1, 2, 3),
{s}uc AS (SELECT grp, w, count(*) AS n_w FROM {s}un GROUP BY 1, 2),
{s}tu AS (SELECT grp, count(*) AS n_uni FROM {s}un GROUP BY 1),
{s}tb AS (SELECT grp, count(*) AS n_bi FROM {s}pr GROUP BY 1),
{s}sc AS (
  SELECT b.grp, b.w1 || ' ' || b.w2 AS bigram, b.n_xy,
         round(ln((CAST(b.n_xy AS DOUBLE) / tb.n_bi)
                  / ((CAST(x.n_w AS DOUBLE) / tu.n_uni)
                     * (CAST(y.n_w AS DOUBLE) / tu.n_uni))),
               {score_decimals}) AS pmi
  FROM {s}bi b
  JOIN {s}uc x ON x.grp = b.grp AND x.w = b.w1
  JOIN {s}uc y ON y.grp = b.grp AND y.w = b.w2
  JOIN {s}tu tu ON tu.grp = b.grp
  JOIN {s}tb tb ON tb.grp = b.grp
  WHERE b.n_xy >= {min_count}
), {s}top AS (
  SELECT grp, rank, bigram, n_xy, pmi FROM (
    SELECT grp, bigram, n_xy, pmi,
           row_number() OVER (PARTITION BY grp
                              ORDER BY pmi DESC, bigram ASC) AS rank
    FROM {s}sc
  ) WHERE rank <= {k}
)"""
