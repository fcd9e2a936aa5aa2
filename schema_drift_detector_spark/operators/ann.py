"""Approximate-nearest-neighbor search over embedding columns.

Two tiers (north-star "similarity search" requirement):

  brute-force top-k   exact baseline: broadcast the (small) query set
                      against the corpus, cosine via one Arrow-batched
                      numpy matmul per partition batch, per-query top-k
                      via window. One pass over the corpus, no shuffle
                      of the corpus itself.

  IVF top-k           scale path: coarse-quantize the corpus to
                      n_centroids cells (deterministic centroid sample +
                      argmax-cosine assignment — one corpus pass);
                      queries probe only nprobe cells, so the inner
                      scan is |corpus| * nprobe / n_centroids. The cell
                      assignment is persisted ("index") and reused
                      across query batches.

Scoring uses functions.similarity.cosine_arrow (vectorized numpy over
Arrow batches): Catalyst's higher-order array expressions are not
whole-stage-codegen'd and floor at ~100µs per 64-dim dot; the Arrow
path is the 100-TB-posture hot loop.

Top-k ties break deterministically on (score desc, corpus id asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import cosine_arrow


def topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k: corpus ⨯ broadcast(queries) → window rank.
    Output: query_id, rank, vec_id, cos_sim (rounded 6dp)."""
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    q = queries.select(
        F.col(query_id_col or id_col).alias("query_id"),
        F.col(query_vec_col or vec_col).alias("qvec"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine_arrow(F.col("vec"), F.col("qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos_sim")
    )


def deterministic_centroids(
    corpus: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic pseudo-random centroid pick (k-means-free coarse
    quantizer: reproducible across runs/parallelism, good enough for
    cell routing; swap in k-means centroids without touching callers).

    Selection rule: the n_centroids corpus rows with the smallest
    (md5(cast(id as string)), id) — a uniform deterministic sample.
    orderBy+limit plans as TakeOrderedAndProject: each scan task keeps
    its local top-k and the driver merges k·tasks rows, so there is no
    global sort / single-task window over the corpus and no extra
    count() pass (both were scale-killers at 10^9+ vectors). The
    row_number that assigns centroid_id runs over the already-reduced
    k-row set only. md5-on-string is chosen over xxhash64 because the
    DuckDB oracle can reproduce it bit-for-bit.

    Output: centroid_id, centroid_vec (raw — cosine is scale-invariant)."""
    hash_key = F.md5(F.col(id_col).cast("string"))
    picked = (
        corpus.select(
            hash_key.alias("__hk"),
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("vec"),
        )
        .orderBy(F.col("__hk").asc(), F.col("__id").asc())
        .limit(n_centroids)
    )
    w = Window.orderBy(F.col("__hk").asc(), F.col("__id").asc())  # over k rows only
    return picked.select(
        (F.row_number().over(w) - 1).alias("centroid_id"),
        F.col("vec").alias("centroid_vec"),
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SPHERICAL k-means trainer, Lloyd iterations in DataFrame ops:
    assign (broadcast centroids, max_by cosine) → per-dimension mean of
    the UNIT-normalized members (posexplode + groupBy(cell, dim)) →
    renormalize the mean. Centroids are collected to the driver between
    iterations (k×dim floats — metadata-scale) to break iterative
    lineage; the corpus itself never leaves the executors.
    Deterministic: md5-sample init + lowest-cell-wins tie-break."""
    import math

    from ..functions.similarity import normalize

    sess = corpus.sparkSession
    # nv (unit vectors) is what spherical k-means averages — a single
    # huge-magnitude member must not dominate its cell's direction
    v = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        normalize(vec_col).alias("nv"),
    ).cache()
    cents = deterministic_centroids(corpus, k, id_col, vec_col)
    for _ in range(iters):
        assigned = (
            v.crossJoin(F.broadcast(cents))
            .withColumn("sim", cosine_arrow(F.col("vec"), F.col("centroid_vec")))
            .groupBy("vec_id")
            .agg(
                F.max_by(
                    F.struct(F.col("centroid_id"), F.col("nv")),
                    F.struct(F.col("sim"), -F.col("centroid_id")),
                ).alias("best")
            )
            .select(F.col("best.centroid_id").alias("centroid_id"), F.col("best.nv").alias("nv"))
        )
        means = (
            assigned.select("centroid_id", F.posexplode("nv").alias("dim", "val"))
            .groupBy("centroid_id", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("dim"), F.col("m")))),
                    lambda s: s["m"],
                ).alias("mean_vec")
            )
        )
        rows = means.collect()  # k rows — breaks lineage between iterations
        def _unit(xs):
            n = math.sqrt(sum(x * x for x in xs))
            return [x / n for x in xs] if n > 0 else list(xs)
        cents = sess.createDataFrame(
            [(int(r.centroid_id), _unit(list(r.mean_vec))) for r in rows],
            "centroid_id int, centroid_vec array<double>",
        )
    return cents


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF index build: argmax-cosine cell per corpus vector — one
    corpus pass against broadcast centroids; the argmax is a max_by
    aggregation (map-side combinable), not a window.
    Output: vec_id, centroid_id, vec."""
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    scored = c.crossJoin(F.broadcast(centroids)).withColumn(
        "sim", cosine_arrow(F.col("vec"), F.col("centroid_vec"))
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct(F.col("centroid_id"), F.col("vec")),
                F.struct(F.col("sim"), -F.col("centroid_id")),
            ).alias("best")
        )
        .select("vec_id", F.col("best.centroid_id").alias("centroid_id"), F.col("best.vec").alias("vec"))
    )


def topk_ivf(
    index: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe nearest cells per query; exact cosine within.
    Output: query_id, rank, vec_id, cos_sim."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qvec")
    )
    qc = q.crossJoin(F.broadcast(centroids)).withColumn(
        "sim", cosine_arrow(F.col("qvec"), F.col("centroid_vec"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("centroid_id").asc())
    probes = (
        qc.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "qvec", "centroid_id")
    )
    scored = probes.join(index, "centroid_id").select(
        "query_id",
        "vec_id",
        F.round(cosine_arrow(F.col("qvec"), F.col("vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos_sim")
    )
