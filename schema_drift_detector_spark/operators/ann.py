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
    """SPHERICAL k-means trainer. Each Lloyd iteration is ONE corpus
    pass: a mapInPandas stage fuses assignment (numpy matmul against
    the broadcast centroid matrix, argmax-cosine) with the per-cell
    partial sums, so the only shuffle is the ≤ tasks×k partial rows
    (centroid_id, psum, pcount) into the per-cell merge — the corpus
    rows themselves NEVER shuffle. (The previous formulation exploded
    vectors to (cell, dim) rows and shuffled N×dim rows per iteration:
    ~10^12 shuffle rows/iter at 10^9 × 768-dim. This one shuffles
    tasks×k rows ≈ 10^8 at 10^5 tasks × 10^3 cells.)

    Centroids move driver→executors as a Spark broadcast and come back
    as k×dim floats per iteration (metadata-scale), which also breaks
    iterative lineage. Deterministic given a fixed input partitioning:
    md5-sample init + first-max (lowest-cell) argmax tie-break; mean
    aggregation is FP-order-dependent across partitions, same as any
    distributed average."""
    import numpy as np

    from ..functions.similarity import normalize

    sess = corpus.sparkSession
    # nv (unit vectors) is what spherical k-means averages — a single
    # huge-magnitude member must not dominate its cell's direction.
    # Cached because every iteration rescans it (iters× otherwise).
    # size > 0: an EMPTY array normalizes to an empty array (not null)
    # and would crash the Lloyd fold's matrix build with an
    # inhomogeneous-shape error; the oracle replay's inner_product > 0
    # guard already excludes empties, so this also preserves parity
    v = (
        corpus.select(normalize(vec_col).alias("nv"))
        .filter(F.col("nv").isNotNull() & (F.size("nv") > 0))
        .persist()
    )
    # init sampling sees only fully-finite, nonzero vectors — picking a
    # vector with a null/NaN element would silently shrink k (the pick
    # gets sanitized away below) even though k valid vectors exist, and
    # a zero-norm (or empty) vector would become a dead unnormalizable
    # centroid the Lloyd loop itself excludes from every sum (its nv is
    # NaN) — init must not admit what the trainer will discard
    clean = corpus.filter(
        ~F.exists(F.col(vec_col), lambda x: x.isNull() | F.isnan(x))
    ).filter(
        F.aggregate(
            F.col(vec_col).cast("array<double>"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
        > 0
    )
    init = deterministic_centroids(clean, k, id_col, vec_col).collect()
    if not init:
        raise ValueError("no finite vectors available to initialize centroids")
    init.sort(key=lambda r: r.centroid_id)
    # rows come from `clean`, so every element is finite by construction
    cents_np = np.asarray([r.centroid_vec for r in init], dtype=np.float64)
    cent_ids = [int(r.centroid_id) for r in init]
    # unit-normalize so dot(nv, centroid) IS the cosine
    nrm = np.linalg.norm(cents_np, axis=1, keepdims=True)
    cents_np = np.where(nrm > 0, cents_np / np.where(nrm == 0, 1.0, nrm), cents_np)

    merge_schema = "centroid_id int, centroid_vec array<double>"
    try:
        for _ in range(iters):
            bc = sess.sparkContext.broadcast(cents_np)
            try:
                rows = _lloyd_iteration(v, bc, cent_ids).collect()  # k rows
            finally:
                # one leaked k×dim broadcast per iteration would outlive
                # the trainer for the whole application otherwise
                bc.destroy()
            rows.sort(key=lambda r: r.centroid_id)
            cent_ids = [int(r.centroid_id) for r in rows]  # empty cells collapse
            cents_np = np.asarray([r.centroid_vec for r in rows], dtype=np.float64)
    finally:
        v.unpersist()
    return sess.createDataFrame(
        [(cid, vec.tolist()) for cid, vec in zip(cent_ids, cents_np)], merge_schema
    )


def _lloyd_iteration(v: DataFrame, cents, cent_ids: list[int]) -> DataFrame:
    """One Lloyd step as a lazy frame (exposed for plan-shape tests):
    fused assign+partial-sum mapInPandas over unit vectors ``v(nv)``,
    then a per-cell applyInPandas merge. The ONLY Exchange in this plan
    hashes the ≤ tasks×k partial rows on centroid_id.

    ``cents`` is either an already-managed pyspark Broadcast of the
    (k, dim) centroid matrix (the trainer's loop owns and destroys it
    per iteration) or a raw array, wrapped here for one-off use."""
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.broadcast import Broadcast

    if isinstance(cents, Broadcast):
        bc = cents
    else:
        bc = v.sparkSession.sparkContext.broadcast(np.asarray(cents, dtype=np.float64))
    ids = list(cent_ids)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value  # (k_live, dim) unit rows
        sums = np.zeros_like(C)
        counts = np.zeros(C.shape[0], dtype=np.int64)
        for b in batches:
            if not len(b):
                continue
            mat = np.asarray(b["nv"].to_list(), dtype=np.float64)
            # drop vectors with null/NaN ELEMENTS (Arrow surfaces null
            # array elements as NaN; the isNotNull filter upstream only
            # removes fully-null arrays) — one poisoned vector would
            # otherwise NaN every centroid it touches via add.at, and
            # argmax over NaN rows is meaningless
            valid = ~np.isnan(mat).any(axis=1)
            if not valid.all():
                mat = mat[valid]
            if not len(mat):
                continue
            # argmax returns the FIRST max → lowest-cell tie-break
            cell = np.argmax(mat @ C.T, axis=1)
            np.add.at(sums, cell, mat)
            np.add.at(counts, cell, 1)
        live = np.nonzero(counts)[0]
        if len(live):
            yield pd.DataFrame(
                {
                    "centroid_id": [ids[i] for i in live],
                    "psum": [sums[i].tolist() for i in live],
                    "pcount": counts[live],
                }
            )

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        total = np.asarray(pdf["psum"].to_list(), dtype=np.float64).sum(axis=0)
        n = int(pdf["pcount"].sum())
        m = total / n
        mn = float(np.linalg.norm(m))
        vec = (m / mn) if mn > 0 else m
        return pd.DataFrame(
            {"centroid_id": [int(pdf["centroid_id"].iloc[0])], "centroid_vec": [vec.tolist()]}
        )

    return (
        v.mapInPandas(partials, schema="centroid_id int, psum array<double>, pcount long")
        .groupBy("centroid_id")
        .applyInPandas(_merge, schema="centroid_id int, centroid_vec array<double>")
    )


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
