from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from schema_drift_detector_spark.operators.layout import (
    minmax_bucket,
    zorder_key,
    zorder_layout,
)


def _ref_z(vals, n_bits):
    """Independent pure-Python Morton interleave (col 0 most
    significant within each bit group)."""
    m = len(vals)
    z = 0
    for c, v in enumerate(vals):
        v &= (1 << n_bits) - 1
        for i in range(n_bits):
            z |= ((v >> i) & 1) << (i * m + (m - 1 - c))
    return z


def test_zorder_key_matches_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255), (170, 85)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        "a", "b", zorder_key([F.col("a"), F.col("b")], n_bits=8).alias("z")
    ).collect()
    for r in got:
        assert r.z == _ref_z([r.a, r.b], 8), (r.a, r.b)
    # z(a=1,b=0) > z(b=1,a=0): column 0 owns the higher bit
    zmap = {(r.a, r.b): r.z for r in got}
    assert zmap[(1, 0)] == 2 and zmap[(0, 1)] == 1


def test_zorder_locality_property(spark):
    """Points in the same aligned quadrant share a z prefix: all 4
    points of the low quadrant sort before any of the high quadrant."""
    import itertools

    pts = list(itertools.product([0, 1, 14, 15], repeat=2))
    df = spark.createDataFrame(pts, "a long, b long")
    z = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", zorder_key([F.col("a"), F.col("b")], n_bits=4).alias("z")
        ).collect()
    }
    lo = [z[p] for p in pts if p[0] <= 1 and p[1] <= 1]
    hi = [z[p] for p in pts if p[0] >= 14 and p[1] >= 14]
    assert max(lo) < min(hi)


def test_minmax_bucket_bounds_and_nulls(spark):
    df = spark.createDataFrame(
        [(0,), (50,), (100,), (None,)], "v long"
    ).crossJoin(
        spark.createDataFrame([(0, 100)], "mn long, mx long")
    )
    got = [
        r.b
        for r in df.select(
            minmax_bucket(F.col("v"), F.col("mn"), F.col("mx"), 8).alias("b")
        ).collect()
    ]
    assert got[0] == 0 and got[2] == 255 and got[3] == 0
    assert got[1] == int(50 * 255 / 100)
    # degenerate range -> all bucket 0
    dg = spark.createDataFrame([(7, 7, 7)], "v long, mn long, mx long")
    assert (
        dg.select(minmax_bucket(F.col("v"), F.col("mn"), F.col("mx"), 8).alias("b"))
        .collect()[0]
        .b
        == 0
    )


def test_zorder_layout_plan_and_order(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 1000).alias("a"),
        (F.col("id") * 91 % 500).alias("b"),
    )
    out = zorder_layout(df, ["a", "b"], n_bits=8, n_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly ONE data-scale shuffle: the range partition. The bounds
    # agg contributes a SinglePartition exchange of ONE row (partial
    # aggs upstream), and the bounds join must stay broadcast — a
    # regression to a shuffled join would add a hashpartitioning
    # exchange, which this pins out.
    assert plan.count("Exchange rangepartitioning") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    rows = out.select("k", F.col("__z").alias("z")).collect()
    assert len(rows) == 1000 and len({r.k for r in rows}) == 1000
    # per-partition sortedness
    parts = out.select(F.spark_partition_id().alias("p"), F.col("__z").alias("z")).collect()
    by_part: dict[int, list[int]] = {}
    for r in parts:
        by_part.setdefault(r.p, []).append(r.z)
    for zs in by_part.values():
        assert zs == sorted(zs)


_longs = st.integers(min_value=-(2**62), max_value=2**62)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(_longs, _longs), min_size=1, max_size=25))
def test_zorder_key_hypothesis_parity(spark, pairs):
    """Property: for arbitrary long pairs (negatives included — masked
    to the low bits), the Spark interleave equals the pure-Python
    reference. Batched: each example is ONE Spark job."""
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], "i long, a long, b long"
    )
    got = {
        r.i: r.z
        for r in df.select(
            "i", zorder_key([F.col("a"), F.col("b")], n_bits=12).alias("z")
        ).collect()
    }
    for i, (a, b) in enumerate(pairs):
        assert got[i] == _ref_z([a, b], 12)


def test_zorder_sql_builders_cross_engine_parity(spark):
    """The DuckDB twins (zorder_sql / minmax_bucket_sql) must emit the
    SAME keys as the Spark expressions — including the NULL->bucket-0
    and degenerate-range contracts and the <<-vs-| precedence trap."""
    import duckdb

    from schema_drift_detector_spark.operators.layout import (
        minmax_bucket_sql,
        zorder_sql,
    )

    rows = [(1, 0, 0), (2, 17, 900), (3, 999, 4), (4, None, 450), (5, 500, 500)]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    bounds = df.agg(
        F.min("a").alias("mna"), F.max("a").alias("mxa"),
        F.min("b").alias("mnb"), F.max("b").alias("mxb"),
    )
    got = {
        r.k: r.z
        for r in df.join(F.broadcast(bounds))
        .select(
            "k",
            zorder_key(
                [
                    minmax_bucket(F.col("a"), F.col("mna"), F.col("mxa"), 16),
                    minmax_bucket(F.col("b"), F.col("mnb"), F.col("mxb"), 16),
                ],
                16,
            ).alias("z"),
        )
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k BIGINT, a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    ba = minmax_bucket_sql("a", "bd.mna", "bd.mxa", 16)
    bb = minmax_bucket_sql("b", "bd.mnb", "bd.mxb", 16)
    sql = f"""
    WITH bd AS (SELECT min(a) mna, max(a) mxa, min(b) mnb, max(b) mxb FROM t),
    bk AS (SELECT k, {ba} AS bu, {bb} AS bt FROM t, bd)
    SELECT k, {zorder_sql(['bu', 'bt'], 16)} AS z FROM bk
    """
    oracle = dict(con.execute(sql).fetchall())
    assert got == oracle


def test_zorder_write_enables_file_pruning(spark, tmp_path):
    """The point of the operator, evidenced end-to-end: after a
    z-ordered sorted write, a range predicate on EITHER dimension
    intersects the per-file min/max stats of only a small fraction of
    files — under the unsorted layout, essentially every file is a
    candidate. (Files = what a 100 TB scan would have to open; the
    per-file column stats are what Parquet/Iceberg pruning consults.)"""
    import duckdb

    n = 20_000
    df = spark.range(0, n).select(
        (F.col("id") * 2654435761 % n).alias("a"),
        (F.col("id") * 40503 % n).alias("b"),
    )
    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zorder")
    df.repartition(16).write.mode("overwrite").parquet(plain)
    zorder_layout(df, ["a", "b"], n_bits=16, n_partitions=16).drop(
        "__z"
    ).write.mode("overwrite").parquet(zord)

    con = duckdb.connect()

    def candidates(path, col, lo, hi):
        rows = con.execute(
            f"""
            SELECT file_name,
                   min(CASE WHEN path_in_schema = '{col}' THEN CAST(stats_min_value AS BIGINT) END) AS mn,
                   max(CASE WHEN path_in_schema = '{col}' THEN CAST(stats_max_value AS BIGINT) END) AS mx
            FROM parquet_metadata('{path}/*.parquet')
            GROUP BY file_name
            """
        ).fetchall()
        total = len(rows)
        cand = sum(1 for _, mn, mx in rows if mn is not None and not (mx < lo or mn > hi))
        return cand, total

    lo, hi = 0, n // 16  # a 1/16th range on each dimension
    for col in ("a", "b"):
        c_plain, t_plain = candidates(plain, col, lo, hi)
        c_z, t_z = candidates(zord, col, lo, hi)
        # unsorted: hash-partitioned files all span ~the full range
        assert c_plain == t_plain, (col, c_plain, t_plain)
        # z-ordered: the range lives in a minority of files
        assert c_z <= t_z // 2, (col, c_z, t_z)


def test_zorder_validation(spark):
    df = spark.range(3).select(F.col("id").alias("a"), F.col("id").alias("b"))
    try:
        zorder_key([F.col("a")], 8)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "at least 2" in str(e)
    try:
        zorder_key([F.col("a"), F.col("b")], 32)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "64-bit" in str(e)
    try:
        zorder_layout(df.withColumn("__z", F.lit(1)), ["a", "b"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "__z" in str(e)
