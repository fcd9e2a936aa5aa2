"""Count-min sketch (functions/cms.py): pure-python parity, the
never-undercount invariant, merge associativity, NULL contracts, and
the broadcast plan shape."""

import pytest
from pyspark.sql import functions as F

from schema_drift_detector_spark.functions.cms import (
    cms_build,
    cms_estimate,
    cms_merge,
)
from schema_drift_detector_spark.functions.text import portable_hash60_py

D, W = 3, 16


def _py_cms(keys):
    sk = {}
    for k in keys:
        for i in range(D):
            idx = i * W + portable_hash60_py(str(k) + f":cms:{i}") % W
            sk[idx] = sk.get(idx, 0) + 1
    return sk


def _py_est(sk, k):
    return min(
        sk.get(i * W + portable_hash60_py(str(k) + f":cms:{i}") % W, 0)
        for i in range(D)
    )


def _keys():
    # skewed multiset: key j appears j+1 times, plus NULL noise
    out = []
    for j in range(40):
        out.extend([j] * (j % 7 + 1))
    return out


def test_cms_matches_pure_python_and_never_undercounts(spark):
    keys = _keys()
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    sk = {r.idx: r.n for r in cms_build(df, "user_id", D, W).collect()}
    assert sk == _py_cms(keys)

    true = {}
    for k in keys:
        true[k] = true.get(k, 0) + 1
    probes = df.distinct()
    est = {
        r.user_id: r.cms_est
        for r in cms_estimate(probes, cms_build(df, "user_id", D, W), "user_id", D, W).collect()
    }
    assert est == {k: _py_est(_py_cms(keys), k) for k in true}
    assert all(est[k] >= n for k, n in true.items())  # the CMS invariant
    # unseen key estimates 0 (not NULL): absence of collisions in at
    # least one row is what min() buys
    unseen = spark.createDataFrame([(10_000_000,)], "user_id long")
    got = cms_estimate(unseen, cms_build(df, "user_id", D, W), "user_id", D, W).collect()
    assert got[0].cms_est >= 0


def test_cms_merge_equals_whole_and_nulls_skipped(spark):
    keys = _keys()
    df = spark.createDataFrame([(k,) for k in keys] + [(None,)] * 5, "user_id long")
    whole = {r.idx: r.n for r in cms_build(df, "user_id", D, W).collect()}
    h1 = df.filter(F.col("user_id") % 2 == 0)
    h2 = df.filter((F.col("user_id") % 2 != 0) | F.col("user_id").isNull())
    merged = {
        r.idx: r.n
        for r in cms_merge(
            cms_build(h1, "user_id", D, W), cms_build(h2, "user_id", D, W)
        ).collect()
    }
    assert merged == whole
    # NULL keys counted nowhere: totals equal the non-null multiset size
    assert sum(whole.values()) == D * len(keys)
    # NULL probe estimates NULL (no attribution, not zero)
    probe = spark.createDataFrame([(None,), (2,)], "user_id long")
    got = {
        r.user_id: r.cms_est
        for r in cms_estimate(probe, cms_build(df, "user_id", D, W), "user_id", D, W).collect()
    }
    assert got[None] is None and got[2] is not None


def test_cms_deterministic_across_parallelism(spark):
    keys = _keys()
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    a = {r.idx: r.n for r in cms_build(df, "user_id", D, W).collect()}
    b = {r.idx: r.n for r in cms_build(df.repartition(13), "user_id", D, W).collect()}
    assert a == b


def test_cms_guards_and_plan(spark):
    df = spark.createDataFrame([(1,)], "user_id long")
    with pytest.raises(ValueError, match="depth"):
        cms_build(df, "user_id", depth=0)
    with pytest.raises(ValueError, match="width"):
        cms_build(df, "user_id", width=1)
    with pytest.raises(ValueError, match="already has a column"):
        cms_estimate(
            df.withColumn("cms_est", F.lit(1)), cms_build(df, "user_id"), "user_id"
        )
    from schema_drift_detector_spark.functions.cms import cms_merge as m

    with pytest.raises(ValueError, match="at least one"):
        m()
    # estimate broadcasts the sketch — the probe side must not shuffle
    # for the join
    est = cms_estimate(df, cms_build(df, "user_id", D, W), "user_id", D, W)
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
