"""Supervised Naive Bayes classifier (operators/classify.py): parity
against a pure-python reference, the NULL/no-evidence contract, the
deterministic tie-break, and the fail-loud guards."""

import math

import pytest
from pyspark.sql import functions as F

from schema_drift_detector_spark.functions.text import portable_hash60_py
from schema_drift_detector_spark.operators.classify import nb_classify

N_BUCKETS = 64  # tiny on purpose: forces bucket collisions into play


def _bucket(tok: str) -> int:
    return portable_hash60_py(tok + ":nb") % N_BUCKETS


def _py_nb(docs, train, classes, alpha=0.5, digits=5):
    """Pure-python multinomial NB with the engine's exact rules."""
    pr = {c: 0 for c in classes}
    cnt = {c: {} for c in classes}
    tot = {c: 0 for c in classes}
    for _id, text, lab in train:
        pr[lab] += 1
        for t in (text or "").split(" "):
            if t:
                b = _bucket(t)
                cnt[lab][b] = cnt[lab].get(b, 0) + 1
                tot[lab] += 1
    n_train = sum(pr.values())
    out = {}
    for _id, text, _lab in docs:
        toks = [t for t in (text or "").split(" ") if t]
        if not toks:
            out[_id] = (None, None, None)
            continue
        scores = {}
        for c in classes:
            s = math.log(pr[c] / n_train)
            for t in toks:
                b = _bucket(t)
                s += math.log(
                    (cnt[c].get(b, 0) + alpha) / (tot[c] + alpha * N_BUCKETS)
                )
            scores[c] = round(s, digits)
        best = max(scores.values())
        pred = min(c for c in classes if scores[c] == best)  # name-asc ties
        runner = max(v for c, v in scores.items() if c != pred) if len(classes) > 1 else best
        out[_id] = (pred, best, round(best - runner, digits))
    return out


def _mkdocs():
    rows = []
    for i in range(60):
        lab = ["spam", "ham", "eggs"][i % 3]
        marker = {"spam": "viagra pills", "ham": "meeting agenda", "eggs": "recipe whisk"}[lab]
        base = f"common filler words tok{i % 7} shared"
        rows.append((i, f"{base} {marker}" if i % 5 != 0 else base, lab))
    rows.append((100, None, "spam"))  # NULL text
    rows.append((101, "   ", "ham"))  # only '' artifacts -> no tokens
    return rows


def test_nb_matches_pure_python(spark):
    rows = _mkdocs()
    train = [r for r in rows if r[0] % 2 == 0]
    sdocs = spark.createDataFrame(rows, "doc_id long, text string, label string")
    strain = sdocs.filter(F.col("doc_id") % 2 == 0)
    got = {
        r.doc_id: (r.nb_pred, r.nb_score, r.nb_margin)
        for r in nb_classify(
            sdocs, strain, classes=["eggs", "ham", "spam"], n_buckets=N_BUCKETS
        ).collect()
    }
    exp = _py_nb(rows, train, ["eggs", "ham", "spam"])
    assert got == exp
    # the no-evidence contract bound: both degenerate docs predict NULL
    assert got[100] == (None, None, None) and got[101] == (None, None, None)
    # the task is learnable: marked held-out docs beat the 1/3 chance
    # floor decisively (64 buckets collide, so perfection isn't owed)
    held = [r for r in rows if r[0] % 2 == 1 and r[0] % 5 != 0]
    acc = sum(got[i][0] == lab for i, _t, lab in held) / len(held)
    assert acc >= 0.8, acc


def test_nb_deterministic_across_parallelism(spark):
    rows = _mkdocs()
    sdocs = spark.createDataFrame(rows, "doc_id long, text string, label string")
    strain = sdocs.filter(F.col("doc_id") % 2 == 0)
    a = {
        r.doc_id: (r.nb_pred, r.nb_score)
        for r in nb_classify(sdocs, strain, n_buckets=N_BUCKETS).collect()
    }
    b = {
        r.doc_id: (r.nb_pred, r.nb_score)
        for r in nb_classify(
            sdocs.repartition(13), strain.repartition(7), n_buckets=N_BUCKETS
        ).collect()
    }
    assert a == b


def test_nb_tie_breaks_by_class_name(spark):
    # two classes with IDENTICAL training evidence -> every rounded
    # score ties -> the lexicographically smaller class must win
    rows = [(0, "x y", "bbb"), (1, "x y", "aaa"), (2, "x y", "zzz")]
    sdocs = spark.createDataFrame(rows, "doc_id long, text string, label string")
    out = nb_classify(
        sdocs.filter(F.col("doc_id") == 2).select("doc_id", F.col("text"), F.col("label")),
        sdocs.filter(F.col("doc_id") < 2),
        n_buckets=N_BUCKETS,
    ).collect()
    assert out[0].nb_pred == "aaa" and out[0].nb_margin == 0.0


def test_nb_single_class(spark):
    """K == 1 is a legal degenerate problem: every tokenized doc
    predicts the one class with margin exactly 0.0 (regression: the
    one-arg F.greatest crash)."""
    rows = [(0, "x y", "only"), (1, "z", "only"), (2, None, "only")]
    sdocs = spark.createDataFrame(rows, "doc_id long, text string, label string")
    got = {
        r.doc_id: (r.nb_pred, r.nb_margin)
        for r in nb_classify(sdocs, sdocs, n_buckets=N_BUCKETS).collect()
    }
    assert got[0] == ("only", 0.0) and got[1] == ("only", 0.0)
    assert got[2] == (None, None)


def test_nb_guards(spark):
    sdocs = spark.createDataFrame(
        [(0, "x", "a"), (1, "y", "b")], "doc_id long, text string, label string"
    )
    with pytest.raises(ValueError, match="not in classes"):
        nb_classify(sdocs, sdocs, classes=["a"], n_buckets=N_BUCKETS)
    with pytest.raises(ValueError, match="no train docs"):
        nb_classify(sdocs, sdocs, classes=["a", "b", "c"], n_buckets=N_BUCKETS)
    with pytest.raises(ValueError, match="no non-NULL labels"):
        nb_classify(
            sdocs,
            sdocs.select("doc_id", "text", F.lit(None).cast("string").alias("label")),
            n_buckets=N_BUCKETS,
        )
    with pytest.raises(ValueError, match="n_buckets"):
        nb_classify(sdocs, sdocs, n_buckets=1)
    with pytest.raises(ValueError, match="alpha"):
        nb_classify(sdocs, sdocs, alpha=0.0)


def test_nb_scoring_plan_shape(spark):
    """The corpus-side plan must broadcast the model (no corpus-side
    shuffle for the model join): exactly the scan -> explode ->
    broadcast join -> partial agg shape."""
    rows = _mkdocs()
    sdocs = spark.createDataFrame(rows, "doc_id long, text string, label string")
    out = nb_classify(sdocs, sdocs, n_buckets=N_BUCKETS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
