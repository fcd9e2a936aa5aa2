from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from schema_drift_detector_spark.operators.resample import resample_locf


def _ref_resample(rows, step):
    """Independent pure-Python LOCF fill: rows = (g, epoch, value, tie)."""
    obs: dict[tuple[int, int], tuple[tuple[int, int], float]] = {}
    for g, e, v, t in rows:
        if g is None or e is None or v is None:
            continue
        b = e - (e % step)  # non-negative epochs in the strategy
        key = (g, b)
        if key not in obs or (e, t) > obs[key][0]:
            obs[key] = ((e, t), v)
    out = {}
    for g in {k[0] for k in obs}:
        bs = [b for (gg, b) in obs if gg == g]
        lo, hi = min(bs), max(bs)
        carry = None
        for b in range(lo, hi + 1, step):
            if (g, b) in obs:
                carry = obs[(g, b)][1]
                out[(g, b)] = (carry, True)
            else:
                out[(g, b)] = (carry, False)
    return out


_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # group
        st.integers(min_value=0, max_value=40_000),  # epoch seconds
        st.floats(min_value=-5, max_value=5, allow_nan=False) | st.none(),
        st.integers(min_value=0, max_value=99),  # tiebreak
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda r: (r[0], r[1], r[3]),  # (g, e, tie) total order
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_rows)
def test_resample_hypothesis_parity(spark, rows):
    """Property: bucket assignment, in-bucket winner, span, and LOCF
    carry all equal an independent pure-Python fill over random sparse
    multi-group series (NULL values included as gaps)."""
    step = 3600
    data = [
        (g, dt.datetime(2026, 1, 1) + dt.timedelta(seconds=e), v, t)
        for g, e, v, t in rows
    ]
    got = {
        (r.user_id, r.bucket_ts): (r.value, r.observed)
        for r in resample_locf(_df(spark, data), tiebreak_col="event_id").collect()
    }
    base = int(dt.datetime(2026, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp())
    exp = {
        (g, base + b): (v, o) for (g, b), (v, o) in _ref_resample(rows, step).items()
    }
    assert got == exp


def _ts(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )


def test_resample_fills_gaps_with_locf(spark):
    rows = [
        (1, _ts(0, 30), 10.0, 1),
        (1, _ts(3, 10), 30.0, 2),  # buckets 1 and 2 are gaps
        (2, _ts(5, 0), 7.0, 3),  # single-bucket group
    ]
    out = {
        (r.user_id, r.bucket_ts): (r.value, r.observed)
        for r in resample_locf(_df(spark, rows), tiebreak_col="event_id").collect()
    }
    base = int(dt.datetime(2026, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp())
    assert out[(1, base + 0 * 3600)] == (10.0, True)
    assert out[(1, base + 1 * 3600)] == (10.0, False)  # carried
    assert out[(1, base + 2 * 3600)] == (10.0, False)  # carried
    assert out[(1, base + 3 * 3600)] == (30.0, True)
    assert out[(2, base + 5 * 3600)] == (7.0, True)
    assert len(out) == 5  # exactly the spans, nothing outside


def test_resample_in_bucket_last_wins_with_tiebreak(spark):
    rows = [
        (1, _ts(0, 10), 1.0, 5),
        (1, _ts(0, 50), 2.0, 6),  # later ts wins
        (2, _ts(0, 10), 3.0, 7),
        (2, _ts(0, 10), 4.0, 9),  # equal ts: greater event_id wins
    ]
    out = {
        r.user_id: r.value
        for r in resample_locf(_df(spark, rows), tiebreak_col="event_id").collect()
    }
    assert out[1] == 2.0 and out[2] == 4.0


def test_resample_null_drop_contract(spark):
    rows = [
        (1, _ts(0), 1.0, 1),
        (None, _ts(1), 9.0, 2),  # NULL group dropped
        (1, None, 9.0, 3),  # NULL ts dropped
        (1, _ts(1), None, 4),  # NULL value dropped (gap, not observation)
    ]
    got = resample_locf(_df(spark, rows), tiebreak_col="event_id").collect()
    assert len(got) == 1 and got[0].observed


def test_resample_negative_epoch_floor_alignment(spark):
    """Pre-1970 timestamps must FLOOR to their own bucket, not round
    toward zero into the next one (the % vs pmod trap)."""
    rows = [
        (1, dt.datetime(1969, 12, 31, 23, 30), 5.0, 1),
        (1, dt.datetime(1970, 1, 1, 0, 30), 6.0, 2),
    ]
    out = sorted(
        (r.bucket_ts, r.value, r.observed)
        for r in resample_locf(_df(spark, rows), tiebreak_col="event_id").collect()
    )
    assert out == [(-3600, 5.0, True), (0, 6.0, True)]


def test_resample_plan_shape(spark):
    """Documented scale shape: one (g,b) obs aggregation, one small
    per-group bounds aggregation, one (g,b) skeleton join, one
    per-group carry window — at most 4 hash shuffles, never a
    cartesian product (the skeleton joins on (g,b), it does not
    cross-join the bounds)."""
    rows = [(1, _ts(h), float(h), h) for h in range(5)]
    out = resample_locf(_df(spark, rows), tiebreak_col="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 4, plan
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_resample_step_validation(spark):
    try:
        resample_locf(_df(spark, []), tiebreak_col="event_id", step=0)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "step" in str(e)
