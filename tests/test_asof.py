"""As-of join: boundary/tie/null semantics and the no-explosion plan."""

from __future__ import annotations

from datetime import datetime as D

from pyspark.sql import functions as F

from schema_drift_detector_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, D(2024, 1, 5)),
            (2, 10, D(2024, 1, 1)),   # before any right
            (3, 10, D(2024, 1, 10)),
            (4, 20, D(2024, 1, 5)),   # key with no right rows
            (5, None, D(2024, 1, 5)),  # null key
            (6, 10, None),             # null ts
            (7, 10, D(2024, 1, 3)),    # exactly at a right ts (inclusive)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, D(2024, 1, 3), 5.0),
            (101, 10, D(2024, 1, 3), 7.0),  # equal-ts tie -> max event_id wins
            (102, 10, D(2024, 1, 8), 9.0),
            (103, None, D(2024, 1, 1), 1.0),  # null-key right: never matches
            (104, 30, None, 2.0),             # null-ts right: never matches
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, "user_id", right_cols=["event_id", "value"], right_tiebreak="event_id"
    )
    rows = {r.event_id: (r.asof_event_id, r.asof_value, r.asof_ts) for r in out.collect()}
    assert rows[1] == (101, 7.0, D(2024, 1, 3))
    assert rows[2] == (None, None, None)
    assert rows[3] == (102, 9.0, D(2024, 1, 8))
    assert rows[4] == (None, None, None)
    assert rows[5] == (None, None, None)
    assert rows[6] == (None, None, None)
    assert rows[7] == (101, 7.0, D(2024, 1, 3))  # inclusive boundary
    assert len(rows) == 7  # every left row exactly once


def test_asof_join_plan_no_explosion(spark):
    """The plan must be windowed-union shaped: no sort-merge/broadcast
    join of the two sides, no cartesian, no range condition."""
    left, right = _frames(spark)
    out = asof_join(left, right, "user_id", right_cols=["value"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Window" in plan


def test_interval_join_semantics_and_guard(spark):
    """Bin-bucketed range join: inclusive bounds, overlapping intervals,
    zero-length intervals, per-key isolation, no cross product, and the
    loud degenerate-interval guard."""
    import pytest

    from schema_drift_detector_spark.operators.asof import interval_join

    pts = spark.createDataFrame(
        [
            (1, 10, D(2024, 1, 1, 5, 0, 0)),
            (2, 10, D(2024, 1, 1, 9, 0, 0)),
            (3, 10, D(2024, 1, 2, 0, 0, 0)),
            (4, 20, D(2024, 1, 1, 5, 0, 0)),
            (5, 10, D(2024, 1, 1, 6, 0, 0)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (10, 1, D(2024, 1, 1, 4, 30, 0), D(2024, 1, 1, 6, 30, 0)),
            (10, 2, D(2024, 1, 1, 8, 59, 0), D(2024, 1, 1, 9, 0, 0)),  # inclusive end
            (20, 3, D(2024, 1, 1, 6, 0, 0), D(2024, 1, 1, 7, 0, 0)),   # wrong window for user 20
            (10, 4, D(2024, 1, 1, 5, 0, 0), D(2024, 1, 1, 5, 0, 0)),   # zero-length, exact hit
        ],
        "user_id long, sid long, s_start timestamp, s_end timestamp",
    )
    out = interval_join(pts, ivs, ["user_id"], bin_seconds=3600)
    got = sorted((r.event_id, r.sid) for r in out.collect())
    assert got == [(1, 1), (1, 4), (2, 2), (5, 1)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    # colliding non-key columns fail fast
    with pytest.raises(ValueError, match="colliding"):
        interval_join(pts, ivs.withColumnRenamed("sid", "event_id"), ["user_id"])
    # degenerate interval fails LOUD at runtime, never silently explodes
    bad = spark.createDataFrame(
        [(10, 9, D(2020, 1, 1), D(2024, 1, 1))],
        "user_id long, sid long, s_start timestamp, s_end timestamp",
    )
    with pytest.raises(Exception, match="bins"):
        interval_join(pts, bad, ["user_id"], bin_seconds=60, max_bins_per_interval=100).count()


def test_interval_join_inverted_interval_fails_loud(spark):
    """An inverted interval (end before start — swapped columns) must
    raise, not silently explode into a descending bin sequence."""
    import pytest

    from schema_drift_detector_spark.operators.asof import interval_join

    pts = spark.createDataFrame(
        [(1, 10, D(2024, 1, 1, 5, 0, 0))], "event_id long, user_id long, ts timestamp"
    )
    inverted = spark.createDataFrame(
        [(10, 1, D(2024, 1, 1, 12, 0, 0), D(2024, 1, 1, 3, 0, 0))],
        "user_id long, sid long, s_start timestamp, s_end timestamp",
    )
    with pytest.raises(Exception, match="inverted"):
        interval_join(pts, inverted, ["user_id"], bin_seconds=60).count()


def test_interval_join_null_contract(spark):
    """NULL bounds raise (a half-open interval must be closed by the
    caller, not silently dropped by sequence(NULL, …)); NULL point
    timestamps drop via standard inner-join NULL-key semantics."""
    import pytest

    from schema_drift_detector_spark.operators.asof import interval_join

    pts = spark.createDataFrame(
        [(1, 10, D(2024, 1, 1, 5, 0, 0)), (2, 10, None)],
        "event_id long, user_id long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [(10, 1, D(2024, 1, 1, 4, 0, 0), D(2024, 1, 1, 6, 0, 0))],
        "user_id long, sid long, s_start timestamp, s_end timestamp",
    )
    # NULL point ts: dropped, matched point survives
    got = interval_join(pts, ivs, ["user_id"], bin_seconds=3600).collect()
    assert [r.event_id for r in got] == [1]
    for null_iv in (
        [(10, 2, None, D(2024, 1, 1, 6, 0, 0))],
        [(10, 3, D(2024, 1, 1, 4, 0, 0), None)],
    ):
        bad = spark.createDataFrame(
            null_iv, "user_id long, sid long, s_start timestamp, s_end timestamp"
        )
        with pytest.raises(Exception, match="NULL bound"):
            interval_join(pts, bad, ["user_id"], bin_seconds=3600).count()
