"""Sessionization (operators/sessions.py): gap rule, tie-breaks,
running counter, per-session rollup."""

import datetime as dt

import pyspark.sql.functions as F

from k2_18_spark.operators.sessions import session_stats, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(seconds=s), u, t, v)
            for i, (s, u, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


def test_gap_splits_and_boundary(spark):
    # gaps: 100 (stay), exactly 1800 (stay — strictly-greater rule),
    # 1801 (break)
    ev = _ev(
        spark,
        [
            (0, 1, "a", 1.0),
            (100, 1, "a", 1.0),
            (1900, 1, "b", 1.0),  # +1800 from prev → same session
            (3701, 1, "b", 1.0),  # +1801 → new session
        ],
    )
    out = sessionize(ev, gap_seconds=1800).orderBy("event_id").collect()
    assert [r.session_seq for r in out] == [1, 1, 1, 2]
    assert [r.session_id for r in out] == ["1:1", "1:1", "1:1", "1:2"]


def test_users_independent_and_counter_restarts(spark):
    ev = _ev(
        spark,
        [
            (0, 1, "a", 1.0),
            (10_000, 1, "a", 1.0),
            (5, 2, "a", 1.0),
            (10, 2, "a", 1.0),
        ],
    )
    out = sessionize(ev, gap_seconds=1800)
    per_user = {
        (r.user_id, r.event_id): r.session_seq for r in out.collect()
    }
    assert per_user[(1, 0)] == 1 and per_user[(1, 1)] == 2
    assert per_user[(2, 2)] == 1 and per_user[(2, 3)] == 1


def test_simultaneous_ts_tiebreak(spark):
    # two events at the same timestamp: event_id order pins which is
    # "first"; both land in one session either way, and the output is
    # deterministic across runs
    ev = _ev(spark, [(0, 1, "a", 1.0), (0, 1, "b", 2.0)])
    a = sessionize(ev, gap_seconds=60).orderBy("event_id").collect()
    b = sessionize(ev, gap_seconds=60).orderBy("event_id").collect()
    assert [r.session_seq for r in a] == [1, 1]
    assert [(r.event_id, r.session_seq) for r in a] == [
        (r.event_id, r.session_seq) for r in b
    ]


def test_session_stats(spark):
    ev = _ev(
        spark,
        [
            (0, 1, "view", 1.5),
            (60, 1, "click", 2.5),
            (10_000, 1, "view", 3.0),
        ],
    )
    st = (
        session_stats(sessionize(ev, gap_seconds=1800))
        .orderBy("session_seq")
        .collect()
    )
    assert len(st) == 2
    s1, s2 = st
    assert s1.n_events == 2 and s1.duration_sec == 60
    assert abs(s1.total_value - 4.0) < 1e-9
    assert s1.n_event_types == 2
    assert s2.n_events == 1 and s2.duration_sec == 0
    assert s2.n_event_types == 1


def test_single_shuffle_plan(spark):
    """The window chain plans exactly one Exchange over the events:
    lag, the cumulative counter, and the stats groupBy all reuse the
    user_id hash partitioning."""
    ev = _ev(spark, [(0, 1, "a", 1.0), (5, 1, "a", 1.0)])
    plan = (
        session_stats(sessionize(ev, gap_seconds=60))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one exchange for user_id partitioning (plus possibly AQE reads);
    # no second hashpartitioning on a different key
    assert plan.count("hashpartitioning(user_id") <= 1
