"""Funnel analysis (operators/funnels.py): first-touch greedy
matching, strict ordering, conversion window, stats rollup."""

import datetime as dt

import pytest

from k2_18_spark.operators.funnels import funnel, funnel_stats

T0 = dt.datetime(2026, 3, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(seconds=s), u, y, 0.0)
            for i, (s, u, y) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


def test_first_touch_greedy(spark):
    # user 1: view@0, click@10 BEFORE second view@20 — click must
    # match against the FIRST view; purchase@30 completes
    ev = _ev(
        spark,
        [
            (0, 1, "view"),
            (10, 1, "click"),
            (20, 1, "view"),
            (30, 1, "purchase"),
            # user 2: click before any view → never matches step 2
            (0, 2, "click"),
            (10, 2, "view"),
            (20, 2, "purchase"),
        ],
    )
    out = {
        r.user_id: r
        for r in funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert out[1].steps_completed == 3
    assert out[1].step1_ts == T0
    assert out[1].step2_ts == T0 + dt.timedelta(seconds=10)
    # user 2: view matched at t=10, no click after it, purchase
    # requires a matched click
    assert out[2].steps_completed == 1
    assert out[2].step2_ts is None and out[2].step3_ts is None


def test_strictly_after_and_tiebreak(spark):
    # click at the SAME timestamp as the view does not count
    # (strictly-after rule)
    ev = _ev(spark, [(0, 1, "view"), (0, 1, "click"), (5, 1, "click")])
    out = funnel(ev, ["view", "click"]).collect()[0]
    assert out.step2_ts == T0 + dt.timedelta(seconds=5)


def test_conversion_window(spark):
    ev = _ev(
        spark,
        [
            (0, 1, "view"),
            (100, 1, "click"),
            (5000, 1, "purchase"),  # outside a 1000s window from view
            (0, 2, "view"),
            (100, 2, "click"),
            (900, 2, "purchase"),
        ],
    )
    out = {
        r.user_id: r.steps_completed
        for r in funnel(
            ev, ["view", "click", "purchase"], within_seconds=1000
        ).collect()
    }
    assert out == {1: 2, 2: 3}


def test_non_participants_absent(spark):
    ev = _ev(spark, [(0, 1, "view"), (0, 2, "error")])
    out = funnel(ev, ["view", "click"])
    assert [r.user_id for r in out.collect()] == [1]


def test_funnel_stats(spark):
    ev = _ev(
        spark,
        [
            (0, 1, "view"), (1, 1, "click"), (2, 1, "purchase"),
            (0, 2, "view"), (1, 2, "click"),
            (0, 3, "view"),
            (0, 4, "view"),
        ],
    )
    f = funnel(ev, ["view", "click", "purchase"])
    st = {r.step: r for r in funnel_stats(f, 3).collect()}
    assert st[1].users == 4
    assert st[2].users == 2 and st[2].conversion_from_prev == 0.5
    assert st[3].users == 1
    assert st[3].conversion_from_prev == 0.5
    assert st[3].conversion_from_first == 0.25
