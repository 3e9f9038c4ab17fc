"""priority_sample (operators/mixing.py) and cohort_retention
(operators/retention.py)."""

import datetime as dt
import hashlib

from k2_18_spark.operators.mixing import priority_sample
from k2_18_spark.operators.retention import cohort_retention


def _docs(spark, n):
    return spark.createDataFrame(
        [(i, ["en", "es"][i % 2]) for i in range(n)],
        "doc_id long, lang string",
    )


def test_exact_k_per_stratum_and_determinism(spark):
    d = _docs(spark, 200)
    a = priority_sample(d, k=7, strata_cols=["lang"])
    b = priority_sample(d, k=7, strata_cols=["lang"])
    ra = sorted((r.doc_id, r.lang) for r in a.collect())
    rb = sorted((r.doc_id, r.lang) for r in b.collect())
    assert ra == rb
    per = {}
    for _, lang in ra:
        per[lang] = per.get(lang, 0) + 1
    assert per == {"en": 7, "es": 7}


def test_matches_hash_order_replica(spark):
    d = _docs(spark, 100)
    got = sorted(
        r.doc_id for r in priority_sample(d, k=5, strata_cols=["lang"]).collect()
    )
    exp = []
    for lang_mod in (0, 1):
        ids = [i for i in range(100) if i % 2 == lang_mod]
        ids.sort(
            key=lambda i: (
                hashlib.md5(f"psample|{i}".encode()).hexdigest(),
                i,
            )
        )
        exp += ids[:5]
    assert got == sorted(exp)


def test_sample_stability_under_removal(spark):
    """Removing non-sampled rows must not change the sample; the
    hash-priority order is global, not relative."""
    d = _docs(spark, 100)
    full = {
        r.doc_id
        for r in priority_sample(d, k=5, strata_cols=["lang"]).collect()
    }
    kept = d.filter(
        d.doc_id.isin(*[int(x) for x in full])
        | (d.doc_id % 10 == 3)  # some extra survivors
    )
    again = {
        r.doc_id
        for r in priority_sample(kept, k=5, strata_cols=["lang"]).collect()
    }
    assert full == again


def test_small_stratum_keeps_all(spark):
    d = _docs(spark, 6)  # 3 per lang < k
    out = priority_sample(d, k=10, strata_cols=["lang"])
    assert out.count() == 6


T0 = dt.datetime(2026, 1, 5)  # a Monday


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(days=dd), u, "view", 0.0)
            for i, (dd, u) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


def test_cohort_retention(spark):
    # cohort A (week of Jan 5): users 1, 2; cohort B (Jan 12): user 3
    # week1 offset: user 1 returns; week2: nobody
    ev = _ev(
        spark,
        [
            (0, 1), (2, 2),          # cohort A, offset 0
            (8, 1),                  # user 1 active offset 1
            (7, 3),                  # cohort B offset 0
            (15, 3),                 # cohort B offset 1
        ],
    )
    rows = {
        (str(r.cohort_week), r.week_offset): r
        for r in cohort_retention(ev).collect()
    }
    a0 = rows[("2026-01-05", 0)]
    assert a0.active_users == 2 and a0.cohort_size == 2
    assert a0.retention == 1.0
    a1 = rows[("2026-01-05", 1)]
    assert a1.active_users == 1 and a1.retention == 0.5
    b1 = rows[("2026-01-12", 1)]
    assert b1.active_users == 1 and b1.cohort_size == 1
    assert ("2026-01-05", 2) not in rows


def test_offsets_are_week_exact(spark):
    # Monday 00:00 and the following Sunday are the SAME week; the
    # next Monday is offset 1
    ev = _ev(spark, [(0, 1), (6, 1), (7, 1)])
    rows = {r.week_offset: r.active_users for r in cohort_retention(ev).collect()}
    assert rows == {0: 1, 1: 1}
