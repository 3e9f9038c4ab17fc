"""Frontier scheduling + crawl delta (pipeline/frontier.py)."""

import pytest
from pyspark.sql import functions as F

from k2_18_spark.pipeline.frontier import crawl_delta, frontier_schedule


def test_schedule_batches_and_ranks(spark):
    urls = spark.createDataFrame(
        [
            ("https://a.com/1", 0.9),
            ("https://a.com/2", 0.5),
            ("https://a.com/3", 0.9),  # ties with /1 -> url asc
            ("https://a.com/4", 0.1),
            ("https://b.com/x", 0.2),
        ],
        "url string, prio double",
    )
    got = {
        r["url"]: (r["host"], r["host_rank"], r["batch"])
        for r in frontier_schedule(
            urls, per_host_limit=2, priority_col="prio"
        ).collect()
    }
    assert got == {
        "https://a.com/1": ("a.com", 1, 0),
        "https://a.com/3": ("a.com", 2, 0),
        "https://a.com/2": ("a.com", 3, 1),
        "https://a.com/4": ("a.com", 4, 1),
        "https://b.com/x": ("b.com", 1, 0),
    }


def test_schedule_without_priority_orders_by_url(spark):
    urls = spark.createDataFrame(
        [("https://a.com/b",), ("https://a.com/a",)], "url string"
    )
    got = {
        r["url"]: r["host_rank"]
        for r in frontier_schedule(urls, per_host_limit=1).collect()
    }
    assert got == {"https://a.com/a": 1, "https://a.com/b": 2}


def test_schedule_budget_cut(spark):
    urls = spark.createDataFrame(
        [(f"https://a.com/{i}",) for i in range(10)], "url string"
    )
    out = frontier_schedule(urls, per_host_limit=2, max_batches=3)
    assert out.count() == 6
    assert out.agg(F.max("batch")).collect()[0][0] == 2


def test_schedule_rejects_bad_limit(spark):
    urls = spark.createDataFrame([("https://a.com/x",)], "url string")
    with pytest.raises(ValueError):
        frontier_schedule(urls, per_host_limit=0)


def test_crawl_delta(spark):
    old = spark.createDataFrame(
        [("u1", "h1"), ("u2", "h2"), ("u3", "h3")], "url string, fingerprint string"
    )
    new = spark.createDataFrame(
        [("u2", "h2"), ("u3", "h3x"), ("u4", "h4")], "url string, fingerprint string"
    )
    got = {r["url"]: r["status"] for r in crawl_delta(old, new).collect()}
    assert got == {
        "u1": "gone",
        "u2": "unchanged",
        "u3": "changed",
        "u4": "added",
    }
