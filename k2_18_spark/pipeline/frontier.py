"""Crawl-frontier scheduling and crawl-to-crawl deltas — the two
bookkeeping operators between discovery (sitemaps/links) and fetch
(WARC): which URLs go in which polite batch, and what changed since
the last crawl.

``frontier_schedule`` implements per-host politeness batching: within
each host, URLs are ranked by priority (desc, ties by URL asc for
determinism) and dealt into consecutive batches of ``per_host_limit``
— batch b is the set a crawler may fetch in round b without exceeding
the per-host budget. One window over the host partition; hosts are
the natural partition key of a frontier and the per-host sort is
bounded by the largest host's URL count (a true mega-host just spans
more batches — the window never needs cross-host data, so AQE skew
splitting plus the rank cap keep it safe at 10^12 rows).

``crawl_delta`` diffs two crawls by URL on a content fingerprint →
``added`` / ``gone`` / ``changed`` / ``unchanged`` — ONE full-outer
hash join on the url key, the input to incremental pipelines
(warm-start PageRank consumes the edge delta downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def frontier_schedule(
    urls: DataFrame,
    per_host_limit: int,
    url_col: str = "url",
    priority_col: str | None = None,
    max_batches: int | None = None,
) -> DataFrame:
    """→ input columns + (host, host_rank, batch). ``host_rank`` is the
    1-based politeness rank within the URL's host (priority desc, url
    asc); ``batch`` = (host_rank-1) // per_host_limit. With
    ``max_batches`` set, URLs beyond ``per_host_limit * max_batches``
    per host are DROPPED (the crawl-budget cut, applied before any
    downstream work)."""
    if per_host_limit < 1:
        raise ValueError("per_host_limit must be >= 1")
    from k2_18_spark.functions.urls import url_host

    order = (
        [F.col(priority_col).desc(), F.col(url_col).asc()]
        if priority_col
        else [F.col(url_col).asc()]
    )
    w = Window.partitionBy("host").orderBy(*order)
    out = (
        urls.withColumn("host", url_host(url_col))
        .withColumn("host_rank", F.row_number().over(w))
        .withColumn(
            "batch",
            ((F.col("host_rank") - 1) / per_host_limit).cast("long"),
        )
    )
    if max_batches is not None:
        out = out.filter(F.col("batch") < max_batches)
    return out


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Diff two crawl snapshots → (url, status, old_fingerprint,
    new_fingerprint) with status ∈ added | gone | changed | unchanged.
    One full-outer join on the url key."""
    o = old.select(
        F.col(url_col).alias("url"),
        F.col(fingerprint_col).alias("old_fingerprint"),
    )
    n = new.select(
        F.col(url_col).alias("url"),
        F.col(fingerprint_col).alias("new_fingerprint"),
    )
    return o.join(n, "url", "full_outer").select(
        "url",
        F.when(F.col("old_fingerprint").isNull(), F.lit("added"))
        .when(F.col("new_fingerprint").isNull(), F.lit("gone"))
        .when(
            F.col("old_fingerprint") == F.col("new_fingerprint"),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
        .alias("status"),
        "old_fingerprint",
        "new_fingerprint",
    )
