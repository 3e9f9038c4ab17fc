"""Host-level webgraph rollup (the Common-Crawl host-graph idiom).

The page-level hyperlink table mined by ``pipeline.linkgraph`` is the
10^12-row object; the HOST graph (one vertex per registered host, one
weighted edge per linking host pair) is its standard web-scale rollup —
Common Crawl publishes exactly this artifact alongside the page graph,
and host PageRank / host components are the usual first analyses on it.
The reference repo has no web-crawl surface (its graphs come from
``src/itext2kg_graph.py`` concept extraction); this module is part of
the beyond-reference web-pipeline operator set, same tier as the dedup
and text-stats operators.

Scale shape: the rollup is ONE partial-aggregatable ``groupBy`` over
the edge table (map-side combine collapses each partition's pairs
before the shuffle, so shuffle volume is O(distinct host pairs per
partition), not O(|E|)). Hosts are ~3 orders of magnitude fewer than
pages, so every downstream analysis (PageRank, components, stats) runs
on a graph that fits comfortably where the page graph does not — the
host graph of a 10^12-page crawl is ~10^8 vertices, broadcast-range
for its dimension tables.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: scheme://HOST, stopping at the first /, ?, or # — mirrors the DuckDB
#: oracle's regexp_extract so both engines derive hosts identically.
HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"


def url_host(col) -> F.Column:
    """Lower-cased host part of an absolute URL (JVM regexp, codegen)."""
    return F.lower(F.regexp_extract(col, HOST_RE, 1))


def host_edges(edges: DataFrame, include_intra: bool = False) -> DataFrame:
    """Page-level (src_id, dst_id, weight) links → host-level rollup.

    Returns ``(src_host, dst_host, n_links, weight)`` where ``n_links``
    counts page-level link rows and ``weight`` sums their weights.
    ``include_intra=False`` (default) drops same-host links BEFORE the
    aggregate — the filter is codegen'd into the scan side, so intra
    links (the bulk of a real crawl) never reach the shuffle.
    """
    he = edges.select(
        url_host(F.col("src_id")).alias("src_host"),
        url_host(F.col("dst_id")).alias("dst_host"),
        "weight",
    )
    if not include_intra:
        he = he.filter(F.col("src_host") != F.col("dst_host"))
    return he.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.sum("weight").alias("weight"),
    )


def host_stats(pages: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-host crawl summary: pages hosted, out/in link totals and the
    intra-host share of outbound links.

    ``pages`` needs a ``url`` column; ``edges`` the page-level link
    table. Three partial aggregates joined on the (small) host key —
    each input is touched once, all joins are host-cardinality.
    """
    per_host_pages = pages.groupBy(url_host(F.col("url")).alias("host")).agg(
        F.count(F.lit(1)).alias("n_pages")
    )
    flagged = edges.select(
        url_host(F.col("src_id")).alias("src_host"),
        url_host(F.col("dst_id")).alias("dst_host"),
    )
    out_stats = flagged.groupBy(F.col("src_host").alias("host")).agg(
        F.count(F.lit(1)).alias("out_links"),
        F.sum(
            (F.col("src_host") == F.col("dst_host")).cast("long")
        ).alias("intra_links"),
    )
    in_stats = flagged.groupBy(F.col("dst_host").alias("host")).agg(
        F.count(F.lit(1)).alias("in_links")
    )
    return (
        per_host_pages.join(out_stats, "host", "left")
        .join(in_stats, "host", "left")
        .select(
            "host",
            "n_pages",
            F.coalesce("out_links", F.lit(0)).alias("out_links"),
            F.coalesce("in_links", F.lit(0)).alias("in_links"),
            F.coalesce("intra_links", F.lit(0)).alias("intra_links"),
            F.when(
                F.coalesce("out_links", F.lit(0)) > 0,
                F.col("intra_links") / F.col("out_links"),
            )
            .otherwise(F.lit(0.0))
            .alias("intra_ratio"),
        )
    )
