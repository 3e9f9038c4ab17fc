"""Common-Crawl-style pages → hyperlink edge table (the north-rule path).

The driver input_hint fixes the input shape: an Iceberg/parquet table of
web pages with columns ``(url string, warc_ts timestamp, html binary,
text string, lang string)``. This module is the end-to-end pipeline the
north star describes over that shape:

1. ``synth_pages`` — deterministic DISTRIBUTED synthesis of a pages
   table from any ``(doc_id, text, lang)`` corpus. Pure column
   expressions (no driver loop, no ``collect``): at 10^12 documents
   this is a map-only stage that scales with the source table. Each
   page embeds a ``<script>``/``<style>`` block on a deterministic
   schedule (so the extractor has real work) plus 2–3 hyperlinks to
   other pages computed with modular arithmetic (so the mined link
   graph is deterministic, connected-ish, and non-bipartite).
2. ``extract_text`` — the real extractor chain (utf-8→cp1251→latin1
   decode fallback + NFC + script/style span-cut; reference semantics
   ``src/slicer.py:163-241``) as ONE vectorized pandas UDF over the
   binary ``html`` column. The UDF body runs once per Arrow batch;
   per-url output is byte-identical to ``functions.text.preprocess_
   text(decode_bytes(html))``.
3. ``mine_links`` — hyperlink edge mining from the extracted text via
   ``regexp_extract_all`` + ``explode`` (JVM codegen, zero Python),
   producing the ``(src_id, dst_id, edge_type, weight)`` edge-table
   shape every superstep loop in ``k2_18_spark.graph`` consumes.

``__spark_entry__.py`` wires this into two driver-oracle queries:
``pages_linkgraph`` (synthesis → extraction → mining → degrees, with
an md5 checksum of every extracted text so the DuckDB oracle verifies
extraction byte-for-byte) and ``pages_pagerank`` (PageRank-to-
convergence over the mined edges vs the recursive-CTE oracle).
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k2_18_spark.functions.text import extract_udf

PAGE_URL_PREFIX = "https://example.org/page/"
#: (multiplier, offset) for each deterministic outbound link; the third
#: link exists only on even doc_ids so out-degrees vary (2 or 3).
LINK_RULES = ((7, 1), (13, 3))
LINK_RULE_EVEN = (3, 5)
_WARC_EPOCH = 1767225600  # 2026-01-01T00:00:00Z


def _page_url(doc_id_col, n_hosts: int = 1):
    """Deterministic page URL; with ``n_hosts > 1`` pages spread across
    ``h{doc_id % n_hosts}.example.org`` subdomain hosts (Common-Crawl
    host-graph shape) while ``n_hosts=1`` keeps the original single-host
    URLs byte-identical."""
    if n_hosts <= 1:
        return F.concat(F.lit(PAGE_URL_PREFIX), doc_id_col.cast("string"))
    return F.concat(
        F.lit("https://h"),
        F.pmod(doc_id_col, F.lit(n_hosts)).cast("string"),
        F.lit(".example.org/page/"),
        doc_id_col.cast("string"),
    )


def _anchor(did, dst, varied: bool):
    """Anchor text for a link src ``did`` → ``dst``: the constant ``r``
    by default (keeps the original synthesis byte-identical), or a
    deterministic ``t{(src+dst)%5}`` token with ``varied=True`` so each
    target accumulates a skewed multiset of anchor texts — the shape
    the anchor-rollup artifact needs."""
    if not varied:
        return F.lit("r")
    return F.concat(F.lit("t"), F.pmod(did + dst, F.lit(5)).cast("string"))


def synth_pages(
    docs: DataFrame, n_docs: int, n_hosts: int = 1, varied_anchors: bool = False
) -> DataFrame:
    """(doc_id, text, lang) → (url, warc_ts, html binary, text, lang).

    ``text`` is left NULL — it is the EXTRACTED text column and is
    filled by :func:`extract_text`, mirroring a crawl table where the
    raw WARC payload lands first. ``n_docs`` is the corpus size used
    by the modular link rules (one scalar, computed once upstream).
    ``n_hosts`` spreads pages across that many deterministic hosts
    (hrefs always carry the dst page's own host). ``varied_anchors``
    swaps the constant anchor text for per-(src,dst) tokens (see
    :func:`_anchor`); the default stays byte-identical to the original
    synthesis so the pages_* extraction checksums are unchanged.
    """
    did = F.col("doc_id")
    parts = [
        F.lit("<html><body>\n<h1>Doc "),
        did.cast("string"),
        F.lit("</h1>\n"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit("<script>var x="), did.cast("string"), F.lit(";</script>\n")
            ),
        ).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit("<style>p{color:red}</style>\n")).otherwise(
            F.lit("")
        ),
        F.lit("<p>"),
        F.col("text"),
        F.lit("</p>\n"),
    ]
    for mult, off in LINK_RULES:
        dst = F.pmod(did * mult + off, F.lit(n_docs))
        parts += [
            F.lit('<a href="'),
            _page_url(dst, n_hosts),
            F.lit('">'),
            _anchor(did, dst, varied_anchors),
            F.lit("</a>\n"),
        ]
    em, eo = LINK_RULE_EVEN
    dst_even = F.pmod(did * em + eo, F.lit(n_docs))
    parts.append(
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit('<a href="'),
                _page_url(dst_even, n_hosts),
                F.lit('">'),
                _anchor(did, dst_even, varied_anchors),
                F.lit("</a>\n"),
            ),
        ).otherwise(F.lit(""))
    )
    parts.append(F.lit("</body></html>\n"))
    return docs.select(
        _page_url(did, n_hosts).alias("url"),
        F.timestamp_seconds(F.lit(_WARC_EPOCH) + did * 60).alias("warc_ts"),
        F.encode(F.concat(*parts), "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )


def extract_text(pages: DataFrame) -> DataFrame:
    """Fill ``text`` from ``html`` with the vectorized extractor UDF."""
    return pages.withColumn("text", extract_udf("html"))


def mine_links(
    pages: DataFrame, url_prefix: str | None = PAGE_URL_PREFIX
) -> DataFrame:
    """Extracted text → (src_id, dst_id, edge_type, weight) edge table.

    Duplicate anchors yield duplicate edge rows; degree queries count
    them, while the superstep loops' adjacency build collapses parallel
    edges to one row per (src,dst) (reference metrics-view semantics,
    ``graph/adjacency.py::_collapse_multi`` — with the uniform 1.0
    weight that equals DISTINCT). Entirely JVM-side: regexp_extract_all
    + explode.

    ``url_prefix=None`` mines ANY absolute http(s) href (multi-host
    crawls); otherwise only links under the given prefix are kept.
    """
    if url_prefix is None:
        pat = 'href="(https?://[^"]+)"'
        return pages.select(
            F.col("url").alias("src_id"),
            F.explode(
                F.regexp_extract_all("text", F.lit(pat), F.lit(1))
            ).alias("dst_id"),
            F.lit("HYPERLINK").alias("edge_type"),
            F.lit(1.0).alias("weight"),
        )
    escaped = (
        url_prefix.replace("\\", "\\\\").replace(".", "\\.").replace("/", "/")
    )
    pat = 'href="' + escaped + '(\\d+)"'
    return (
        pages.select(
            F.col("url").alias("src_id"),
            F.explode(
                F.regexp_extract_all("text", F.lit(pat), F.lit(1))
            ).alias("dst_num"),
        )
        .select(
            "src_id",
            F.concat(F.lit(url_prefix), F.col("dst_num")).alias("dst_id"),
            F.lit("HYPERLINK").alias("edge_type"),
            F.lit(1.0).alias("weight"),
        )
    )


def pages_link_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    n_docs: int | None = None,
    n_hosts: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Full path: synthesize → extract → mine. Returns (pages, edges)."""
    if n_docs is None:
        n_docs = docs.count()
    pages = extract_text(synth_pages(docs, n_docs, n_hosts=n_hosts))
    prefix = PAGE_URL_PREFIX if n_hosts <= 1 else None
    return pages, mine_links(pages, url_prefix=prefix)


def mine_anchors(
    pages: DataFrame, url_prefix: str | None = PAGE_URL_PREFIX
) -> DataFrame:
    """Extracted text → (src_id, dst_id, anchor) — one row per hyperlink
    WITH its anchor text (the Common-Crawl anchor-artifact input).

    Entirely JVM-side: two ``regexp_extract_all`` passes over the same
    ``<a href="URL">TEXT</a>`` pattern (group 1 = url, group 2 = text)
    zipped positionally with ``arrays_zip`` — no Python, no shuffle;
    a pure map stage that scales with the page table like
    :func:`mine_links`.
    """
    if url_prefix is None:
        pat = 'href="(https?://[^"]+)">([^<]*)</a>'
        url_expr = F.col("z.u")
    else:
        escaped = url_prefix.replace("\\", "\\\\").replace(".", "\\.")
        pat = 'href="' + escaped + '(\\d+)">([^<]*)</a>'
        url_expr = F.concat(F.lit(url_prefix), F.col("z.u"))
    lit = F.lit(pat)
    return (
        pages.select(
            F.col("url").alias("src_id"),
            F.explode(
                F.arrays_zip(
                    F.regexp_extract_all("text", lit, F.lit(1)).alias("u"),
                    F.regexp_extract_all("text", lit, F.lit(2)).alias("a"),
                )
            ).alias("z"),
        )
        .select(
            "src_id",
            url_expr.alias("dst_id"),
            F.col("z.a").alias("anchor"),
        )
    )


def anchor_topk(anchors: DataFrame, k: int = 3) -> DataFrame:
    """Per-target anchor-text rollup → one row per (dst_id, anchor) in
    the target's top-``k``: (url, anchor, cnt, rnk, n_anchors, n_texts).

    Two-phase plan for skewed targets: ONE map-side-combinable
    ``groupBy(dst_id, anchor)`` count collapses the edge-sized input to
    the distinct (target, text) pairs, and BOTH the top-k window and
    the per-target totals are computed from that collapsed table — the
    |E|-sized table is shuffled once, on a two-column key that spreads
    a hub target's rows across its distinct anchor texts.
    """
    from pyspark.sql import Window

    counts = anchors.groupBy("dst_id", "anchor").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.groupBy("dst_id").agg(
        F.sum("cnt").alias("n_anchors"),
        F.count(F.lit(1)).alias("n_texts"),
    )
    w = Window.partitionBy("dst_id").orderBy(
        F.desc("cnt"), F.asc("anchor")
    )
    top = (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
    return (
        top.join(totals, "dst_id")
        .select(
            F.col("dst_id").alias("url"),
            "anchor",
            "cnt",
            "rnk",
            "n_anchors",
            "n_texts",
        )
    )
