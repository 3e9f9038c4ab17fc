"""Sitemap parsing (sitemaps.org XML protocol) — the discovery-side
companion to robots.txt (:mod:`k2_18_spark.functions.robots` surfaces
the ``Sitemap:`` pointers; this module parses what they point at).

Handles both document kinds:

- ``<urlset>`` → one row per ``<url>``: loc, lastmod, changefreq,
  priority
- ``<sitemapindex>`` → one row per ``<sitemap>``: loc, lastmod (kind
  ``index`` — feed the locs back through the fetcher for the next
  level)

Parsing is an Arrow-batched ``mapInPandas`` using stdlib
``xml.etree.ElementTree`` — namespace-tolerant (matches on local tag
names, so the canonical ``http://www.sitemaps.org/schemas/sitemap/0.9``
namespace, none, or a vendor variant all parse), entity-safe (ElementTree
does not resolve external entities), and strict-by-default with a
``lenient`` mode that skips unparsable blobs (the crawl-recovery
contract shared with :mod:`k2_18_spark.io.warc`).

Scale shape: sitemaps are per-host artifacts (≤50k URLs each per the
protocol) — a side table next to the frontier, parsed where the bytes
sit; only (host, loc, metadata) rows move on.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)


class SitemapFormatError(ValueError):
    """Unparsable sitemap XML (strict mode)."""


_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("kind", StringType()),  # urlset | index
        StructField("loc", StringType()),
        StructField("lastmod", StringType()),
        StructField("changefreq", StringType()),
        StructField("priority", DoubleType()),
    ]
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _text(entry, name: str) -> str | None:
    for child in entry:
        if _local(child.tag) == name:
            return child.text.strip() if child.text else None
    return None


def _parse_one(host: str, xml_text: str, lenient: bool) -> list[tuple]:
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as e:
        if lenient:
            return []
        raise SitemapFormatError(f"unparsable sitemap for {host}: {e}")
    root_tag = _local(root.tag)
    if root_tag == "urlset":
        kind, entry_tag = "urlset", "url"
    elif root_tag == "sitemapindex":
        kind, entry_tag = "index", "sitemap"
    else:
        if lenient:
            return []
        raise SitemapFormatError(
            f"unexpected root <{root_tag}> in sitemap for {host}"
        )
    rows = []
    for entry in root:
        if _local(entry.tag) != entry_tag:
            continue
        loc = _text(entry, "loc")
        if not loc:
            continue  # loc is mandatory per the protocol; skip the entry
        prio_raw = _text(entry, "priority")
        try:
            prio = float(prio_raw) if prio_raw is not None else None
        except ValueError:
            prio = None
        rows.append(
            (
                host,
                kind,
                loc,
                _text(entry, "lastmod"),
                _text(entry, "changefreq"),
                prio,
            )
        )
    return rows


def parse_sitemaps(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
    lenient: bool = False,
) -> DataFrame:
    """Parse per-host sitemap XML blobs → one row per entry:
    (host, kind, loc, lastmod, changefreq, priority)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[tuple] = []
            for host, xml_text in zip(b[host_col], b[xml_col]):
                rows.extend(_parse_one(host, xml_text or "", lenient))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _SCHEMA.fields]
            )

    return sitemaps.mapInPandas(run, _SCHEMA)
