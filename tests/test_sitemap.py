"""Sitemap XML parsing (functions/sitemap.py): protocol-literal
fixtures (namespaced urlset, bare index), malformed handling."""

import pytest

from k2_18_spark.functions.sitemap import parse_sitemaps

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://h.example/a</loc>
    <lastmod>2026-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://h.example/b</loc></url>
  <url><priority>0.5</priority></url>
</urlset>
"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://h.example/s1.xml</loc>
           <lastmod>2026-02-01</lastmod></sitemap>
  <sitemap><loc>https://h.example/s2.xml</loc></sitemap>
</sitemapindex>
"""


def _df(spark, rows):
    return spark.createDataFrame(rows, "host string, sitemap_xml string")


def test_urlset_and_index(spark):
    out = parse_sitemaps(
        _df(spark, [("h.example", URLSET), ("h.example", INDEX)])
    ).collect()
    by_loc = {r["loc"]: r for r in out}
    # the loc-less <url> entry is skipped (loc mandatory)
    assert set(by_loc) == {
        "https://h.example/a",
        "https://h.example/b",
        "https://h.example/s1.xml",
        "https://h.example/s2.xml",
    }
    a = by_loc["https://h.example/a"]
    assert (a["kind"], a["lastmod"], a["changefreq"], a["priority"]) == (
        "urlset", "2026-01-05", "daily", 0.8,
    )
    b = by_loc["https://h.example/b"]
    assert b["lastmod"] is None and b["priority"] is None
    s1 = by_loc["https://h.example/s1.xml"]
    assert s1["kind"] == "index" and s1["lastmod"] == "2026-02-01"


def test_strict_raises_lenient_skips(spark):
    bad = [("h1", "<urlset><url><loc>x</loc>"), ("h2", URLSET)]
    with pytest.raises(Exception):
        parse_sitemaps(_df(spark, bad)).collect()
    rows = parse_sitemaps(_df(spark, bad), lenient=True).collect()
    assert {r["host"] for r in rows} == {"h2"}
    assert len(rows) == 2


def test_unexpected_root(spark):
    with pytest.raises(Exception):
        parse_sitemaps(_df(spark, [("h1", "<rss></rss>")])).collect()
    assert (
        parse_sitemaps(_df(spark, [("h1", "<rss></rss>")]), lenient=True).count()
        == 0
    )
