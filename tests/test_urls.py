"""URL canonicalization / domain functions (functions/urls.py).

Hand-worked cases pin every rule of the documented contract; a
urllib.parse-based replica cross-checks the parser pieces on a fuzzed
corpus (urllib is the stdlib reference for RFC 3986 splitting).
"""

from urllib.parse import urlsplit

import pytest
from pyspark.sql import functions as F

from k2_18_spark.functions.urls import (
    canonical_url,
    surt_key,
    is_http_url,
    registered_domain,
    url_depth,
    url_host,
    url_path,
    url_port,
    url_query,
    url_scheme,
)

CASES = [
    # (input, canonical)
    ("HTTP://WWW.Example.COM/Page/7", "http://www.example.com/Page/7"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:80/x", "http://a.com/x"),
    ("http://a.com:8080/x", "http://a.com:8080/x"),  # non-default kept
    ("https://a.com:80/x", "https://a.com:80/x"),  # 80 not https default
    ("https://a.com", "https://a.com/"),  # empty path -> /
    ("https://a.com/x#frag", "https://a.com/x"),
    ("https://a.com/x?b=2&a=1", "https://a.com/x?a=1&b=2"),
    ("https://a.com/x?utm_source=t&a=1", "https://a.com/x?a=1"),
    ("https://a.com/x?utm_source=t", "https://a.com/x"),  # ? dropped
    ("https://a.com/x?fbclid=1&gclid=2&msclkid=3", "https://a.com/x"),
    ("  https://a.com/x  ", "https://a.com/x"),  # trimmed
    ("https://a.com/CaseKept/Path?Q=UPPER", "https://a.com/CaseKept/Path?Q=UPPER"),
    ("not a url", "not a url"),  # unparsable -> trimmed passthrough
    ("mailto:x@y.z", "mailto:x@y.z"),  # no ://authority
]


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0]["v"]


def test_canonical_url_contract(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [
        r["c"] for r in df.select(canonical_url("url").alias("c")).collect()
    ]
    assert got == [want for _, want in CASES]


def test_parser_pieces_match_urllib(spark):
    urls = [
        "https://Sub.Example.co.uk:8443/A/b/C?z=1&y=2#f",
        "http://h.example.org/",
        "https://x.com/p?a=1",
        "http://x.com:80",
        "ftp://files.example.net/pub/file.txt",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        url_scheme("url").alias("s"),
        url_host("url").alias("h"),
        url_port("url").alias("p"),
        url_path("url").alias("pa"),
        url_query("url").alias("q"),
    ).collect()
    for r in rows:
        ref = urlsplit(r["url"])
        assert r["s"] == ref.scheme.lower()
        assert r["h"] == (ref.hostname or "")
        assert r["p"] == (str(ref.port) if ref.port else "")
        assert r["pa"] == ref.path
        assert r["q"] == ref.query


def test_url_depth_and_is_http(spark):
    assert _one(spark, url_depth(F.lit("https://a.com/x/y/z"))) == 3
    assert _one(spark, url_depth(F.lit("https://a.com/"))) == 0
    assert _one(spark, url_depth(F.lit("https://a.com"))) == 0
    assert _one(spark, is_http_url(F.lit("https://a.com"))) is True
    assert _one(spark, is_http_url(F.lit("ftp://a.com"))) is False
    assert _one(spark, is_http_url(F.lit("nope"))) is False


@pytest.mark.parametrize(
    "inp,want",
    [
        ("https://www.example.com/x", "example.com"),
        ("https://a.b.c.example.co.uk/", "example.co.uk"),
        ("https://example.co.uk", "example.co.uk"),
        ("http://deep.sub.example.com.au:8080/p", "example.com.au"),
        ("WWW.Example.COM", "example.com"),  # bare host accepted
        ("localhost", ""),  # no dot
        ("https://co.uk/", "co.uk"),  # 2 labels: no +1 available
    ],
)
def test_registered_domain(spark, inp, want):
    assert _one(spark, registered_domain(F.lit(inp))) == want


def test_registered_domain_extra_suffixes(spark):
    got = _one(
        spark,
        registered_domain(
            F.lit("https://a.b.example.github.io/"),
            extra_suffixes=("github.io",),
        ),
    )
    assert got == "example.github.io"


def test_canonical_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) on every contract case."""
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    rows = df.select(
        canonical_url("url").alias("c1"),
        canonical_url(canonical_url("url")).alias("c2"),
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"]


@pytest.mark.parametrize(
    "inp,want",
    [
        ("https://www.Example.com/a?b=2&a=1", "com,example,www)/a?a=1&b=2"),
        ("http://sub.h.example.co.uk:8080/P", "uk,co,example,h,sub:8080)/P"),
        ("https://a.com:443", "com,a)/"),
        ("https://a.com/x#frag", "com,a)/x"),
        ("not a url", ""),
    ],
)
def test_surt_key(spark, inp, want):
    assert _one(spark, surt_key(F.lit(inp))) == want


def test_surt_prefix_groups_subdomains(spark):
    urls = ["https://a.example.com/1", "https://b.example.com/2",
            "https://example.org/3"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = [r["s"] for r in df.select(surt_key("url").alias("s")).collect()]
    assert sum(s.startswith("com,example,") for s in rows) == 2
