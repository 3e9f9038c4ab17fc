"""Host-level webgraph rollup (pipeline/hostgraph.py).

Multi-host synthesis (``synth_pages(n_hosts=...)``) + any-host mining
must produce the arithmetically expected page links with per-page
hosts; ``host_edges`` must equal a hand-computed rollup (both intra
classes); ``host_stats`` must tie out against direct counting; and the
single-host default must remain byte-identical to the original URLs so
the pages_* oracle rows stay valid.
"""

from collections import Counter, defaultdict

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from k2_18_spark.pipeline.hostgraph import host_edges, host_stats, url_host
from k2_18_spark.pipeline.linkgraph import (
    LINK_RULE_EVEN,
    LINK_RULES,
    PAGE_URL_PREFIX,
    pages_link_pipeline,
    synth_pages,
)

N_DOCS = 40
N_HOSTS = 4


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=i, text=f"host test body {i}", lang="en")
        for i in range(N_DOCS)
    ]
    rows[11] = Row(doc_id=11, text=None, lang="en")  # NULL-text page
    return spark.createDataFrame(rows)


def _expected_page_links() -> list[tuple[int, int]]:
    out = []
    for i in range(N_DOCS):
        if i == 11:  # NULL text → no html → no links
            continue
        for m, o in LINK_RULES:
            out.append((i, (i * m + o) % N_DOCS))
        if i % 2 == 0:
            m, o = LINK_RULE_EVEN
            out.append((i, (i * m + o) % N_DOCS))
    return out


def _url(i: int) -> str:
    return f"https://h{i % N_HOSTS}.example.org/page/{i}"


def test_single_host_default_urls_unchanged(spark, docs):
    urls = [
        r["url"]
        for r in synth_pages(docs, N_DOCS).select("url").orderBy("url").collect()
    ]
    assert all(u.startswith(PAGE_URL_PREFIX) for u in urls)
    assert f"{PAGE_URL_PREFIX}0" in urls and f"{PAGE_URL_PREFIX}39" in urls


def test_multihost_mined_links_match_rules(spark, docs):
    _, edges = pages_link_pipeline(spark, docs, N_DOCS, n_hosts=N_HOSTS)
    got = sorted(
        (r["src_id"], r["dst_id"])
        for r in edges.select("src_id", "dst_id").collect()
    )
    want = sorted((_url(s), _url(t)) for s, t in _expected_page_links())
    assert got == want


def test_url_host_extraction(spark):
    df = spark.createDataFrame(
        [
            ("https://h3.example.org/page/7",),
            ("http://EXAMPLE.com/x?q=1",),
            ("https://a.b.c:8080/",),
            ("not a url",),
        ],
        ["url"],
    )
    got = [r[0] for r in df.select(url_host(F.col("url"))).collect()]
    assert got == ["h3.example.org", "example.com", "a.b.c:8080", ""]


def test_host_edges_rollup_matches_manual(spark, docs):
    _, edges = pages_link_pipeline(spark, docs, N_DOCS, n_hosts=N_HOSTS)

    expect = Counter(
        (f"h{s % N_HOSTS}.example.org", f"h{t % N_HOSTS}.example.org")
        for s, t in _expected_page_links()
    )
    # include_intra=True keeps same-host pairs
    got = {
        (r["src_host"], r["dst_host"]): (r["n_links"], r["weight"])
        for r in host_edges(edges, include_intra=True).collect()
    }
    assert set(got) == set(expect)
    for pair, n in expect.items():
        assert got[pair] == (n, float(n))

    # default drops intra-host pairs entirely
    inter = {
        (r["src_host"], r["dst_host"]) for r in host_edges(edges).collect()
    }
    assert inter == {p for p in expect if p[0] != p[1]}


def test_host_stats_tie_out(spark, docs):
    pages, edges = pages_link_pipeline(spark, docs, N_DOCS, n_hosts=N_HOSTS)
    links = _expected_page_links()
    out = defaultdict(int)
    intra = defaultdict(int)
    inn = defaultdict(int)
    for s, t in links:
        hs, ht = f"h{s % N_HOSTS}.example.org", f"h{t % N_HOSTS}.example.org"
        out[hs] += 1
        inn[ht] += 1
        if hs == ht:
            intra[hs] += 1
    stats = {r["host"]: r.asDict() for r in host_stats(pages, edges).collect()}
    assert len(stats) == N_HOSTS
    for h, row in stats.items():
        assert row["n_pages"] == sum(
            1 for i in range(N_DOCS) if f"h{i % N_HOSTS}" == h.split(".")[0]
        )
        assert row["out_links"] == out[h]
        assert row["in_links"] == inn[h]
        assert row["intra_links"] == intra[h]
        if out[h]:
            assert abs(row["intra_ratio"] - intra[h] / out[h]) < 1e-12


def test_rollup_shuffles_only_host_pairs(spark, docs):
    _, edges = pages_link_pipeline(spark, docs, N_DOCS, n_hosts=N_HOSTS)
    plan = host_edges(edges)._jdf.queryExecution().executedPlan().toString()
    # partial + final HashAggregate around ONE host-keyed exchange:
    # the map-side combine collapses page links before the shuffle, so
    # shuffle volume is O(distinct host pairs), not O(|E|)
    assert plan.count("HashAggregate") >= 2
    assert "hashpartitioning(src_host" in plan
