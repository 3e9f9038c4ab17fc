"""Redirect resolution (pipeline/redirects.py) vs a step-by-step
Python follower on hand-worked and seeded random redirect maps.

Contract: resolved ⇔ terminal reached within max_hops; cycles,
self-redirects, and over-long chains are unresolved with NULL
final/hops; conflicting redirects collapse to min(dst)."""

import random

import pytest

from k2_18_spark.pipeline.redirects import apply_redirects, resolve_redirects


def _df(spark, pairs):
    return spark.createDataFrame(
        [(s, d) for s, d in pairs], "src_url string, dst_url string"
    )


def _brute(pairs, max_hops):
    nxt = {}
    for s, d in pairs:
        nxt[s] = min(nxt.get(s, d), d)
    out = {}
    for s in nxt:
        ptr, hops = nxt[s], 1
        while ptr in nxt and hops <= max_hops:
            ptr = nxt[ptr]
            hops += 1
        if ptr not in nxt and hops <= max_hops:
            out[s] = (ptr, hops, True)
        else:
            out[s] = (None, None, False)
    return out


def _collect(df):
    return {
        r["src_url"]: (r["final_url"], r["hops"], r["resolved"])
        for r in df.collect()
    }


def test_chain_cycle_selfloop(spark):
    pairs = [
        ("a", "b"), ("b", "c"), ("c", "T"),          # chain len 3 -> T
        ("x", "y"), ("y", "x"),                      # 2-cycle
        ("s", "s"),                                  # self-redirect
        ("p", "q"),                                  # 1 hop
    ]
    got = _collect(resolve_redirects(spark, _df(spark, pairs), max_hops=20))
    assert got == {
        "a": ("T", 3, True),
        "b": ("T", 2, True),
        "c": ("T", 1, True),
        "x": (None, None, False),
        "y": (None, None, False),
        "s": (None, None, False),
        "p": ("q", 1, True),
    }


def test_max_hops_cap(spark):
    # chain 0->1->...->10 (10 hops from node 0)
    pairs = [(f"u{i}", f"u{i+1}") for i in range(10)]
    got = _collect(resolve_redirects(spark, _df(spark, pairs), max_hops=4))
    assert got == _brute(pairs, 4)
    assert got["u0"] == (None, None, False)       # 10 hops > 4
    assert got["u6"] == ("u10", 4, True)          # exactly at the cap
    assert got["u7"] == ("u10", 3, True)


def test_conflicting_redirects_min_dst(spark):
    pairs = [("a", "z"), ("a", "b"), ("b", "T")]
    got = _collect(resolve_redirects(spark, _df(spark, pairs), max_hops=5))
    assert got["a"] == ("T", 2, True)  # min("z","b") = "b" -> T


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_maps(spark, seed):
    rng = random.Random(seed)
    # random functional map over 40 urls: dense enough for long chains
    # AND cycles; ~25% of nodes are redirect sources to a random target
    pairs = [
        (f"u{i}", f"u{rng.randrange(40)}")
        for i in range(40)
        if rng.random() < 0.6
    ]
    for max_hops in (1, 3, 20):
        got = _collect(
            resolve_redirects(spark, _df(spark, pairs), max_hops=max_hops)
        )
        assert got == _brute(pairs, max_hops), (seed, max_hops)


def test_apply_redirects(spark):
    pairs = [("a", "b"), ("b", "T"), ("x", "y"), ("y", "x")]
    res = resolve_redirects(spark, _df(spark, pairs), max_hops=10)
    edges = spark.createDataFrame(
        [
            ("a", "n1", "LINK", 1.0),   # src rewrites to T
            ("n2", "b", "LINK", 1.0),   # dst rewrites to T
            ("n3", "n4", "LINK", 1.0),  # untouched
            ("x", "n5", "LINK", 1.0),   # unresolved src -> dropped
            ("n6", "y", "LINK", 1.0),   # unresolved dst -> dropped
        ],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    got = {
        (r["src_id"], r["dst_id"])
        for r in apply_redirects(edges, res).collect()
    }
    assert got == {("T", "n1"), ("n2", "T"), ("n3", "n4")}
