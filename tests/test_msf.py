"""Borůvka minimum spanning forest (graph/msf.py, G41) vs a Kruskal
union-find replica under the same (weight, a, b) total order, plus
topology / tie-break / determinism behavior."""

import random

import networkx as nx
import pytest

from k2_18_spark.graph import msf as msf_mod
from k2_18_spark.graph.msf import minimum_spanning_forest


def _edges_df(spark, weighted_list):
    return spark.createDataFrame(
        [(f"V{a}", f"V{b}", "LINK", float(w)) for a, b, w in weighted_list],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _kruskal(weighted_list):
    """Unique MSF under the strict (w, a, b) total order on canonical
    string endpoints — the engine's documented contract."""
    pair_min = {}
    for a, b, w in weighted_list:
        sa, sb = f"V{a}", f"V{b}"
        if sa == sb:
            continue
        key = (min(sa, sb), max(sa, sb))
        if key not in pair_min or w < pair_min[key]:
            pair_min[key] = float(w)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for (a, b), w in sorted(pair_min.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def _got(spark, wl, **kw):
    return {
        (r["src_id"], r["dst_id"], r["weight"])
        for r in minimum_spanning_forest(spark, _edges_df(spark, wl), **kw).collect()
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_msf_matches_kruskal_distinct_weights(spark, seed):
    rng = random.Random(seed)
    n, m = 30, 90
    weights = rng.sample(range(1, 100000), m)  # distinct → unique MSF
    wl = [
        (rng.randrange(n), rng.randrange(n), w / 1000.0) for w in weights
    ]
    want = _kruskal(wl)
    got = _got(spark, wl)
    assert got == want
    # cross-check against networkx on the same folded simple graph
    g = nx.Graph()
    for a, b, w in wl:
        if a == b:
            continue
        if g.has_edge(a, b):
            w = min(w, g[a][b]["weight"])
        g.add_edge(a, b, weight=float(w))
    nx_total = sum(
        d["weight"] for _u, _v, d in nx.minimum_spanning_edges(g, data=True)
    )
    assert sum(w for _a, _b, w in got) == pytest.approx(nx_total, abs=1e-9)


def test_msf_all_equal_weights_tie_break(spark):
    # every weight identical: the (w, a, b) order makes the MSF the
    # lexicographically-first spanning forest — Kruskal replica agrees
    rng = random.Random(7)
    wl = [(rng.randrange(12), rng.randrange(12), 1.0) for _ in range(40)]
    assert _got(spark, wl) == _kruskal(wl)


def test_msf_forest_on_disconnected_graph(spark):
    wl = [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 3.0),       # triangle A
          (10, 11, 1.0), (11, 12, 5.0), (10, 12, 4.0)]  # triangle B
    got = _got(spark, wl)
    assert got == {("V0", "V1", 1.0), ("V1", "V2", 2.0),
                   ("V10", "V11", 1.0), ("V10", "V12", 4.0)}


def test_msf_cycle_drops_heaviest_edge(spark):
    n = 17
    wl = [(i, (i + 1) % n, float(i + 1)) for i in range(n)]  # weights 1..n
    got = _got(spark, wl)
    assert len(got) == n - 1
    assert max(w for _a, _b, w in got) == float(n - 1)  # edge w=n dropped


def test_msf_long_chain_hooks(spark):
    # path graph: every edge is in the MSF; exercises long hook chains
    # through the pointer-doubling flatten
    n = 48
    wl = [(i, i + 1, 1.0 + (i % 3)) for i in range(n - 1)]
    got = _got(spark, wl)
    assert len(got) == n - 1
    assert msf_mod.LAST_RUN_ITERATIONS <= 8  # ~log2(48) + terminal round


def test_msf_parallel_edges_and_self_loops(spark):
    wl = [(0, 1, 5.0), (1, 0, 2.0), (0, 1, 9.0), (1, 1, 0.1), (1, 2, 1.0)]
    assert _got(spark, wl) == {("V0", "V1", 2.0), ("V1", "V2", 1.0)}


def test_msf_negative_weights_ok(spark):
    wl = [(0, 1, -2.0), (1, 2, -3.0), (0, 2, 1.0)]
    assert _got(spark, wl) == {("V0", "V1", -2.0), ("V1", "V2", -3.0)}


def test_msf_rejects_nan_weight(spark):
    wl = [(0, 1, float("nan"))]
    with pytest.raises(ValueError, match="NaN"):
        _got(spark, wl)


def test_msf_deterministic(spark):
    rng = random.Random(3)
    wl = [(rng.randrange(20), rng.randrange(20), round(rng.uniform(0, 2), 3))
          for _ in range(60)]
    assert _got(spark, wl) == _got(spark, wl)


def test_msf_distributed_flatten_tier_matches_driver_tier(spark):
    # driver_flatten_max=0 forces the pointer-doubling path on every
    # round; both tiers must produce the identical (unique) MSF
    rng = random.Random(11)
    wl = [(rng.randrange(25), rng.randrange(25), round(rng.uniform(0, 3), 3))
          for _ in range(70)]
    assert _got(spark, wl, driver_flatten_max=0) == _got(spark, wl)


def test_msf_driver_kruskal_tier_matches_distributed(spark):
    # r6 finish tier: driver_kruskal_max=0 forces the pure contraction
    # supersteps to run to quiescence; the default collects the small
    # contracted remainder and finishes with Kruskal — the strict
    # (w, ka, kb) total order makes the MSF unique, so the tiers must
    # agree edge-for-edge (and with both flatten tiers)
    rng = random.Random(17)
    wl = [(rng.randrange(30), rng.randrange(30), round(rng.uniform(0, 3), 3))
          for _ in range(90)]
    full_superstep = _got(spark, wl, driver_kruskal_max=0)
    assert full_superstep == _got(spark, wl)
    assert full_superstep == _got(
        spark, wl, driver_kruskal_max=0, driver_flatten_max=0
    )


def test_msf_empty_and_edgeless(spark):
    assert _got(spark, []) == set()
    nodes = None
    df = _edges_df(spark, [(0, 0, 1.0)])  # only a self-loop → no pairs
    out = minimum_spanning_forest(df.sparkSession, df, nodes)
    assert out.count() == 0
