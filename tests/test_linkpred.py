"""Link prediction (graph/linkpred.py) vs networkx.

nx.jaccard_coefficient / nx.adamic_adar_index / nx.common_neighbors
on the simple undirected graph define the contract for NON-edge pairs
with >= 1 common neighbor; parity at 1e-9 (both sides are short exact
sums over the same term set).
"""

import math
import random

import networkx as nx
import pytest

from k2_18_spark.graph.linkpred import link_prediction, top_predictions


def _edges_df(spark, edge_list):
    return spark.createDataFrame(
        [(f"V{a}", f"V{b}", "LINK", 1.0) for a, b in edge_list],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _collect(df):
    return {
        (r["id_a"], r["id_b"]): (
            r["common_neighbors"],
            r["jaccard"],
            r["adamic_adar"],
        )
        for r in df.collect()
    }


def _nx_scores(edge_list, include_existing=False):
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in edge_list if a != b)
    out = {}
    nodes = sorted(g.nodes)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if not include_existing and g.has_edge(a, b):
                continue
            common = list(nx.common_neighbors(g, a, b))
            if not common:
                continue
            union = len(set(g[a]) | set(g[b]))
            aa = sum(1.0 / math.log(g.degree(v)) for v in common)
            key = tuple(sorted((f"V{a}", f"V{b}")))
            out[key] = (len(common), len(common) / union, aa)
    return out


def _seeded(n=50, m=120, seed=11):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


def _assert_parity(got, want):
    assert set(got) == set(want)
    for k, (c, j, aa) in want.items():
        gc, gj, gaa = got[k]
        assert gc == c, k
        assert gj == pytest.approx(j, abs=1e-9), k
        assert gaa == pytest.approx(aa, abs=1e-9), k


def test_parity_random_nonedges(spark):
    edge_list = _seeded()
    got = _collect(
        link_prediction(spark, _edges_df(spark, edge_list), max_center_degree=None)
    )
    _assert_parity(got, _nx_scores(edge_list))


def test_parity_include_existing(spark):
    edge_list = _seeded(n=30, m=70, seed=3)
    got = _collect(
        link_prediction(
            spark,
            _edges_df(spark, edge_list),
            max_center_degree=None,
            include_existing=True,
        )
    )
    _assert_parity(got, _nx_scores(edge_list, include_existing=True))


def test_direction_parallel_selfloop_collapse(spark):
    # directed duplicates, a parallel pair, and a self-loop must not
    # change scores on the simple undirected projection
    base = [(0, 1), (0, 2), (1, 2), (2, 3), (1, 3), (3, 4), (0, 4)]
    noisy = base + [(1, 0), (2, 0), (3, 2), (4, 4)]
    got = _collect(
        link_prediction(spark, _edges_df(spark, noisy), max_center_degree=None)
    )
    _assert_parity(got, _nx_scores(base))


def test_hub_cap_drops_hub_wedges(spark):
    # star hub 0 with 6 leaves + a triangle 1-2-7: capping the hub's
    # degree removes leaf-leaf candidates THROUGH the hub but keeps
    # credits from low-degree centers
    star = [(0, i) for i in range(1, 7)]
    tri = [(1, 2), (1, 7), (2, 7)]
    edges = _edges_df(spark, star + tri)
    capped = _collect(link_prediction(spark, edges, max_center_degree=3))
    # V1-V2 are adjacent (dropped); V0-V7 share centers 1 and 2 (deg 3)
    assert ("V0", "V7") in capped
    assert capped[("V0", "V7")][0] == 2
    # leaf-leaf pairs only share the now-capped hub center
    assert ("V3", "V4") not in capped
    uncapped = _collect(link_prediction(spark, edges, max_center_degree=None))
    assert ("V3", "V4") in uncapped


def test_min_common_floor(spark):
    edge_list = _seeded(n=40, m=90, seed=5)
    got = _collect(
        link_prediction(
            spark, _edges_df(spark, edge_list), max_center_degree=None, min_common=2
        )
    )
    want = {k: v for k, v in _nx_scores(edge_list).items() if v[0] >= 2}
    _assert_parity(got, want)


def test_top_predictions_per_vertex(spark):
    edge_list = _seeded(n=40, m=100, seed=9)
    k = 3
    rows = top_predictions(
        spark, _edges_df(spark, edge_list), k=k, max_center_degree=None
    ).collect()
    want = _nx_scores(edge_list)
    per_vertex = {}
    for (a, b), (_, _, aa) in want.items():
        per_vertex.setdefault(a, []).append((-aa, b))
        per_vertex.setdefault(b, []).append((-aa, a))
    got = {}
    for r in rows:
        got.setdefault(r["id"], []).append((-r["adamic_adar"], r["candidate"]))
    for v, cands in got.items():
        expect = sorted(per_vertex[v])[:k]
        cands_sorted = sorted(cands)
        assert [c for _, c in cands_sorted] == [c for _, c in expect], v
        for (ga, _), (ea, _) in zip(cands_sorted, expect):
            assert ga == pytest.approx(ea, abs=1e-9), v
        assert len(cands) <= k
