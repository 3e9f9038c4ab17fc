"""Clustering coefficient (graph/triangles.py) vs networkx.

nx.clustering / nx.transitivity on the simple undirected graph define
the contract; parity at 1e-12 (both sides are exact small-integer
ratios in double).
"""

import random

import networkx as nx
import pytest

from k2_18_spark.graph.triangles import clustering_coefficient, transitivity


def _edges_df(spark, edge_list):
    return spark.createDataFrame(
        [(f"V{a}", f"V{b}", "LINK", 1.0) for a, b in edge_list],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _nx_graph(edge_list):
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in edge_list if a != b)
    return g


def _seeded(n=60, m=180, seed=13):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


def test_parity_random(spark):
    edge_list = _seeded()
    g = _nx_graph(edge_list)
    rows = clustering_coefficient(spark, _edges_df(spark, edge_list)).collect()
    want_c = nx.clustering(g)
    want_t = nx.triangles(g)
    assert {r["id"] for r in rows} == {f"V{n}" for n in g.nodes}
    for r in rows:
        n = int(r["id"][1:])
        assert r["degree"] == g.degree(n), r
        assert r["triangle_count"] == want_t[n], r
        assert r["clustering"] == pytest.approx(want_c[n], abs=1e-12), r


def test_transitivity_parity(spark):
    edge_list = _seeded(n=40, m=120, seed=21)
    got = transitivity(spark, _edges_df(spark, edge_list))
    assert got == pytest.approx(nx.transitivity(_nx_graph(edge_list)), abs=1e-12)


def test_conventions(spark):
    # triangle + pendant + isolated-by-self-loop vertex; directed dup
    # and parallel edges collapse
    edge_list = [(0, 1), (1, 2), (2, 0), (1, 0), (2, 3), (4, 4)]
    df = _edges_df(spark, edge_list)
    got = {r["id"]: r for r in clustering_coefficient(spark, df).collect()}
    # V4 has only a self-loop: stays in the vertex set (house
    # convention: raw endpoints) but its simple-projection degree is 0
    assert set(got) == {"V0", "V1", "V2", "V3", "V4"}
    assert got["V4"]["degree"] == 0 and got["V4"]["clustering"] == 0.0
    assert got["V0"]["clustering"] == 1.0
    assert got["V2"]["clustering"] == pytest.approx(1 / 3)
    assert got["V3"]["clustering"] == 0.0  # degree 1
    assert transitivity(spark, df) == pytest.approx(3 * 1 / 5)  # 5 wedges


def test_wedge_free(spark):
    df = _edges_df(spark, [(0, 1), (2, 3)])
    assert transitivity(spark, df) == 0.0
    rows = clustering_coefficient(spark, df).collect()
    assert all(r["clustering"] == 0.0 for r in rows)
