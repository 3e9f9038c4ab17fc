"""BFS distances + double-sweep pseudo-diameter (graph/diameter.py)
vs networkx on hand-worked and seeded random graphs."""

import random

import networkx as nx
import pytest

from k2_18_spark.graph.diameter import bfs_distances, pseudo_diameter


def _edges_df(spark, edge_list):
    return spark.createDataFrame(
        [(f"V{a}", f"V{b}", "LINK", 1.0) for a, b in edge_list],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _src_df(spark, ids):
    return spark.createDataFrame([(f"V{i}",) for i in ids], "id string")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bfs_matches_nx(spark, seed):
    rng = random.Random(seed)
    edge_list = [(rng.randrange(20), rng.randrange(20)) for _ in range(35)]
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in edge_list if a != b)
    src = min(g.nodes)
    want = {
        f"V{v}": d for v, d in nx.single_source_shortest_path_length(g, src).items()
    }
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(
            spark, _edges_df(spark, edge_list), _src_df(spark, [src])
        ).collect()
    }
    assert got == want


def test_bfs_multi_source_takes_min(spark):
    edge_list = [(0, 1), (1, 2), (2, 3), (3, 4)]
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(
            spark, _edges_df(spark, edge_list), _src_df(spark, [0, 4])
        ).collect()
    }
    assert got == {"V0": 0, "V4": 0, "V1": 1, "V3": 1, "V2": 2}


def test_bfs_directed(spark):
    edge_list = [(0, 1), (1, 2), (3, 0)]
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(
            spark, _edges_df(spark, edge_list), _src_df(spark, [0]), directed=True
        ).collect()
    }
    assert got == {"V0": 0, "V1": 1, "V2": 2}  # V3 upstream, unreached


def test_pseudo_diameter_exact_on_path(spark):
    edge_list = [(i, i + 1) for i in range(9)]
    row = pseudo_diameter(spark, _edges_df(spark, edge_list)).collect()[0]
    assert row["start_id"] == "V0"
    assert row["diameter_lb"] == 9 and row["n_reached"] == 10


def test_pseudo_diameter_is_lower_bound_and_component_confined(spark):
    rng = random.Random(7)
    edge_list = [(rng.randrange(15), rng.randrange(15)) for _ in range(25)]
    edge_list += [(20, 21), (21, 22)]  # separate component
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in edge_list if a != b)
    row = pseudo_diameter(spark, _edges_df(spark, edge_list)).collect()[0]
    start = int(row["start_id"][1:])
    comp = nx.node_connected_component(g, start)
    true_diam = nx.diameter(g.subgraph(comp))
    assert row["n_reached"] == len(comp)
    assert row["sweep1_ecc"] <= row["diameter_lb"] <= true_diam


def test_pseudo_diameter_empty(spark):
    df = _edges_df(spark, [])
    assert pseudo_diameter(spark, df).count() == 0
