"""Per-community conductance (graph/stats.py) vs
nx.algorithms.cuts.conductance on seeded random weighted graphs.

Contract (module docstring): undirected weighted multigraph, each row
one undirected edge (parallel rows sum), cut/volume per nx semantics,
conductance = cut / min(vol, total_vol - vol), NULL when a side is
empty or the community spans the whole graph."""

import random

import networkx as nx
import pytest

from k2_18_spark.graph.stats import conductance_by_community


def _edges_df(spark, rows):
    return spark.createDataFrame(
        [(f"V{a}", f"V{b}", "L", float(w)) for a, b, w in rows],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _clusters_df(spark, assign):
    return spark.createDataFrame(
        [(f"V{v}", int(c)) for v, c in assign.items()], "id string, cluster_id int"
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_nx(spark, seed):
    rng = random.Random(seed)
    rows, g = [], nx.Graph()
    for _ in range(40):
        a, b = rng.randrange(14), rng.randrange(14)
        w = rng.choice([1.0, 2.0, 0.5])
        rows.append((a, b, w))
        if g.has_edge(a, b):
            g[a][b]["weight"] += w
        else:
            g.add_edge(a, b, weight=w)
    assign = {v: v % 3 for v in g.nodes}
    got = {
        r["cluster_id"]: (r["cut_w"], r["volume"], r["conductance"])
        for r in conductance_by_community(
            spark, _edges_df(spark, rows), _clusters_df(spark, assign)
        ).collect()
    }
    for c in set(assign.values()):
        S = {v for v, cc in assign.items() if cc == c}
        T = set(g.nodes) - S
        cut = nx.cut_size(g, S, T, weight="weight")
        vol = nx.volume(g, S, weight="weight")
        phi = nx.conductance(g, S, T, weight="weight") if T and S else None
        gc, gv, gp = got[c]
        assert abs(gc - cut) < 1e-9, c
        assert abs(gv - vol) < 1e-9, c
        assert abs(gp - phi) < 1e-9, c


def test_isolated_community_zero_cut(spark):
    rows = [(0, 1, 1.0), (1, 2, 1.0), (5, 6, 1.0)]
    assign = {0: 0, 1: 0, 2: 0, 5: 1, 6: 1}
    got = {
        r["cluster_id"]: r for r in conductance_by_community(
            spark, _edges_df(spark, rows), _clusters_df(spark, assign)
        ).collect()
    }
    assert got[1]["cut_w"] == 0.0 and got[1]["conductance"] == 0.0


def test_whole_graph_community_null(spark):
    rows = [(0, 1, 1.0), (1, 2, 1.0)]
    assign = {0: 0, 1: 0, 2: 0}
    row = conductance_by_community(
        spark, _edges_df(spark, rows), _clusters_df(spark, assign)
    ).collect()[0]
    assert row["conductance"] is None  # complement side is empty


def test_self_loop_counts_double_in_volume(spark):
    rows = [(0, 0, 1.0), (0, 1, 1.0), (1, 2, 1.0)]
    assign = {0: 0, 1: 1, 2: 1}
    got = {
        r["cluster_id"]: r for r in conductance_by_community(
            spark, _edges_df(spark, rows), _clusters_df(spark, assign)
        ).collect()
    }
    # deg(V0) = 2 (loop) + 1 = 3; cut = the 0-1 edge
    assert got[0]["volume"] == 3.0 and got[0]["cut_w"] == 1.0
    assert abs(got[0]["conductance"] - 1.0 / 3.0) < 1e-12
