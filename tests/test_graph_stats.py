"""Global graph stats (graph/stats.py) vs networkx —
nx.overall_reciprocity and nx.degree_assortativity_coefficient."""

import random

import networkx as nx
import pytest

from k2_18_spark.graph.stats import degree_assortativity, reciprocity


def _edges_df(spark, edge_list):
    return spark.createDataFrame(
        [(f"V{a}", f"V{b}", "LINK", 1.0) for a, b in edge_list],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _seeded(n=50, m=200, seed=31):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


def test_reciprocity_parity(spark):
    edge_list = _seeded()
    g = nx.DiGraph()
    g.add_edges_from(edge_list)
    got = reciprocity(spark, _edges_df(spark, edge_list))
    assert got == pytest.approx(nx.overall_reciprocity(g), abs=1e-12)


def test_reciprocity_hand(spark):
    # 1 mutual pair + 1 one-way + 1 self-loop = 4 directed simple
    # edges, 2 reciprocated (nx keeps the loop in the denominator but
    # never counts it as reciprocated)
    df = _edges_df(spark, [(0, 1), (1, 0), (1, 2), (3, 3), (0, 1)])
    g = nx.DiGraph([(0, 1), (1, 0), (1, 2), (3, 3)])
    assert reciprocity(spark, df) == pytest.approx(2 / 4)
    assert reciprocity(spark, df) == pytest.approx(nx.overall_reciprocity(g))


def test_assortativity_parity(spark):
    edge_list = _seeded(n=40, m=150, seed=37)
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in edge_list if a != b)
    got = degree_assortativity(spark, _edges_df(spark, edge_list))
    assert got == pytest.approx(
        nx.degree_assortativity_coefficient(g), abs=1e-9
    )


def test_assortativity_star_is_negative(spark):
    star = [(0, i) for i in range(1, 8)] + [(1, 2)]
    got = degree_assortativity(spark, _edges_df(spark, star))
    g = nx.Graph(star)
    assert got == pytest.approx(nx.degree_assortativity_coefficient(g), abs=1e-9)
    assert got < 0


def test_undefined_cases(spark):
    with pytest.raises(ValueError):
        degree_assortativity(spark, _edges_df(spark, [(0, 1), (2, 3)]))  # regular
    with pytest.raises(ValueError):
        reciprocity(spark, _edges_df(spark, []).limit(0))
