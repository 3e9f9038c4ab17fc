"""Property-based correctness: random small digraphs (dangling
vertices, self-loops, parallel typed edges, zero-ish weights) must
match the pure-Python nx-semantics oracles for PageRank, components
and triangles. Complements the 8 golden fixtures with adversarial
topologies."""

import math

import networkx as nx
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from k2_18_spark import schemas
from k2_18_spark.graph.components import connected_components
from k2_18_spark.graph.pagerank import pagerank
from k2_18_spark.graph.triangles import triangles
from tests.nx_oracle import pagerank_power

N_VERTS = 8


@st.composite
def random_graph(draw):
    n_edges = draw(st.integers(min_value=0, max_value=20))
    edges = []
    for i in range(n_edges):
        s = draw(st.integers(0, N_VERTS - 1))
        d = draw(st.integers(0, N_VERTS - 1))
        w = draw(
            st.sampled_from([0.1, 0.35, 0.5, 0.9, 1.0, 0.01])
        )
        t = draw(st.sampled_from(["MENTIONS", "PREREQUISITE", "ELABORATES"]))
        edges.append((f"n{s}", f"n{d}", t, w, None, i))
    return edges


def build(spark, edge_rows):
    nodes = spark.createDataFrame(
        [
            (f"n{i}", "Chunk", "t", 0, None, 3, None, None, None, None, i)
            for i in range(N_VERTS)
        ],
        schemas.NODES,
    )
    edges = spark.createDataFrame(edge_rows, schemas.EDGES)
    return nodes, edges


def collapsed_nx(edge_rows):
    """Last-edge-per-(src,dst) DiGraph — the reference's metrics view."""
    g = nx.DiGraph()
    g.add_nodes_from(f"n{i}" for i in range(N_VERTS))
    for s, d, t, w, _, _ in edge_rows:
        g.add_edge(s, d, weight=w, type=t)
    return g


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(random_graph())
def test_pagerank_components_triangles_random(spark, edge_rows):
    nodes, edges = build(spark, edge_rows)
    g = collapsed_nx(edge_rows)

    got_pr = {
        r["id"]: r["rank"] for r in pagerank(spark, edges, nodes=nodes).collect()
    }
    if g.number_of_edges() > 0:
        want_pr = pagerank_power(g)
    else:
        want_pr = {v: 1.0 / N_VERTS for v in g.nodes()}
    for v in want_pr:
        assert math.isclose(got_pr[v], want_pr[v], abs_tol=1e-6), (v, edge_rows)

    got_cc = {
        r["id"]: r["component_id"]
        for r in connected_components(spark, edges, nodes=nodes).collect()
    }
    ug = g.to_undirected()
    comps = sorted(
        nx.connected_components(ug), key=lambda c: min(int(v[1:]) for v in c)
    )
    want_cc = {v: i for i, c in enumerate(comps) for v in c}
    assert got_cc == want_cc, edge_rows

    got_tri = {
        r["id"]: r["triangle_count"]
        for r in triangles(spark, edges, nodes=nodes).collect()
    }
    ug.remove_edges_from(nx.selfloop_edges(ug))
    want_tri = {k: int(v) for k, v in nx.triangles(ug).items()}
    assert got_tri == want_tri, edge_rows
