"""Prerequisite depth / learning effort golden parity (G5)."""

import networkx as nx
import pytest

from k2_18_spark.graph.scc import prerequisite_metrics, strongly_connected_components
from k2_18_spark.io import fixtures
from tests.nx_oracle import to_nx


def reference_prereq_metrics(data: dict, default_diff: int = 3):
    """Reimplements viz/graph2metrics.py:290-384 as oracle."""
    g = to_nx(data)
    prereq_edges = [
        (u, v)
        for u, v, d in g.edges(data=True)
        if str(d.get("type", "")).upper() == "PREREQUISITE"
    ]
    h = nx.DiGraph()
    h.add_nodes_from(g.nodes())
    node_map = {n["id"]: n for n in data["nodes"]}
    for nid in h.nodes():
        h.nodes[nid]["difficulty"] = node_map.get(nid, {}).get(
            "difficulty", default_diff
        ) or default_diff
    h.add_edges_from(prereq_edges)
    if h.number_of_edges() == 0:
        return (
            {n: 0 for n in g.nodes()},
            {n: float(h.nodes[n]["difficulty"]) for n in g.nodes()},
        )
    sccs = list(nx.strongly_connected_components(h))
    idx = {n: i for i, s in enumerate(sccs) for n in s}
    c = nx.DiGraph()
    c.add_nodes_from(range(len(sccs)))
    for u, v in h.edges():
        if idx[u] != idx[v]:
            c.add_edge(idx[u], idx[v])
    cdiff = {
        i: sum(h.nodes[n]["difficulty"] for n in s) for i, s in enumerate(sccs)
    }
    depth = {i: 0 for i in c.nodes()}
    effort = {i: 0.0 for i in c.nodes()}
    if c.number_of_edges() > 0:
        for n in nx.topological_sort(c):
            preds = list(c.predecessors(n))
            if preds:
                depth[n] = max(depth[p] for p in preds) + 1
                effort[n] = max(effort[p] for p in preds) + cdiff[n]
            else:
                effort[n] = cdiff[n]
    else:
        effort = dict(cdiff)
    return (
        {n: depth[idx[n]] for n in g.nodes()},
        {n: float(effort[idx[n]]) for n in g.nodes()},
    )


@pytest.mark.parametrize("name", fixtures.FIXTURE_NAMES)
def test_prereq_metrics_match_reference(spark, name):
    nodes, edges, data = fixtures.load_fixture(spark, name)
    got = {
        r["id"]: (r["prerequisite_depth"], r["learning_effort"])
        for r in prerequisite_metrics(spark, edges, nodes).collect()
    }
    want_depth, want_effort = reference_prereq_metrics(data)
    for nid in want_depth:
        assert got[nid][0] == want_depth[nid], (name, nid, "depth")
        assert abs(got[nid][1] - want_effort[nid]) < 1e-9, (name, nid, "effort")


@pytest.mark.parametrize("name", fixtures.FIXTURE_NAMES)
def test_prereq_metrics_match_golden_expected(spark, name):
    nodes, edges, _ = fixtures.load_fixture(spark, name)
    got = {
        r["id"]: (r["prerequisite_depth"], r["learning_effort"])
        for r in prerequisite_metrics(spark, edges, nodes).collect()
    }
    for nid, exp in fixtures.expected_node_metrics(name).items():
        if "prerequisite_depth" in exp:
            assert got[nid][0] == exp["prerequisite_depth"], (name, nid)
        if "learning_effort" in exp:
            assert abs(got[nid][1] - exp["learning_effort"]) < 1e-6, (name, nid)


def test_scc_on_cycle(spark):
    """test_cycle fixture is one big PREREQUISITE cycle → single SCC."""
    nodes, edges, data = fixtures.load_fixture(spark, "test_cycle")
    prereq = edges.filter("upper(edge_type) = 'PREREQUISITE'")
    if prereq.isEmpty():
        pytest.skip("fixture has no prerequisite cycle")
    got = {
        r["id"]: r["scc_id"]
        for r in strongly_connected_components(spark, prereq, nodes=nodes).collect()
    }
    g = to_nx(data)
    h = nx.DiGraph()
    h.add_nodes_from(g.nodes())
    h.add_edges_from(
        (u, v)
        for u, v, d in g.edges(data=True)
        if str(d.get("type", "")).upper() == "PREREQUISITE"
    )
    for scc in nx.strongly_connected_components(h):
        ids = {got[n] for n in scc}
        assert len(ids) == 1, scc
