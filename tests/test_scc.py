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


def _nx_scc_min(edge_pairs, all_ids):
    h = nx.DiGraph()
    h.add_nodes_from(all_ids)
    h.add_edges_from(edge_pairs)
    want = {}
    for comp in nx.strongly_connected_components(h):
        m = min(comp)
        for v in comp:
            want[v] = m
    return want


def test_fwbw_matches_networkx_random(spark):
    """Distributed FW-BW must produce the same (id, min-member scc_id)
    map as networkx on seeded random digraphs — including graphs whose
    trimmed core contains trivial SCCs (chains between cycles)."""
    import random

    from k2_18_spark import schemas

    for seed in (3, 11):
        rng = random.Random(seed)
        ids = [f"n{i:02d}" for i in range(40)]
        pairs = set()
        while len(pairs) < 80:
            a, b = rng.sample(ids, 2)
            pairs.add((a, b))
        edges = spark.createDataFrame(
            [(a, b, "PREREQUISITE", 1.0, None, i)
             for i, (a, b) in enumerate(sorted(pairs))],
            schemas.EDGES,
        )
        got = {
            r["id"]: r["scc_id"]
            for r in strongly_connected_components(
                spark, edges, method="fwbw"
            ).collect()
        }
        want = _nx_scc_min(pairs, ids)
        # vertices w/o edges don't appear; restrict to those present
        assert got == {k: v for k, v in want.items() if k in got}, seed
        # and the forced-fwbw path agrees with the tarjan path
        got_t = {
            r["id"]: r["scc_id"]
            for r in strongly_connected_components(
                spark, edges, method="tarjan"
            ).collect()
        }
        assert got == got_t, seed


def test_fwbw_two_cycles_with_bridge(spark):
    """Two 4-cycles joined by a path of trivial SCCs — exercises the
    partition-splitting recursion."""
    from k2_18_spark import schemas

    cyc1 = [("a0", "a1"), ("a1", "a2"), ("a2", "a3"), ("a3", "a0")]
    cyc2 = [("b0", "b1"), ("b1", "b2"), ("b2", "b3"), ("b3", "b0")]
    bridge = [("a0", "m1"), ("m1", "m2"), ("m2", "b0")]
    pairs = cyc1 + cyc2 + bridge
    edges = spark.createDataFrame(
        [(a, b, "PREREQUISITE", 1.0, None, i) for i, (a, b) in enumerate(pairs)],
        schemas.EDGES,
    )
    got = {
        r["id"]: r["scc_id"]
        for r in strongly_connected_components(spark, edges, method="fwbw").collect()
    }
    ids = sorted({v for p in pairs for v in p})
    assert got == _nx_scc_min(pairs, ids)


def test_auto_switches_to_fwbw_above_core_budget(spark):
    """method='auto' with a tiny max_core_vertices must no longer raise
    — it decomposes the oversized core distributively."""
    from k2_18_spark import schemas

    cycle = [(f"v{i}", f"v{(i + 1) % 8}", "PREREQUISITE", 1.0, None, i)
             for i in range(8)]
    edges = spark.createDataFrame(cycle, schemas.EDGES)
    got = {r["id"]: r["scc_id"]
           for r in strongly_connected_components(
               spark, edges, max_core_vertices=4).collect()}
    assert set(got.values()) == {"v0"}
