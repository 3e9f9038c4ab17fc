"""Betweenness / out-closeness parity vs NetworkX (pure-Python paths)
and golden expected files."""

import math

import networkx as nx
import pytest

from k2_18_spark.graph.centrality import betweenness_closeness
from k2_18_spark.io import fixtures
from tests.nx_oracle import to_nx


def nx_oracle(data):
    g = to_nx(data)
    for u, v, d in g.edges(data=True):
        w = float(d.get("weight", 1.0))
        d["inverse_weight"] = 1.0 / w if w > 0 else float("inf")
    if g.number_of_nodes() >= 3:
        bet = nx.betweenness_centrality(g, weight="inverse_weight", normalized=True)
    else:
        bet = {n: 0.0 for n in g.nodes()}
    if g.number_of_nodes() > 1:
        clo = nx.closeness_centrality(
            g.reverse(copy=True), distance="inverse_weight", wf_improved=True
        )
    else:
        clo = {n: 0.0 for n in g.nodes()}
    return bet, clo


@pytest.mark.parametrize("name", fixtures.FIXTURE_NAMES)
def test_centrality_matches_networkx(spark, name):
    nodes, edges, data = fixtures.load_fixture(spark, name)
    got = {
        r["id"]: (r["betweenness_centrality"], r["out_closeness"])
        for r in betweenness_closeness(spark, edges, nodes=nodes).collect()
    }
    bet, clo = nx_oracle(data)
    for nid in bet:
        assert math.isclose(got[nid][0], bet[nid], abs_tol=1e-9), (name, nid, "bet")
        assert math.isclose(got[nid][1], clo[nid], abs_tol=1e-9), (name, nid, "clo")


def test_centrality_matches_golden_expected(spark):
    for name in ["test_weighted_triangle", "test_line", "test_star"]:
        nodes, edges, _ = fixtures.load_fixture(spark, name)
        got = {
            r["id"]: r
            for r in betweenness_closeness(spark, edges, nodes=nodes).collect()
        }
        # expected files are hand-calculated with rounded intermediates;
        # the reference's own validation mode allows 1% relative /
        # 0.001 absolute (viz/graph2metrics.py:1742-1778). Exact parity
        # vs nx is asserted at 1e-9 in test_centrality_matches_networkx.
        def close(a, b):
            return abs(a - b) <= (0.001 if b == 0 else 0.01 * abs(b) + 1e-9)

        for nid, exp in fixtures.expected_node_metrics(name).items():
            if "betweenness_centrality" in exp:
                assert close(
                    got[nid]["betweenness_centrality"], exp["betweenness_centrality"]
                ), (name, nid)
            if "out-closeness" in exp:
                assert close(got[nid]["out_closeness"], exp["out-closeness"]), (
                    name,
                    nid,
                )


def test_sampled_betweenness_approximates(spark):
    nodes, edges, data = fixtures.load_fixture(spark, "test_realistic_mini")
    exact = {
        r["id"]: r["betweenness_centrality"]
        for r in betweenness_closeness(spark, edges, nodes=nodes).collect()
    }
    n = nodes.count()
    # sample_k == n degenerates to the exact computation
    full_sample = {
        r["id"]: r["betweenness_centrality"]
        for r in betweenness_closeness(
            spark, edges, nodes=nodes, sample_k=n
        ).collect()
    }
    assert all(abs(full_sample[k] - exact[k]) < 1e-9 for k in exact)
    # a strict subsample still yields finite non-negative estimates
    approx = {
        r["id"]: r["betweenness_centrality"]
        for r in betweenness_closeness(
            spark, edges, nodes=nodes, sample_k=5
        ).collect()
    }
    assert all(v >= 0 for v in approx.values())
    assert sum(approx.values()) > 0


def test_zero_weight_edges_match_networkx(spark):
    """weight=0 → inverse_weight=inf; nx still traverses the edge and
    records an inf distance, zeroing the source's wf closeness — the
    engine must mirror that (schema permits weight=0 and distance
    metrics run before weight sanitation in the reference)."""
    from k2_18_spark import schemas

    edge_rows = [
        ("a", "b", "MENTIONS", 1.0, None, 0),
        ("b", "c", "MENTIONS", 0.0, None, 1),  # inf inverse weight
        ("c", "d", "MENTIONS", 2.0, None, 2),
        ("a", "d", "MENTIONS", 0.5, None, 3),
    ]
    node_ids = ["a", "b", "c", "d"]
    nodes = spark.createDataFrame(
        [(v, "Chunk", "t", 0, None, 3, None, None, None, None, i)
         for i, v in enumerate(node_ids)],
        schemas.NODES,
    )
    edges = spark.createDataFrame(edge_rows, schemas.EDGES)
    got = {
        r["id"]: (r["betweenness_centrality"], r["out_closeness"])
        for r in betweenness_closeness(spark, edges, nodes=nodes).collect()
    }
    data = {
        "nodes": [{"id": v} for v in node_ids],
        "edges": [
            {"source": s, "target": t, "type": ty, "weight": w}
            for s, t, ty, w, _, _ in edge_rows
        ],
    }
    bet, clo = nx_oracle(data)
    for nid in bet:
        assert math.isclose(got[nid][0], bet[nid], abs_tol=1e-9), (nid, "bet")
        assert math.isclose(got[nid][1], clo[nid], abs_tol=1e-9), (nid, "clo")


def test_csr_collect_guard(spark):
    from k2_18_spark import schemas

    edges = spark.createDataFrame(
        [(f"v{i}", f"v{i+1}", "MENTIONS", 1.0, None, i) for i in range(20)],
        schemas.EDGES,
    )
    with pytest.raises(RuntimeError, match="driver-broadcast CSR"):
        betweenness_closeness(spark, edges, max_collect_edges=5)


def _random_weighted_digraph(spark, n=40, m=200, seed=7):
    """Deterministic random digraph with continuous positive weights
    (no exact distance ties → both methods see the same SP DAG)."""
    import random

    rng = random.Random(seed)
    seen = set()
    rows = []
    while len(rows) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u == v or (u, v) in seen:
            continue
        seen.add((u, v))
        rows.append((f"n{u:03d}", f"n{v:03d}", "LINK", 0.05 + rng.random()))
    edges = spark.createDataFrame(
        rows, "src_id string, dst_id string, edge_type string, weight double"
    )
    nodes = spark.createDataFrame(
        [(f"n{i:03d}",) for i in range(n)], "id string"
    )
    return nodes, edges


@pytest.mark.parametrize("sample_k", [None, 10])
def test_superstep_matches_driver_path(spark, sample_k):
    """The distributed (no-driver-collect) superstep Brandes agrees
    with the broadcast-CSR driver path at 1e-6 on random weighted
    digraphs — identical stride-sampled sources by construction."""
    nodes, edges = _random_weighted_digraph(spark)
    drv = {
        r["id"]: (r["betweenness_centrality"], r["out_closeness"])
        for r in betweenness_closeness(
            spark, edges, nodes=nodes, sample_k=sample_k
        ).collect()
    }
    sst = {
        r["id"]: (r["betweenness_centrality"], r["out_closeness"])
        for r in betweenness_closeness(
            spark, edges, nodes=nodes, sample_k=sample_k, method="superstep"
        ).collect()
    }
    assert set(drv) == set(sst)
    for nid in drv:
        assert math.isclose(drv[nid][0], sst[nid][0], abs_tol=1e-6), (
            nid, "betweenness", drv[nid][0], sst[nid][0])
        assert math.isclose(drv[nid][1], sst[nid][1], abs_tol=1e-6), (
            nid, "closeness", drv[nid][1], sst[nid][1])


def test_superstep_row_path_matches_columnar(spark, monkeypatch):
    """The row-per-(source,vertex) superstep loop (the k > 64 fallback)
    agrees with the columnar path — forced by shrinking the columnar
    ceiling to 0."""
    from k2_18_spark.graph import centrality as C

    nodes, edges = _random_weighted_digraph(spark)
    col = {
        r["id"]: (r["betweenness_centrality"], r["out_closeness"])
        for r in betweenness_closeness(
            spark, edges, nodes=nodes, sample_k=10, method="superstep"
        ).collect()
    }
    monkeypatch.setattr(C, "SUPERSTEP_COLUMNAR_MAX_K", 0)
    row = {
        r["id"]: (r["betweenness_centrality"], r["out_closeness"])
        for r in betweenness_closeness(
            spark, edges, nodes=nodes, sample_k=10, method="superstep"
        ).collect()
    }
    assert set(col) == set(row)
    for nid in col:
        assert math.isclose(col[nid][0], row[nid][0], abs_tol=1e-9), nid
        assert math.isclose(col[nid][1], row[nid][1], abs_tol=1e-9), nid


def test_superstep_matches_networkx_exact(spark):
    """Full-source superstep Brandes vs networkx at 1e-9 (n=25)."""
    nodes, edges = _random_weighted_digraph(spark, n=25, m=100, seed=3)
    data = {
        "nodes": [{"id": r["id"]} for r in nodes.collect()],
        "edges": [
            {"source": r["src_id"], "target": r["dst_id"],
             "type": r["edge_type"], "weight": r["weight"]}
            for r in edges.collect()
        ],
    }
    bet, clo = nx_oracle(data)
    got = {
        r["id"]: (r["betweenness_centrality"], r["out_closeness"])
        for r in betweenness_closeness(
            spark, edges, nodes=nodes, method="superstep"
        ).collect()
    }
    for nid in bet:
        assert math.isclose(got[nid][0], bet[nid], abs_tol=1e-9), (nid, "bet")
        assert math.isclose(got[nid][1], clo[nid], abs_tol=1e-9), (nid, "clo")


def test_superstep_rejects_nonpositive_weights(spark):
    from k2_18_spark import schemas

    edges = spark.createDataFrame(
        [("a", "b", "MENTIONS", 0.0, None, 0)], schemas.EDGES
    )
    with pytest.raises(ValueError, match="strictly positive"):
        betweenness_closeness(spark, edges, method="superstep")
