"""Behavioral tests for label propagation + golden/nx parity for
triangle counting (north_rule algorithms 3 and 4)."""

import networkx as nx
import pytest

from k2_18_spark import schemas
from k2_18_spark.graph.lpa import label_propagation
from k2_18_spark.graph.triangles import triangle_count, triangles
from k2_18_spark.io import fixtures
from tests.nx_oracle import to_nx


def make_graph(spark, edge_list, node_ids=None):
    if node_ids is None:
        node_ids = sorted({v for e in edge_list for v in e[:2]})
    nodes = spark.createDataFrame(
        [(v, "Chunk", "t", 0, None, 3, None, None, None, None, i)
         for i, v in enumerate(node_ids)],
        schemas.NODES,
    )
    edges = spark.createDataFrame(
        [(a, b, "MENTIONS", float(w), None, i)
         for i, (a, b, w) in enumerate(edge_list)],
        schemas.EDGES,
    )
    return nodes, edges


def clique(prefix, k):
    ids = [f"{prefix}{i}" for i in range(k)]
    return [(a, b, 1.0) for i, a in enumerate(ids) for b in ids[i + 1:]]


def test_lpa_two_cliques(spark):
    """Two 5-cliques joined by one weak bridge → exactly two clusters,
    split along the bridge (reference behavioral test shape,
    tests/viz/test_algo_behavioral.py)."""
    edges_list = clique("a", 5) + clique("b", 5) + [("a0", "b0", 0.1)]
    nodes, edges = make_graph(spark, edges_list)
    got = {
        r["id"]: r["cluster_id"]
        for r in label_propagation(spark, edges, nodes=nodes).collect()
    }
    a_labels = {got[f"a{i}"] for i in range(5)}
    b_labels = {got[f"b{i}"] for i in range(5)}
    assert len(a_labels) == 1 and len(b_labels) == 1
    assert a_labels != b_labels
    # deterministic renumbering: cluster ids are 0..k-1, min-order first
    assert a_labels == {0} and b_labels == {1}


def test_lpa_deterministic(spark):
    edges_list = clique("a", 4) + clique("b", 4) + clique("c", 3) + [
        ("a0", "b0", 0.2),
        ("b1", "c0", 0.2),
    ]
    nodes, edges = make_graph(spark, edges_list)
    r1 = sorted(map(tuple, label_propagation(spark, edges, nodes=nodes).collect()))
    r2 = sorted(map(tuple, label_propagation(spark, edges, nodes=nodes).collect()))
    assert r1 == r2


def test_lpa_isolated_vertices_get_own_cluster(spark):
    nodes, edges = make_graph(
        spark, [("a", "b", 1.0)], node_ids=["a", "b", "iso1", "iso2"]
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in label_propagation(spark, edges, nodes=nodes).collect()
    }
    assert got["a"] == got["b"]
    assert len({got["a"], got["iso1"], got["iso2"]}) == 3


@pytest.mark.parametrize("name", fixtures.FIXTURE_NAMES)
def test_triangles_match_networkx(spark, name):
    nodes, edges, data = fixtures.load_fixture(spark, name)
    got = {
        r["id"]: r["triangle_count"]
        for r in triangles(spark, edges, nodes=nodes).collect()
    }
    g = to_nx(data).to_undirected()
    g.remove_edges_from(nx.selfloop_edges(g))
    want = nx.triangles(g)
    assert got == {k: int(v) for k, v in want.items()}, name
    assert triangle_count(spark, edges) == sum(want.values()) // 3


def test_triangles_skewed_hub(spark):
    """Star + a few closing edges: hub must not blow up wedge fan-out
    (degree orientation sends wedges to the low-degree corners)."""
    edge_list = [(f"s{i}", "hub", 1.0) for i in range(30)] + [
        ("s0", "s1", 1.0),
        ("s2", "s3", 1.0),
        ("s4", "s5", 1.0),
    ]
    nodes, edges = make_graph(spark, edge_list)
    got = {
        r["id"]: r["triangle_count"]
        for r in triangles(spark, edges, nodes=nodes).collect()
    }
    assert got["hub"] == 3
    assert got["s0"] == got["s1"] == 1
    assert got["s29"] == 0


def test_lpa_kill_resume_mid_iteration(spark, tmp_ckpt):
    """Simulated kill at iteration 3 (cap), resume to the full horizon
    from the shared CheckpointStore — labels BIT-identical to an
    uninterrupted run (the encoded-state resume re-derives the same
    trajectory; the changed-label frontier restarts with two full-vote
    rounds, which cannot alter it)."""
    rows = []
    for p, members in (("a", 5), ("b", 5), ("c", 4)):
        for i in range(members):
            for j in range(i + 1, members):
                rows.append((f"{p}{i}", f"{p}{j}", "REL", 1.0))
    rows += [("a0", "b0", "REL", 0.1), ("b1", "c0", "REL", 0.1)]
    edges = spark.createDataFrame(
        rows, "src_id string, dst_id string, edge_type string, weight double"
    )

    label_propagation(spark, edges, max_iter=3, checkpoint_dir=tmp_ckpt)
    resumed = sorted(
        map(
            tuple,
            label_propagation(
                spark, edges, max_iter=12, checkpoint_dir=tmp_ckpt
            ).collect(),
        )
    )
    fresh = sorted(
        map(tuple, label_propagation(spark, edges, max_iter=12).collect())
    )
    assert resumed == fresh

    from k2_18_spark.checkpoint import CheckpointStore

    store = CheckpointStore(spark, tmp_ckpt, "lpa", state_version="encoded-long-v2")
    iters = {r["iteration"] for r in store.lineage().collect()}
    assert {0, 1, 2} <= iters and max(iters) >= 3


def test_lpa_frontier_engages_and_matches_full_votes(spark):
    """On a convergent clustered graph the changed-label frontier must
    actually ENGAGE (prune the vote join in ≥1 round) and produce the
    bit-identical trajectory of the full-vote path."""
    from k2_18_spark.graph import lpa as lpa_mod

    # a 60-vertex chain (persistent ~30-vertex churn wavefront) among
    # 540 isolated vertices: n=600 → gate n//4=150, churn ≈ 60 ≪ gate,
    # and labels keep moving for many rounds — the frontier must engage
    # from round 2 while the trajectory is still live
    rows = [(f"c{i:03d}", f"c{i+1:03d}", "REL", 1.0) for i in range(59)]
    edges = spark.createDataFrame(
        rows, "src_id string, dst_id string, edge_type string, weight double"
    )
    nodes = spark.createDataFrame(
        [(f"c{i:03d}",) for i in range(60)]
        + [(f"iso{i:03d}",) for i in range(540)],
        "id string",
    )
    with_frontier = sorted(
        map(
            tuple,
            label_propagation(
                spark, edges, nodes=nodes, max_iter=8, use_frontier=True
            ).collect(),
        )
    )
    assert lpa_mod.LAST_RUN_FRONTIER_ROUNDS >= 1, "frontier never engaged"
    without = sorted(
        map(
            tuple,
            label_propagation(
                spark, edges, nodes=nodes, max_iter=8, use_frontier=False
            ).collect(),
        )
    )
    assert lpa_mod.LAST_RUN_FRONTIER_ROUNDS == 0  # disabled path
    assert with_frontier == without
