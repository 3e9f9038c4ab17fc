"""Connected-components golden parity: exact component IDs vs the
reference renumbering (min original node position, sequential 0..k-1)."""

import pytest

from k2_18_spark import schemas
from k2_18_spark.graph.components import connected_components
from k2_18_spark.io import fixtures
from tests.nx_oracle import to_nx

import networkx as nx


def reference_component_ids(data: dict) -> dict:
    """Reimplements viz/graph2metrics.py:258-287 as the oracle."""
    g = to_nx(data)
    node_order = [n["id"] for n in data["nodes"]]
    ug = g.to_undirected()
    comps = list(nx.connected_components(ug))
    order_map = {n: i for i, n in enumerate(node_order)}
    comps = sorted(comps, key=lambda c: min(order_map.get(n, 10**9) for n in c))
    out = {}
    for cid, comp in enumerate(comps):
        for n in comp:
            out[n] = cid
    return out


@pytest.mark.parametrize("name", fixtures.FIXTURE_NAMES)
def test_components_exact(spark, name):
    nodes, edges, data = fixtures.load_fixture(spark, name)
    got = {
        r["id"]: r["component_id"]
        for r in connected_components(spark, edges, nodes=nodes).collect()
    }
    want = reference_component_ids(data)
    assert got == want, name


def test_components_expected_golden(spark):
    nodes, edges, _ = fixtures.load_fixture(spark, "test_disconnected")
    got = {
        r["id"]: r["component_id"]
        for r in connected_components(spark, edges, nodes=nodes).collect()
    }
    for node_id, exp in fixtures.expected_node_metrics("test_disconnected").items():
        assert got[node_id] == exp["component_id"], node_id


def test_components_resume(spark, tmp_ckpt):
    nodes, edges, data = fixtures.load_fixture(spark, "test_disconnected")
    first = connected_components(
        spark, edges, nodes=nodes, checkpoint_dir=tmp_ckpt
    ).collect()
    # Second call resumes from the converged marker without iterating.
    second = connected_components(
        spark, edges, nodes=nodes, checkpoint_dir=tmp_ckpt
    ).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))
    assert {r["component_id"] for r in first} == set(
        reference_component_ids(data).values()
    )


def test_degrees_golden(spark):
    from k2_18_spark.operators.degrees import degrees

    for name in fixtures.FIXTURE_NAMES:
        nodes, edges, _ = fixtures.load_fixture(spark, name)
        got = {r["id"]: r for r in degrees(edges, nodes=nodes).collect()}
        for node_id, exp in fixtures.expected_node_metrics(name).items():
            if "degree_in" in exp:
                assert got[node_id]["degree_in"] == exp["degree_in"], (name, node_id)
                assert got[node_id]["degree_out"] == exp["degree_out"], (name, node_id)
                # expected files round to 3-6 decimals
                assert abs(
                    got[node_id]["degree_centrality"] - exp["degree_centrality"]
                ) <= 5e-4, (name, node_id)


def test_inverse_weight_golden(spark):
    from pyspark.sql import functions as F

    from k2_18_spark.functions.weights import with_inverse_weight

    for name in ["test_weighted_triangle", "test_educational"]:
        _, edges, _ = fixtures.load_fixture(spark, name)
        got = {
            (r["src_id"], r["dst_id"], r["edge_type"]): r["inverse_weight"]
            for r in with_inverse_weight(
                edges.withColumn("weight", F.coalesce("weight", F.lit(1.0)))
            ).collect()
        }
        for key, exp in fixtures.expected_edge_metrics(name).items():
            if "inverse_weight" in exp:
                assert abs(got[key] - exp["inverse_weight"]) <= 1e-5, (name, key)


def test_star_components_matches_minlabel_random(spark):
    """Alternating large-star/small-star (O(log n) rounds) must produce
    byte-identical (id, component_id) output to the min-label loop."""
    import random

    from k2_18_spark.graph.components import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    ids = [f"v{i:03d}" for i in range(120)]
    edge_rows = []
    for k in range(150):
        a, b = rng.sample(ids, 2)
        edge_rows.append((a, b, "MENTIONS", 1.0, None, k))
    edges = spark.createDataFrame(edge_rows, schemas.EDGES)
    want = sorted(map(tuple, connected_components(spark, edges).collect()))
    got = sorted(map(tuple, connected_components_star(spark, edges).collect()))
    assert got == want


def test_star_components_long_chain_few_rounds(spark):
    """A 300-vertex chain has diameter 299 — min-label needs ~300
    supersteps; the star loop must finish inside its 60-round cap
    (O(log n)) and still label the whole chain as one component."""
    from k2_18_spark.graph.components import connected_components_star

    n = 300
    edge_rows = [
        (f"c{i:04d}", f"c{i+1:04d}", "MENTIONS", 1.0, None, i)
        for i in range(n - 1)
    ]
    edges = spark.createDataFrame(edge_rows, schemas.EDGES)
    out = connected_components_star(spark, edges).collect()
    assert len(out) == n
    assert {r["component_id"] for r in out} == {0}


def test_star_components_isolated_and_multi(spark):
    from k2_18_spark.graph.components import connected_components_star

    nodes = spark.createDataFrame(
        [(v, "Chunk", "t", 0, None, 3, None, None, None, None, i)
         for i, v in enumerate(["a", "b", "c", "d", "iso"])],
        schemas.NODES,
    )
    edges = spark.createDataFrame(
        [("a", "b", "MENTIONS", 1.0, None, 0), ("c", "d", "MENTIONS", 1.0, None, 1)],
        schemas.EDGES,
    )
    got = {r["id"]: r["component_id"]
           for r in connected_components_star(spark, edges, nodes=nodes).collect()}
    assert got == {"a": 0, "b": 0, "c": 1, "d": 1, "iso": 2}


def test_components_kill_resume_mid_iteration(spark, tmp_ckpt):
    """Kill mid-iteration (cap hit before convergence on a long chain),
    then resume from the checkpoint — final labels BIT-identical to an
    uninterrupted run, and the lineage shows the resumed run continued
    (did not restart at iteration 0)."""
    import pytest as _pytest

    n = 14  # chain diameter 13 → min-label needs >2 rounds
    edges = spark.createDataFrame(
        [(f"c{i:02d}", f"c{i+1:02d}", "NEXT", 1.0) for i in range(n - 1)]
        + [("z0", "z1", "NEXT", 1.0)],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            spark, edges, max_iter=2, checkpoint_dir=tmp_ckpt
        )

    resumed = sorted(
        map(tuple, connected_components(spark, edges, checkpoint_dir=tmp_ckpt).collect())
    )
    fresh = sorted(map(tuple, connected_components(spark, edges).collect()))
    assert resumed == fresh

    from k2_18_spark.checkpoint import CheckpointStore

    store = CheckpointStore(
        spark, tmp_ckpt, "components", state_version="encoded-long-v2"
    )
    iters = {r["iteration"] for r in store.lineage().collect()}
    # iterations 0,1 from the killed run; the resumed run added ≥ 2
    assert {0, 1} <= iters and max(iters) >= 2


# ---------------------------------------------------------------------------
# warm-start (init_labels) after edge additions
# ---------------------------------------------------------------------------


def test_warm_start_identical_graph_one_superstep(spark):
    from k2_18_spark.graph import components as comp_mod
    from k2_18_spark.graph.components import connected_components

    edges = spark.createDataFrame(
        [(f"V{i}", f"V{i+1}", "L", 1.0) for i in range(30) if i % 5 != 4],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    cold = connected_components(spark, edges)
    cold_rows = {(r["id"], r["component_id"]) for r in cold.collect()}
    cold_iters = comp_mod.LAST_RUN_ITERATIONS
    warm = connected_components(spark, edges, init_labels=cold)
    assert {(r["id"], r["component_id"]) for r in warm.collect()} == cold_rows
    assert comp_mod.LAST_RUN_ITERATIONS == 1  # zero-change probe only
    assert cold_iters > 1


def test_warm_start_after_merge_matches_cold(spark):
    from k2_18_spark.graph import components as comp_mod
    from k2_18_spark.graph.components import connected_components

    # 6 chains of 5; delta bridges chains 0-1 and 2-3 and adds a new
    # vertex pair untouched by the old assignment
    base = [(f"V{i}", f"V{i+1}", "L", 1.0) for i in range(30) if i % 5 != 4]
    delta = [("V4", "V5", "L", 1.0), ("V14", "V15", "L", 1.0),
             ("N1", "N2", "L", 1.0)]
    schema = "src_id string, dst_id string, edge_type string, weight double"
    old = connected_components(spark, spark.createDataFrame(base, schema))
    new_edges = spark.createDataFrame(base + delta, schema)
    cold = connected_components(spark, new_edges)
    cold_rows = {(r["id"], r["component_id"]) for r in cold.collect()}
    cold_iters = comp_mod.LAST_RUN_ITERATIONS
    warm = connected_components(spark, new_edges, init_labels=old)
    warm_iters = comp_mod.LAST_RUN_ITERATIONS
    assert {(r["id"], r["component_id"]) for r in warm.collect()} == cold_rows
    assert warm_iters < cold_iters
