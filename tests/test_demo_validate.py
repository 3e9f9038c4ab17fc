"""Demo-path strategies (G14) + stage-boundary invariant validator —
reference semantics viz/graph2metrics.py:1171-1580 and
src/utils/validation.py:106-169."""

import pytest

from k2_18_spark import schemas
from k2_18_spark.operators.validate import (
    GraphInvariantError,
    assert_valid_graph,
    validate_graph,
)
from k2_18_spark.pipeline.demo_path import generate_demo_path

METRIC_COLS = (
    "id string, educational_importance double, prerequisite_depth int, "
    "learning_effort double, pagerank double, bridge_score double, "
    "betweenness_centrality double, cluster_id int, node_order long"
)


def _nodes(spark, rows):
    return spark.createDataFrame(rows, METRIC_COLS)


def _edges(spark, rows):
    return spark.createDataFrame(
        [(s, d, t, 1.0, None, i) for i, (s, d, t) in enumerate(rows)],
        schemas.EDGES,
    )


def test_strategy1_follows_edu_chain_and_sorts_by_depth(spark):
    # a(depth0) → b(depth1) → c(depth2) PREREQUISITE chain; a has the
    # max educational importance at min depth → entry point; the walk
    # stitches b and c via the educational subgraph.
    nodes = _nodes(spark, [
        ("a", 0.5, 0, 1.0, 0.1, 0.0, 0.0, 0, 0),
        ("b", 0.3, 1, 2.0, 0.1, 0.0, 0.0, 0, 1),
        ("c", 0.2, 2, 3.0, 0.1, 0.0, 0.0, 0, 2),
    ])
    edges = _edges(spark, [("a", "b", "PREREQUISITE"), ("b", "c", "PREREQUISITE")])
    out = generate_demo_path(spark, nodes, edges, strategy=1, max_nodes=3)
    assert out["demo_path"] == ["a", "b", "c"]
    assert out["demo_generation_config"]["strategy_name"] == "optimal"


def test_strategy2_picks_top_pagerank_per_cluster(spark):
    nodes = _nodes(spark, [
        ("a", 0.1, 0, 1.0, 0.9, 0.0, 0.0, 0, 0),  # cluster 0 winner
        ("b", 0.1, 1, 1.0, 0.2, 0.0, 0.0, 0, 1),
        ("c", 0.1, 2, 1.0, 0.8, 0.0, 0.0, 1, 2),  # cluster 1 winner (deeper)
        ("d", 0.1, 0, 1.0, 0.3, 0.0, 0.0, 1, 3),
    ])
    edges = _edges(spark, [("a", "b", "MENTIONS"), ("c", "d", "MENTIONS")])
    out = generate_demo_path(spark, nodes, edges, strategy=2, max_nodes=5)
    # one per cluster, ordered by prerequisite_depth (a: 0, c: 2)
    assert out["demo_path"] == ["a", "c"]
    assert out["demo_generation_config"]["strategy_name"] == "showcase"


def test_strategy2_single_cluster_falls_back_to_optimal(spark):
    nodes = _nodes(spark, [
        ("a", 0.5, 0, 1.0, 0.1, 0.0, 0.0, 0, 0),
        ("b", 0.3, 1, 2.0, 0.1, 0.0, 0.0, 0, 1),
    ])
    edges = _edges(spark, [("a", "b", "PREREQUISITE")])
    out = generate_demo_path(spark, nodes, edges, strategy=2, max_nodes=2)
    assert out["demo_generation_config"]["strategy_name"] == "showcase"
    assert out["demo_path"] == ["a", "b"]  # optimal fallback result


def test_strategy3_traces_dependencies_of_most_complex(spark):
    # c has max learning_effort; ancestors via PREREQUISITE: b then a.
    nodes = _nodes(spark, [
        ("a", 0.9, 0, 1.0, 0.1, 0.0, 0.0, 0, 0),
        ("b", 0.5, 1, 2.0, 0.1, 0.0, 0.0, 0, 1),
        ("c", 0.2, 2, 9.0, 0.1, 0.0, 0.0, 0, 2),
        ("x", 0.1, 0, 1.0, 0.1, 0.0, 0.0, 0, 3),  # unrelated
    ])
    edges = _edges(spark, [
        ("a", "b", "PREREQUISITE"),
        ("b", "c", "PREREQUISITE"),
        ("x", "a", "MENTIONS"),
    ])
    out = generate_demo_path(spark, nodes, edges, strategy=3, max_nodes=3)
    assert out["demo_generation_config"]["strategy_name"] == "critical"
    # ancestors {a, b} + complex node c, sorted by depth
    assert out["demo_path"] == ["a", "b", "c"]


def test_demo_path_guard_refuses_untrimmed_graph(spark):
    nodes = _nodes(spark, [(f"n{i}", 0.1, 0, 1.0, 0.1, 0.0, 0.0, 0, i)
                           for i in range(30)])
    edges = _edges(spark, [("n0", "n1", "MENTIONS")])
    with pytest.raises(RuntimeError, match="trim"):
        generate_demo_path(spark, nodes, edges, max_collect=10)


def test_demo_path_on_fixture_metrics(spark):
    """Integration: full metrics DAG → all three strategies produce
    valid paths over the fixture graph."""
    from k2_18_spark.io import fixtures
    from k2_18_spark.pipeline.metrics import compute_all_metrics

    nodes, edges, _ = fixtures.load_fixture(spark, "test_realistic_mini")
    nodes_m, _, _ = compute_all_metrics(spark, nodes, edges)
    ids = {r["id"] for r in nodes.select("id").collect()}
    for strategy in (1, 2, 3):
        out = generate_demo_path(
            spark, nodes_m, edges, strategy=strategy, max_nodes=8
        )
        path = out["demo_path"]
        assert 0 < len(path) <= 8
        assert set(path) <= ids
        assert len(set(path)) == len(path)  # no repeats
        # learning order: non-decreasing prerequisite_depth (strategies 1/3)
        if strategy in (1, 3):
            depth = {
                r["id"]: r["prerequisite_depth"]
                for r in nodes_m.select("id", "prerequisite_depth").collect()
            }
            depths = [depth[v] for v in path]
            assert depths == sorted(depths)


# -- validator ---------------------------------------------------------------


def test_validator_reports_every_invariant_class(spark):
    nodes = spark.createDataFrame(
        [("a", "Chunk"), ("a", "Chunk"), ("b", "Concept"), (None, "Chunk")],
        "id string, type string",
    )
    edges = spark.createDataFrame(
        [
            ("a", "b", "MENTIONS", 1.0),
            ("a", "b", "MENTIONS", 1.0),        # duplicate triple
            ("a", "ghost", "MENTIONS", 1.0),    # missing target
            ("ghost2", "b", "MENTIONS", 1.0),   # missing source
            ("b", "b", "PREREQUISITE", 1.0),    # forbidden self-loop
        ],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    _, report = validate_graph(nodes, edges)
    kinds = report["violations_by_kind"]
    assert kinds["node_null_id"] == 1
    assert kinds["node_duplicate_id"] == 1
    assert kinds["edge_missing_target"] == 1
    assert kinds["edge_missing_source"] == 1
    assert kinds["prerequisite_self_loop"] == 1
    assert kinds["edge_duplicate"] == 1
    assert not report["valid"]
    with pytest.raises(GraphInvariantError):
        assert_valid_graph(nodes, edges)


def test_validator_accepts_clean_graph(spark):
    nodes = spark.createDataFrame(
        [("a", "Chunk"), ("b", "Concept")], "id string, type string"
    )
    edges = spark.createDataFrame(
        [("a", "b", "MENTIONS", 1.0), ("b", "a", "ELABORATES", 0.5)],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    report = assert_valid_graph(nodes, edges)
    assert report["valid"] and report["total_violations"] == 0


def test_run_graph2metrics_meta_payload(spark):
    """The complete run attaches demo_path + course_sequence to the
    meta payload like the reference's _meta (graph2metrics steps 11)."""
    from k2_18_spark.io import fixtures
    from k2_18_spark.pipeline.metrics import run_graph2metrics

    nodes, edges, _ = fixtures.load_fixture(spark, "test_realistic_mini")
    nm, em, meta = run_graph2metrics(spark, nodes, edges, demo_path_max_nodes=6)
    assert 0 < len(meta["demo_path"]) <= 6
    assert meta["demo_generation_config"]["strategy_name"] == "optimal"
    assert meta["pagerank_sum_ok"]
    # course sequence: exactly the Chunk ids carrying the {slug}:c:{pos}
    # shape (the reference skips others — viz/graph2metrics.py:1609)
    chunk_ids = {r["id"] for r in nodes.filter("type = 'Chunk'").collect()}
    seq_ids = {i for i in chunk_ids if ":c:" in i}
    assert set(meta["course_sequence"]) == seq_ids
