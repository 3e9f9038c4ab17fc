"""Refiner candidate generation + anomaly suite tests."""

from pyspark.sql import functions as F

from k2_18_spark.io import fixtures
from k2_18_spark.operators.anomalies import (
    bidirectional_prerequisites,
    dangling_assessments,
    iqr_outliers,
    prerequisite_cycles,
    run_all,
)
from k2_18_spark.pipeline.refiner import attach_existing_edges, candidate_pairs


def test_candidate_pairs_forward_topk(spark):
    nodes = spark.createDataFrame(
        [(f"a:c:{i*100}", "Chunk", f"text {i}") for i in range(5)],
        "id string, type string, text string",
    )
    # all vectors similar; v0 closest to v1
    vecs = {
        "a:c:0": [1.0, 0.0],
        "a:c:100": [0.99, 0.141],
        "a:c:200": [0.9, 0.436],
        "a:c:300": [0.8, 0.6],
        "a:c:400": [0.7, 0.714],
    }
    emb = spark.createDataFrame(
        list(vecs.items()), "node_id string, vector array<double>"
    )
    got = candidate_pairs(nodes, emb, sim_threshold=0.75, max_pairs_per_node=2)
    rows = got.collect()
    # forward only: source pos < target pos
    for r in rows:
        assert int(r["source_id"].split(":")[2]) < int(r["target_id"].split(":")[2])
    # top-2 per source
    from collections import Counter

    cnt = Counter(r["source_id"] for r in rows)
    assert all(v <= 2 for v in cnt.values())
    # a:c:0's best is a:c:100
    best = max(
        (r for r in rows if r["source_id"] == "a:c:0"), key=lambda r: r["similarity"]
    )
    assert best["target_id"] == "a:c:100"


def test_attach_existing_edges(spark):
    pairs = spark.createDataFrame(
        [("a", "b", 0.9), ("b", "c", 0.8)],
        "source_id string, target_id string, similarity double",
    )
    edges = spark.createDataFrame(
        [("a", "b", "MENTIONS", 0.35), ("b", "a", "ELABORATES", 0.5)],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    got = {r["source_id"]: r for r in attach_existing_edges(pairs, edges).collect()}
    assert [e["edge_type"] for e in got["a"]["existing_forward"]] == ["MENTIONS"]
    assert [e["edge_type"] for e in got["a"]["existing_backward"]] == ["ELABORATES"]
    assert got["b"]["existing_forward"] == []


def test_bidirectional_prereqs_and_cycles(spark):
    edges = spark.createDataFrame(
        [
            ("a", "b", "PREREQUISITE", 0.9),
            ("b", "a", "PREREQUISITE", 0.9),
            ("c", "d", "PREREQUISITE", 0.9),
            ("d", "e", "PREREQUISITE", 0.9),
            ("e", "c", "PREREQUISITE", 0.9),
            ("x", "y", "PREREQUISITE", 0.9),
            ("p", "q", "MENTIONS", 0.35),
        ],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    bidir = {(r["a"], r["b"]) for r in bidirectional_prerequisites(edges).collect()}
    assert bidir == {("a", "b")}
    cyc = {r["id"] for r in prerequisite_cycles(edges).collect()}
    assert cyc == {"a", "b", "c", "d", "e"}


def test_dangling_assessments(spark):
    nodes = spark.createDataFrame(
        [("q1", "Assessment", "t"), ("q2", "Assessment", "t"), ("c1", "Chunk", "t")],
        "id string, type string, text string",
    )
    edges = spark.createDataFrame(
        [("q1", "c1", "TESTS", 0.9)],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    got = {r["id"] for r in dangling_assessments(nodes, edges).collect()}
    assert got == {"q2"}


def test_iqr_outliers(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)] + [(99, 1000.0)], "id int, v double"
    )
    out = iqr_outliers(df, "v").collect()
    assert [r["id"] for r in out] == [99]


def test_run_all_on_fixture(spark):
    from k2_18_spark.pipeline.metrics import compute_all_metrics

    nodes, edges, _ = fixtures.load_fixture(spark, "test_educational")
    nout, _, _ = compute_all_metrics(spark, nodes, edges)
    report = run_all(nout, edges)
    assert report["ok"], report
