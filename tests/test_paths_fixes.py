"""Course sequence / ancestors / top-per-cluster / fix transforms."""

from k2_18_spark import schemas
from k2_18_spark.operators.fixes import concept_display_text, tag_llm_text
from k2_18_spark.pipeline.paths import ancestors, course_sequence, top_node_per_cluster

from pyspark.sql import functions as F


def test_course_sequence(spark):
    nodes = spark.createDataFrame(
        [
            ("alg:c:200", "Chunk", "t"),
            ("alg:c:0", "Chunk", "t"),
            ("alg:c:100", "Chunk", "t"),
            ("alg:q:0:0", "Assessment", "t"),
            ("zlg:c:50", "Chunk", "t"),
        ],
        "id string, type string, text string",
    )
    got = [r["id"] for r in course_sequence(nodes).orderBy("sequence_order").collect()]
    # reference orders by POSITION alone across slugs
    # (viz/graph2metrics.py:1624), not slug-major
    assert got == ["alg:c:0", "zlg:c:50", "alg:c:100", "alg:c:200"]


def test_ancestors_reverse_bfs(spark):
    edges = spark.createDataFrame(
        [
            ("a", "b", "PREREQUISITE", 0.9),
            ("b", "c", "ELABORATES", 0.9),
            ("x", "c", "EXAMPLE_OF", 0.9),
            ("z", "a", "MENTIONS", 0.35),  # excluded type
            ("c", "d", "PREREQUISITE", 0.9),  # descendant, not ancestor
        ],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    got = {r["id"]: r["depth"] for r in ancestors(spark, edges, "c").collect()}
    assert got == {"b": 1, "x": 1, "a": 2}


def test_top_node_per_cluster(spark):
    nm = spark.createDataFrame(
        [("a", 0, 0.5), ("b", 0, 0.9), ("c", 1, 0.2)],
        "id string, cluster_id int, pagerank double",
    )
    got = {r["cluster_id"]: r["id"] for r in top_node_per_cluster(nm).collect()}
    assert got == {0: "b", 1: "c"}


def test_tag_llm_text(spark):
    df = spark.createDataFrame(
        [("plain definition",), ("added_by=refiner_longrange_v1 kept",), (None,)],
        "definition string",
    )
    got = [r["out"] for r in df.select(tag_llm_text(F.col("definition")).alias("out")).collect()]
    assert got[0] == "[added_by=LLM] plain definition"
    assert got[1] == "added_by=refiner_longrange_v1 kept"
    assert got[2] is None


def test_concept_display_text(spark):
    concepts = spark.createDataFrame(
        [
            ("p1", ("Graph", ["graphs", "network"]), "d"),
            ("p2", ("Sort", None), "d"),
        ],
        schemas.CONCEPTS,
    )
    got = {r["concept_id"]: r["display_text"] for r in concept_display_text(concepts).collect()}
    assert got == {"p1": "Graph (graphs, network)", "p2": "Sort"}


def test_mention_index_and_node_concepts(spark):
    nodes = spark.createDataFrame(
        [("p1", "Concept", "t"), ("c1", "Chunk", "t"), ("c2", "Chunk", "t")],
        "id string, type string, text string",
    )
    edges = spark.createDataFrame(
        [
            ("c1", "p1", "MENTIONS", 0.35),
            ("p1", "c2", "ELABORATES", 0.5),
            ("c1", "c2", "PREREQUISITE", 0.9),
        ],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    from k2_18_spark.operators.enrich import mention_index, node_concepts

    mi = {r["concept_id"]: r for r in mention_index(nodes, edges).collect()}
    assert mi["p1"]["mentioned_by"] == ["c1", "c2"]
    assert mi["p1"]["mention_count"] == 2
    nc = {r["id"]: r["concepts"] for r in node_concepts(nodes, edges).collect()}
    assert nc == {"c1": ["p1"], "c2": ["p1"]}


def test_edge_visibility_and_clamp_and_truncate(spark):
    from k2_18_spark.operators.enrich import (
        clamp_weight,
        edge_visibility_filter,
        truncate_tokens,
    )

    edges = spark.createDataFrame(
        [("a", "b", "MENTIONS", w / 10.0) for w in range(1, 11)]
        + [("a", "b", "TESTS", 0.9)],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    kept = edge_visibility_filter(edges, quantile=0.5)
    m = kept.filter("edge_type='MENTIONS'").count()
    assert 4 <= m <= 6  # at/above median
    assert kept.filter("edge_type='TESTS'").count() == 1

    df = spark.createDataFrame(
        [(1.5,), (-0.1,), (0.7,), (None,)], "w double"
    )
    got = [r["c"] for r in df.select(clamp_weight(F.col("w")).alias("c")).collect()]
    assert got == [0.5, 0.5, 0.7, 0.5]

    t = spark.createDataFrame([("one two three four",)], "text string")
    got = t.select(truncate_tokens(F.col("text"), 2).alias("t")).collect()[0]["t"]
    assert got == "one two"
