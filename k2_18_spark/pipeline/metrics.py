"""The full graph2metrics DAG (SURVEY.md §3.1) — the engine's flagship.

Mirrors the reference's mandated computation order
(viz/graph2metrics.py:739-885; docs "Computation Sequence"):

1. inverse edge weights (F11)
2. degrees + degree centrality + weighted PageRank (A1/A2/G1)
3. betweenness + out-closeness (G6/G7)
4. component ids, deterministic renumbering (G3)
5. prerequisite depth / learning effort (G5)
6. educational importance (G2)
7. PageRank-sum invariants (A4)
8. clustering (LPA — distributed stand-in for Louvain, SURVEY §7)
9. bridge scores + inter-cluster edge marking (G9/G10)
10. metrics joined back onto nodes/edges (J8)

Returns (nodes_with_metrics, edges_with_metrics, summary_dict).
Iterative stages share the superstep/checkpoint machinery; the
join-back is a chain of left joins on id (one shuffle each, all
vertex-sized tables — AQE broadcasts the small sides at fixture scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k2_18_spark.functions.weights import safe_metric, sanitized_inverse_weight
from k2_18_spark.graph.centrality import betweenness_closeness
from k2_18_spark.graph.components import connected_components
from k2_18_spark.graph.lpa import label_propagation
from k2_18_spark.graph.pagerank import educational_importance, pagerank
from k2_18_spark.graph.scc import prerequisite_metrics
from k2_18_spark.operators.degrees import degrees
from k2_18_spark.operators.graph_ops import bridge_scores, mark_inter_cluster_edges


def compute_all_metrics(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    betweenness_sample_k: int | None = None,
    bridge_weight_betweenness: float = 0.7,
    louvain_max_nodes: int = 1000,
    louvain_resolution: float = 1.2,
    scale_cluster_method: str = "louvain",
) -> tuple[DataFrame, DataFrame, dict]:
    """nodes/edges → (nodes+12 metrics, edges+inverse_weight+cluster
    marks, summary).

    Clustering is two-tier like the reference's practical envelope:
    graphs up to ``louvain_max_nodes`` run the reference's exact
    algorithm (driver-side Louvain, resolution/random_state semantics
    of viz/graph2metrics.py:417-511 — the reference itself caps at
    ~5000 nodes); larger graphs run the DISTRIBUTED Louvain superstep
    loop (graph/louvain_dist.py — same greedy-modularity objective and
    resolution, deterministic semi-synchronous moves) or, with
    ``scale_cluster_method="lpa"``, the round-2 LPA substitution.
    ``louvain_max_nodes=0`` forces the scale tier everywhere."""
    nodes = nodes.cache()
    edges = edges.cache()

    deg = degrees(edges, nodes)
    # the reference retries nx.pagerank with tol=1e-3 on
    # PowerIterationFailedConvergence (viz/graph2metrics.py:719-725)
    from k2_18_spark.graph.pagerank import PowerIterationFailedConvergence

    try:
        pr = pagerank(
            spark, edges, nodes=nodes, checkpoint_dir=checkpoint_dir,
            job_name="pagerank",
        )
    except PowerIterationFailedConvergence:
        pr = pagerank(
            spark, edges, nodes=nodes, checkpoint_dir=checkpoint_dir,
            job_name="pagerank_retry", tol=1e-3,
        )
    pr = pr.withColumnRenamed("rank", "pagerank")
    cent = betweenness_closeness(
        spark, edges, nodes=nodes, sample_k=betweenness_sample_k
    )
    comp = connected_components(
        spark, edges, nodes=nodes, checkpoint_dir=checkpoint_dir
    )
    prereq = prerequisite_metrics(spark, edges, nodes)
    edu = educational_importance(
        spark, edges, nodes=nodes, checkpoint_dir=checkpoint_dir
    ).withColumnRenamed("rank", "educational_importance")
    n_nodes = nodes.count()
    if n_nodes <= louvain_max_nodes:
        from k2_18_spark.graph.louvain import louvain_clustering

        clusters = louvain_clustering(
            spark, edges, nodes=nodes, resolution=louvain_resolution
        )
    elif scale_cluster_method == "lpa":
        clusters = label_propagation(
            spark, edges, nodes=nodes, checkpoint_dir=checkpoint_dir
        )
    else:
        from k2_18_spark.graph.louvain_dist import louvain_superstep

        clusters = louvain_superstep(
            spark, edges, nodes=nodes, resolution=louvain_resolution,
            checkpoint_dir=checkpoint_dir,
        )

    bridge = bridge_scores(
        edges,
        clusters,
        cent.select("id", "betweenness_centrality"),
        w_b=bridge_weight_betweenness,
    )

    node_metrics = (
        deg.join(pr, "id", "left")
        .join(cent, "id", "left")
        .join(comp, "id", "left")
        .join(prereq, "id", "left")
        .join(edu, "id", "left")
        .join(clusters, "id", "left")
        .join(bridge, "id", "left")
    )
    # NaN/inf/None → 0.0 for float metrics (reference safe_metric_value)
    float_metrics = [
        "degree_centrality",
        "pagerank",
        "betweenness_centrality",
        "out_closeness",
        "educational_importance",
        "learning_effort",
        "bridge_score",
    ]
    for c in float_metrics:
        node_metrics = node_metrics.withColumn(c, safe_metric(F.col(c)))

    nodes_out = nodes.join(node_metrics, "id", "left")

    edges_iw = edges.withColumn(
        "inverse_weight", sanitized_inverse_weight(F.col("weight"))
    )
    edges_out = mark_inter_cluster_edges(edges_iw, clusters)

    # A4 invariants: PageRank mass conservation
    pr_sum = pr.agg(F.sum("pagerank")).collect()[0][0] or 0.0
    edu_sum = edu.agg(F.sum("educational_importance")).collect()[0][0] or 0.0
    summary = {
        "nodes": n_nodes,
        "edges": edges.count(),
        "pagerank_sum": pr_sum,
        "educational_importance_sum": edu_sum,
        "pagerank_sum_ok": abs(pr_sum - 1.0) <= 0.01,
        "educational_importance_sum_ok": abs(edu_sum - 1.0) <= 0.01,
        "num_components": comp.agg(F.countDistinct("component_id")).collect()[0][0],
        "num_clusters": clusters.agg(F.countDistinct("cluster_id")).collect()[0][0],
    }
    return nodes_out, edges_out, summary


def run_graph2metrics(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    demo_path_strategy: int = 1,
    demo_path_max_nodes: int = 15,
    **kwargs,
) -> tuple[DataFrame, DataFrame, dict]:
    """The reference's COMPLETE graph2metrics run: metrics DAG + the
    ``_meta`` payload (demo path, course sequence, generation config —
    viz/graph2metrics.py:1514-1635 attach both to ``_meta``).

    → (nodes_with_metrics, edges_with_metrics, meta) where ``meta``
    carries the summary plus ``demo_path``, ``demo_generation_config``
    and ``course_sequence``."""
    from k2_18_spark.pipeline.demo_path import generate_demo_path
    from k2_18_spark.pipeline.paths import course_sequence

    nodes_out, edges_out, summary = compute_all_metrics(
        spark, nodes, edges, **kwargs
    )
    meta = dict(summary)
    meta.update(
        generate_demo_path(
            spark,
            nodes_out,
            edges,
            strategy=demo_path_strategy,
            max_nodes=demo_path_max_nodes,
        )
    )
    # reference _meta shape (viz/graph2metrics.py:1608-1618): a list of
    # {id, cluster_id, position} dicts, cluster_id defaulting to 0
    seq = (
        course_sequence(nodes)
        .join(nodes_out.select("id", "cluster_id"), "id", "left")
        .orderBy("sequence_order")
        .select(
            "id",
            F.coalesce(F.col("cluster_id"), F.lit(0)).alias("cluster_id"),
            "position",
        )
    )
    meta["course_sequence"] = [
        {"id": r["id"], "cluster_id": int(r["cluster_id"]), "position": int(r["position"])}
        for r in seq.collect()
    ]
    return nodes_out, edges_out, meta
