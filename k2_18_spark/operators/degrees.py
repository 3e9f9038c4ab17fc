"""Degree metrics (SURVEY.md A1/A2).

Reference semantics (viz/graph2metrics.py:711-713): degrees are counted
on the NetworkX DiGraph, i.e. after the last-edge-per-(src,dst)
collapse; degree_centrality = (deg_in + deg_out) / (n-1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from k2_18_spark.graph.adjacency import metrics_view, vertex_ids


def degrees(edges: DataFrame, nodes: DataFrame | None = None) -> DataFrame:
    """→ (id, degree_in, degree_out, degree_centrality)."""
    e = metrics_view(edges)
    verts = vertex_ids(edges, nodes)
    n = verts.count()

    out_deg = e.groupBy(F.col("src_id").alias("id")).agg(
        F.count(F.lit(1)).alias("degree_out")
    )
    in_deg = e.groupBy(F.col("dst_id").alias("id")).agg(
        F.count(F.lit(1)).alias("degree_in")
    )
    # nx.degree_centrality special-cases n <= 1: every node gets 1.0
    # (networkx/algorithms/centrality/degree_alg.py — `if len(G) <= 1`)
    cent = (
        F.lit(1.0)
        if n <= 1
        else (F.col("degree_in") + F.col("degree_out")) / F.lit(float(n - 1))
    )
    return (
        verts.join(in_deg, "id", "left")
        .join(out_deg, "id", "left")
        .select(
            "id",
            F.coalesce("degree_in", F.lit(0)).cast("int").alias("degree_in"),
            F.coalesce("degree_out", F.lit(0)).cast("int").alias("degree_out"),
        )
        .withColumn("degree_centrality", cent)
    )
