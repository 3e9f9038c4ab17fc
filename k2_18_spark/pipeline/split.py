"""Cluster-wise graph splitting (SURVEY.md S8/J9/A11 —
reference viz/graph_split.py).

- nodes partitioned by cluster_id; edges assigned to a cluster when
  BOTH endpoints belong to it (intra), counted per cluster when
  exactly one does (A11 inter-cluster XOR count,
  viz/graph_split.py:281-291)
- concept dictionary enriched per cluster via broadcast join (J9)
- sink: ``write.partitionBy("cluster_id")`` — the Spark-native
  equivalent of the reference's zero-padded per-cluster files (T7)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_edges(edges: DataFrame, clusters: DataFrame) -> tuple[DataFrame, DataFrame]:
    """→ (intra_edges with cluster_id, inter_counts per cluster)."""
    c = clusters.select("id", "cluster_id")
    e = edges.join(
        c.withColumnRenamed("id", "src_id").withColumnRenamed(
            "cluster_id", "src_cluster"
        ),
        "src_id",
        "left",
    ).join(
        c.withColumnRenamed("id", "dst_id").withColumnRenamed(
            "cluster_id", "dst_cluster"
        ),
        "dst_id",
        "left",
    )
    intra = e.filter(F.col("src_cluster") == F.col("dst_cluster")).withColumn(
        "cluster_id", F.col("src_cluster")
    ).drop("src_cluster", "dst_cluster")
    # A11: edges with exactly one endpoint in the cluster
    inter = e.filter(F.col("src_cluster") != F.col("dst_cluster"))
    inter_counts = (
        inter.select(F.col("src_cluster").alias("cluster_id"))
        .union(inter.select(F.col("dst_cluster").alias("cluster_id")))
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("inter_cluster_edges"))
    )
    return intra, inter_counts


def cluster_concepts(
    nodes: DataFrame, clusters: DataFrame, concepts: DataFrame
) -> DataFrame:
    """J9: concept_id → cluster of its Concept node; broadcast join."""
    concept_clusters = (
        nodes.filter(F.col("type") == "Concept")
        .select("id")
        .join(clusters, "id")
        .withColumnRenamed("id", "concept_id")
    )
    return concepts.join(F.broadcast(concept_clusters), "concept_id", "left")


def write_split(
    nodes: DataFrame,
    edges_intra: DataFrame,
    clusters: DataFrame,
    out_dir: str,
) -> None:
    """S8 sink: per-cluster partitioned parquet."""
    nodes.join(clusters, "id").write.mode("overwrite").partitionBy(
        "cluster_id"
    ).parquet(f"{out_dir}/nodes")
    edges_intra.write.mode("overwrite").partitionBy("cluster_id").parquet(
        f"{out_dir}/edges"
    )
