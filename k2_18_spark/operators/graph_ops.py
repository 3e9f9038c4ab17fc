"""Graph relational operators — the J/T/U series of SURVEY.md §2.

All single-pass DataFrame programs (no iteration): endpoint validation,
dedup-map rewrite, cluster joins, inter-cluster marking, bridge ratio,
top-k trims, set ops."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# -- J1: dangling-edge validation -------------------------------------------

def drop_dangling_edges(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Keep edges whose both endpoints exist (semi-joins; reference
    src/itext2kg_graph.py:585-598, src/dedup.py:325-329)."""
    ids = nodes.select("id")
    return edges.join(
        ids.withColumnRenamed("id", "src_id"), "src_id", "left_semi"
    ).join(ids.withColumnRenamed("id", "dst_id"), "dst_id", "left_semi")


def dangling_edges(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Violation report: edges with a missing endpoint (anti-join)."""
    ids = nodes.select("id")
    missing_src = edges.join(
        ids.withColumnRenamed("id", "src_id"), "src_id", "left_anti"
    )
    missing_dst = edges.join(
        ids.withColumnRenamed("id", "dst_id"), "dst_id", "left_anti"
    )
    return missing_src.unionByName(missing_dst).distinct()


# -- J2: dedup-map edge rewrite ----------------------------------------------

def rewrite_edges(edges: DataFrame, dedup_map: DataFrame) -> DataFrame:
    """Replace endpoints by master ids via broadcast map + coalesce
    (reference src/dedup.py:320-344), then drop self-loops and
    duplicate (src,dst,type) triples (U1)."""
    m = F.broadcast(dedup_map.select("duplicate_id", "master_id"))
    out = (
        edges.join(
            m.withColumnRenamed("duplicate_id", "src_id").withColumnRenamed(
                "master_id", "src_master"
            ),
            "src_id",
            "left",
        )
        .join(
            m.withColumnRenamed("duplicate_id", "dst_id").withColumnRenamed(
                "master_id", "dst_master"
            ),
            "dst_id",
            "left",
        )
        .select(
            F.coalesce("src_master", "src_id").alias("src_id"),
            F.coalesce("dst_master", "dst_id").alias("dst_id"),
            *[c for c in edges.columns if c not in ("src_id", "dst_id")],
        )
        .filter(F.col("src_id") != F.col("dst_id"))
        .dropDuplicates(["src_id", "dst_id", "edge_type"])
    )
    return out


# -- J3/G10: cluster joins + inter-cluster marking -----------------------------

def mark_inter_cluster_edges(edges: DataFrame, clusters: DataFrame) -> DataFrame:
    """Attach both endpoints' cluster_id and the inter-cluster flag
    (reference viz/graph2metrics.py:581-617)."""
    c = clusters.select("id", "cluster_id")
    return (
        edges.join(
            c.withColumnRenamed("id", "src_id").withColumnRenamed(
                "cluster_id", "source_cluster_id"
            ),
            "src_id",
            "left",
        )
        .join(
            c.withColumnRenamed("id", "dst_id").withColumnRenamed(
                "cluster_id", "target_cluster_id"
            ),
            "dst_id",
            "left",
        )
        .withColumn(
            "is_inter_cluster_edge",
            F.when(
                F.col("source_cluster_id").isNotNull()
                & F.col("target_cluster_id").isNotNull(),
                F.col("source_cluster_id") != F.col("target_cluster_id"),
            ).otherwise(F.lit(False)),
        )
    )


# -- J11/G9: neighbor sets + bridge ratio --------------------------------------

def neighbor_pairs(edges: DataFrame) -> DataFrame:
    """Distinct undirected neighbor pairs (pred ∪ succ per vertex;
    reference viz/graph2metrics.py:556-570). → (id, nbr)."""
    return (
        edges.select(F.col("src_id").alias("id"), F.col("dst_id").alias("nbr"))
        .union(edges.select(F.col("dst_id").alias("id"), F.col("src_id").alias("nbr")))
        .filter(F.col("id") != F.col("nbr"))
        .distinct()
    )


def bridge_scores(
    edges: DataFrame,
    clusters: DataFrame,
    betweenness: DataFrame,
    w_b: float = 0.7,
) -> DataFrame:
    """bridge_score = w_b·betweenness + (1-w_b)·inter_cluster_ratio
    (reference viz/graph2metrics.py:514-578). ``betweenness`` carries
    (id, betweenness_centrality); vertices with no neighbors get
    ratio 0."""
    nbrs = neighbor_pairs(edges)
    c = clusters.select("id", "cluster_id")
    ratio = (
        nbrs.join(c, "id")
        .join(
            c.withColumnRenamed("id", "nbr").withColumnRenamed(
                "cluster_id", "nbr_cluster"
            ),
            "nbr",
        )
        .groupBy("id")
        .agg(
            F.avg(
                (F.col("cluster_id") != F.col("nbr_cluster")).cast("double")
            ).alias("inter_ratio")
        )
    )
    return (
        betweenness.join(ratio, "id", "left")
        .select(
            "id",
            (
                F.lit(w_b) * F.col("betweenness_centrality")
                + F.lit(1.0 - w_b) * F.coalesce("inter_ratio", F.lit(0.0))
            ).alias("bridge_score"),
        )
    )


# -- T1/J10: top-k trim ---------------------------------------------------------

def top_k_subgraph(
    nodes_ranked: DataFrame, edges: DataFrame, k: int = 1000, rank_col: str = "pagerank"
) -> tuple[DataFrame, DataFrame]:
    """Keep top-k nodes by rank, then edges with BOTH endpoints kept
    (reference viz/graph2metrics.py:1021-1091)."""
    kept = nodes_ranked.orderBy(F.col(rank_col).desc(), F.col("id").asc()).limit(k)
    ids = kept.select("id")
    kept_edges = edges.join(
        ids.withColumnRenamed("id", "src_id"), "src_id", "left_semi"
    ).join(ids.withColumnRenamed("id", "dst_id"), "dst_id", "left_semi")
    return kept, kept_edges


# -- T4/T5: per-group top-k -------------------------------------------------------

def top_k_per_group(
    df: DataFrame, group_col: str, order_col: str, k: int, tiebreak_col: str | None = None
) -> DataFrame:
    """row_number window top-k (reference refiner max_pairs_per_node=20,
    src/refiner_longrange.py:579-581)."""
    order = [F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
