"""Refiner candidate generation (SURVEY.md J4/P8/T4/J5 — the
deterministic half of src/refiner_longrange.py; the LLM judgment call
between candidate generation and the J7 upsert is out of scope).

Reference semantics:
- candidates: similarity ≥ 0.75 (src/config.toml:142) between
  Chunk nodes, FORWARD pass pos(A) < pos(B) (:538-549)
- top-k per source node by similarity desc, max_pairs_per_node=20
  (:579-581)
- J5: for each pair attach existing edges A→B and B→A (:339-363)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from k2_18_spark.operators.dedup import cosine
from k2_18_spark.operators.graph_ops import top_k_per_group
from k2_18_spark.pipeline.dedup_pipeline import global_position


def candidate_pairs(
    nodes: DataFrame,
    embeddings: DataFrame,
    sim_threshold: float = 0.75,
    max_pairs_per_node: int = 20,
    direction: str = "forward",
) -> DataFrame:
    """→ (source_id, target_id, similarity), position-ordered, top-k
    per source."""
    c = (
        nodes.filter(
            (F.col("type") == "Chunk")
            & F.col("text").isNotNull()
            & (F.trim(F.col("text")) != "")
        )
        .withColumn("pos", global_position(F.col("id")))
        .select("id", "pos")
        .join(embeddings.select(F.col("node_id").alias("id"), "vector"), "id")
    )
    a = c.select(
        F.col("id").alias("source_id"), F.col("pos").alias("pos_a"), F.col("vector").alias("va")
    )
    b = c.select(
        F.col("id").alias("target_id"), F.col("pos").alias("pos_b"), F.col("vector").alias("vb")
    )
    order_pred = (
        F.col("pos_a") < F.col("pos_b")
        if direction == "forward"
        else F.col("pos_a") > F.col("pos_b")
    )
    pairs = (
        a.crossJoin(b)
        .filter(order_pred)
        .withColumn("similarity", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("similarity") >= sim_threshold)
        .select("source_id", "target_id", "similarity")
    )
    return top_k_per_group(
        pairs, "source_id", "similarity", max_pairs_per_node, tiebreak_col="target_id"
    )


def attach_existing_edges(pairs: DataFrame, edges: DataFrame) -> DataFrame:
    """J5: collect existing A→B and B→A edges per candidate pair."""
    fwd = edges.groupBy(
        F.col("src_id").alias("source_id"), F.col("dst_id").alias("target_id")
    ).agg(
        F.collect_list(F.struct("edge_type", "weight")).alias("existing_forward")
    )
    bwd = edges.groupBy(
        F.col("dst_id").alias("source_id"), F.col("src_id").alias("target_id")
    ).agg(
        F.collect_list(F.struct("edge_type", "weight")).alias("existing_backward")
    )
    return (
        pairs.join(fwd, ["source_id", "target_id"], "left")
        .join(bwd, ["source_id", "target_id"], "left")
        .withColumn(
            "existing_forward", F.coalesce("existing_forward", F.array())
        )
        .withColumn(
            "existing_backward", F.coalesce("existing_backward", F.array())
        )
    )
