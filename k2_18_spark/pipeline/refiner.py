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
    candidate_fn="auto",
    auto_exact_max: int | None = None,
) -> DataFrame:
    """→ (source_id, target_id, similarity), position-ordered, top-k
    per source.

    ``candidate_fn``: (id, vector) DataFrame → (id_a, id_b) unordered
    candidate pairs with id_a < id_b (same contract as
    dedup_pipeline.find_duplicate_pairs). ``"auto"`` (default)
    size-switches exact↔LSH at ``auto_exact_max`` input rows
    (dedup_pipeline.AUTO_EXACT_MAX when None); None = all pairs
    (fixture parity — the reference uses FAISS k-NN here precisely to
    avoid all-pairs, src/refiner_longrange.py:473-600); pass
    ``dedup_pipeline.lsh_candidates(dim=...)`` to pin the bucketed
    scale path. Orientation (source = earlier position for the forward
    pass, later for backward) is applied AFTER candidate generation,
    so both passes share one candidate set."""
    from k2_18_spark.pipeline.dedup_pipeline import (
        AUTO_EXACT_MAX,
        resolve_candidate_fn,
    )

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
    vecs = c.select("id", "vector")
    candidate_fn = resolve_candidate_fn(
        vecs, candidate_fn, auto_exact_max or AUTO_EXACT_MAX
    )
    id_pairs = candidate_fn(vecs)

    a = c.select(
        F.col("id").alias("id_a"), F.col("pos").alias("pos_a"), F.col("vector").alias("va")
    )
    b = c.select(
        F.col("id").alias("id_b"), F.col("pos").alias("pos_b"), F.col("vector").alias("vb")
    )
    scored = (
        id_pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("pos_a") != F.col("pos_b"))
        .withColumn("similarity", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("similarity") >= sim_threshold)
    )
    # candidate pairs are unordered (id_a < id_b); orient by position
    a_first = (
        F.col("pos_a") < F.col("pos_b")
        if direction == "forward"
        else F.col("pos_a") > F.col("pos_b")
    )
    pairs = scored.select(
        F.when(a_first, F.col("id_a")).otherwise(F.col("id_b")).alias("source_id"),
        F.when(a_first, F.col("id_b")).otherwise(F.col("id_a")).alias("target_id"),
        "similarity",
    )
    return top_k_per_group(
        pairs, "source_id", "similarity", max_pairs_per_node, tiebreak_col="target_id"
    )


def attach_existing_edges(pairs: DataFrame, edges: DataFrame) -> DataFrame:
    """J5: collect existing A→B and B→A edges per candidate pair.

    The edge table is semi-joined against the candidate pairs BEFORE
    the collect_list aggregations: edges are the largest table in the
    system, and aggregating all of them to then left-join a small pair
    set would shuffle O(|E|) twice for rows that are almost all
    discarded. With the semi-join the edge-side shuffle is O(|pairs|)
    matched rows only; output is identical (left join + coalesce to
    empty array covers pairs with no existing edges either way)."""
    keys = pairs.select("source_id", "target_id")
    fwd = (
        edges.select(
            F.col("src_id").alias("source_id"),
            F.col("dst_id").alias("target_id"),
            "edge_type",
            "weight",
        )
        .join(keys, ["source_id", "target_id"], "left_semi")
        .groupBy("source_id", "target_id")
        .agg(
            F.collect_list(F.struct("edge_type", "weight")).alias(
                "existing_forward"
            )
        )
    )
    bwd = (
        edges.select(
            F.col("dst_id").alias("source_id"),
            F.col("src_id").alias("target_id"),
            "edge_type",
            "weight",
        )
        .join(keys, ["source_id", "target_id"], "left_semi")
        .groupBy("source_id", "target_id")
        .agg(
            F.collect_list(F.struct("edge_type", "weight")).alias(
                "existing_backward"
            )
        )
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
