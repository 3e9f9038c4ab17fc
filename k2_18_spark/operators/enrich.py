"""Enrichment aggregations + display filters (SURVEY.md A8/A9/P6/F16/F17).

- mention_index: per Concept node, distinct neighbors over ALL edges +
  count (reference viz/graph2metrics.py:928-977)
- node_concepts: per non-Concept node, distinct Concept neighbors
  (bidirectional; viz/graph2metrics.py:980-1018)
- edge_visibility_filter: per-type quantile threshold (display layer,
  viz/config.toml:34-41)
- clamp_weight: out-of-range LLM weight → 0.5
  (src/refiner_longrange.py:992-1000)
- truncate_tokens: embedding input cap (8000 tokens,
  src/utils/llm_embeddings.py:81-92) — whitespace-token based here
  (tiktoken unavailable, divergence documented)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _neighbor_view(edges: DataFrame) -> DataFrame:
    return edges.select(
        F.col("src_id").alias("id"), F.col("dst_id").alias("nbr")
    ).union(
        edges.select(F.col("dst_id").alias("id"), F.col("src_id").alias("nbr"))
    )


def mention_index(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A8 → (concept_id, mentioned_by array<string>, mention_count)."""
    concepts = nodes.filter(F.col("type") == "Concept").select("id")
    nbrs = _neighbor_view(edges).join(concepts, "id", "left_semi")
    return (
        nbrs.groupBy(F.col("id").alias("concept_id"))
        .agg(
            F.array_sort(F.collect_set("nbr")).alias("mentioned_by"),
            F.countDistinct("nbr").alias("mention_count"),
        )
    )


def node_concepts(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A9 → (id, concepts array<string>) for non-Concept nodes."""
    concept_ids = nodes.filter(F.col("type") == "Concept").select(
        F.col("id").alias("nbr")
    )
    non_concepts = nodes.filter(F.col("type") != "Concept").select("id")
    nbrs = (
        _neighbor_view(edges)
        .join(non_concepts, "id", "left_semi")
        .join(concept_ids, "nbr", "left_semi")
    )
    return nbrs.groupBy("id").agg(
        F.array_sort(F.collect_set("nbr")).alias("concepts")
    )


def edge_visibility_filter(
    edges: DataFrame, quantile: float = 0.5, weight_col: str = "weight"
) -> DataFrame:
    """P6: keep edges at/above the per-type weight quantile (display
    only — metrics always run on the full graph)."""
    thresholds = edges.groupBy("edge_type").agg(
        F.percentile_approx(weight_col, quantile).alias("_thr")
    )
    return (
        edges.join(F.broadcast(thresholds), "edge_type")
        .filter(F.col(weight_col) >= F.col("_thr"))
        .drop("_thr")
    )


def clamp_weight(weight: Column, default: float = 0.5) -> Column:
    """F16: weight outside [0,1] (or null/NaN) → default."""
    return F.when(
        weight.isNull() | F.isnan(weight) | (weight < 0) | (weight > 1),
        F.lit(default),
    ).otherwise(weight)


def truncate_tokens(text: Column, max_tokens: int = 8000) -> Column:
    """F17: keep the first ``max_tokens`` whitespace tokens."""
    toks = F.split(F.trim(text), r"\s+")
    return F.when(F.size(toks) <= max_tokens, text).otherwise(
        F.array_join(F.slice(toks, 1, max_tokens), " ")
    )
