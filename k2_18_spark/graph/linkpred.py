"""Neighborhood link prediction — common neighbors, Jaccard, and
Adamic-Adar scores over an edge table (north_rule addition: link-graph
analytics the reference's NetworkX pipeline exposes via
``nx.jaccard_coefficient`` / ``nx.adamic_adar_index``; not used by the
reference itself, but a first-class operator for a web link graph).

Algorithm (all joins + groupBy, no Python in the hot path):

1. undirected distinct edge set, canonical (a < b), self-loops dropped
2. degree table from the canonical set
3. wedges: adjacency ⋈ adjacency on the shared CENTER vertex →
   candidate pair (a, b), a < b, one row per common neighbor
4. groupBy (a, b): common = count, adamic_adar = Σ 1/ln(deg_center)
5. join degrees of a and b → jaccard = common / (deg_a + deg_b - common)
6. optionally anti-join the existing edge set (link prediction scores
   NON-edges; ``include_existing=True`` keeps them for similarity use)

Scale: wedge fan-out at a center v is C(deg v, 2) — quadratic in hub
degree, the same blow-up the triangle counter dodges by degree-
orienting. Exact scores need BOTH wedge sides, so orientation is not
available here; instead hub centers above ``max_center_degree`` are
dropped from step 3 with their count logged (the standard web-scale
cap: a 10^6-degree hub contributes a near-zero Adamic-Adar term
1/ln(10^6) and pure noise to "similarity", while generating 10^12
wedges). ``max_center_degree=None`` disables the cap (exact mode —
what the small-data oracle checks).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

log = logging.getLogger(__name__)


def _canonical_undirected(edges: DataFrame) -> DataFrame:
    """Distinct undirected edge set → (a, b) with a < b."""
    return (
        edges.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def link_prediction(
    spark: SparkSession,
    edges: DataFrame,
    max_center_degree: int | None = 10_000,
    include_existing: bool = False,
    min_common: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Score vertex pairs by shared neighborhood →
    (id_a, id_b, common_neighbors, jaccard, adamic_adar), id_a < id_b.

    ``max_center_degree``: hub centers above this degree are excluded
    from wedge generation (logged; None = exact). ``include_existing``
    keeps pairs that are already edges (default drops them — link
    PREDICTION scores absent edges). ``min_common`` floors the common-
    neighbor count (1 = every candidate pair).
    """
    und = _canonical_undirected(edges)
    if num_partitions:
        und = und.repartition(num_partitions, "a")
    und = und.persist(StorageLevel.MEMORY_AND_DISK)

    deg = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    ).persist(StorageLevel.MEMORY_AND_DISK)

    # adjacency rows (center, other) in both directions
    adj = und.select(F.col("a").alias("center"), F.col("b").alias("other")).unionByName(
        und.select(F.col("b").alias("center"), F.col("a").alias("other"))
    )
    centers = deg.select(F.col("v").alias("center"), "deg")
    if max_center_degree is not None:
        dropped = centers.filter(F.col("deg") > max_center_degree).count()
        if dropped:
            log.warning(
                "link_prediction: dropping %d hub centers with degree > %d "
                "from wedge generation (their pairs lose those common-"
                "neighbor credits)",
                dropped,
                max_center_degree,
            )
        centers = centers.filter(F.col("deg") <= max_center_degree)
    adj = adj.join(centers, "center")

    # one row per (pair, shared neighbor); map-side partial agg folds
    # the Σ before the (a, b) shuffle
    left = adj.select("center", F.col("other").alias("id_a"), "deg")
    right = adj.select("center", F.col("other").alias("id_b"))
    # shuffle_hash: hash one adjacency copy per center-partition instead
    # of sort-merge sorting BOTH copies (the cap bounds per-center rows,
    # so the build side is safe even on power-law graphs)
    pair_scores = (
        left.join(right.hint("shuffle_hash"), "center")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(1.0 / F.log("deg")).alias("adamic_adar"),
        )
        .filter(F.col("common_neighbors") >= min_common)
    )

    if not include_existing:
        pair_scores = pair_scores.join(
            und.select(F.col("a").alias("id_a"), F.col("b").alias("id_b")).hint(
                "shuffle_hash"
            ),
            ["id_a", "id_b"],
            "left_anti",
        )

    # degree joins: hash the |V|-row degree table, stream the pair set
    out = (
        pair_scores.join(
            deg.select(F.col("v").alias("id_a"), F.col("deg").alias("deg_a")).hint(
                "shuffle_hash"
            ),
            "id_a",
        )
        .join(
            deg.select(F.col("v").alias("id_b"), F.col("deg").alias("deg_b")).hint(
                "shuffle_hash"
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "common_neighbors",
            (
                F.col("common_neighbors")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common_neighbors"))
            ).alias("jaccard"),
            "adamic_adar",
        )
    )
    return out


def top_predictions(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 10,
    score: str = "adamic_adar",
    **kwargs,
) -> DataFrame:
    """Top-k predicted links per vertex by ``score`` →
    (id, candidate, common_neighbors, jaccard, adamic_adar).

    Both orientations of each scored pair compete for each endpoint's
    top-k (the pair table is canonical a < b; a vertex's candidates
    live on either side)."""
    from pyspark.sql import Window

    scored = link_prediction(spark, edges, **kwargs)
    both = scored.select(
        F.col("id_a").alias("id"),
        F.col("id_b").alias("candidate"),
        "common_neighbors",
        "jaccard",
        "adamic_adar",
    ).unionByName(
        scored.select(
            F.col("id_b").alias("id"),
            F.col("id_a").alias("candidate"),
            "common_neighbors",
            "jaccard",
            "adamic_adar",
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col(score).desc(), F.col("candidate").asc()
    )
    return (
        both.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
