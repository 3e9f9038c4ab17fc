"""Co-citation and bibliographic coupling — the two classic directed
link-analysis similarities (Small 1973; Kessler 1963) that HITS/SALSA
implicitly factorize, as explicit pair tables over the engine's
``(src_id, dst_id, edge_type, weight)`` edge shape.

- **co-citation**(a, b)  = |{u : u→a AND u→b}| — how many pages cite
  both a and b. High co-citation ⇒ a and b are *about* the same thing
  (the column-similarity of the adjacency matrix, AᵀA off-diagonals).
- **bibliographic coupling**(a, b) = |{w : a→w AND b→w}| — how many
  references a and b share. High coupling ⇒ a and b *draw on* the same
  sources (AAᵀ off-diagonals).

Both reduce to one directed wedge join + groupBy — the same shape as
``linkpred.link_prediction`` but orientation-aware: co-citation fans
out at each CITING page (bounded by out-degree), coupling at each
CITED page (bounded by in-degree). On a web graph the dangerous hubs
differ per direction — a directory page with 10^4 outlinks blows up
co-citation, a popular page with 10^6 inlinks blows up coupling — so
the ``max_center_degree`` cap filters on the direction that matters
and logs the drop (same contract as linkpred: capped centers lose
their credits; ``None`` = exact, what the oracle checks).

Normalizations returned alongside the raw count:

- ``jaccard``  = common / (deg_a + deg_b - common) over the relevant
  degree (in-degree for co-citation, out-degree for coupling)
- ``overlap``  = common / min(deg_a, deg_b) (overlap coefficient —
  robust when one side is a stub with 1-2 links)

Scale: |pairs| ≤ Σ_centers C(deg, 2); with the cap it is
O(|E| · max_center_degree) worst case, shuffled once on the pair key
with map-side partial aggregation. No Python anywhere.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

log = logging.getLogger(__name__)


def _pair_similarity(
    edges: DataFrame,
    center_col: str,
    other_col: str,
    max_center_degree: int | None,
    min_common: int,
    count_name: str,
) -> DataFrame:
    """Shared wedge machinery: distinct directed edges, fan out pairs of
    ``other`` at each ``center``, count per pair, normalize by the
    ``other``-side degree (= how many centers each endpoint touches)."""
    e = (
        edges.select("src_id", "dst_id")
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    adj = e.select(F.col(center_col).alias("center"), F.col(other_col).alias("other"))

    # endpoint degree = distinct centers touching it (in-degree for
    # co-citation, out-degree for coupling) — the Jaccard denominator
    deg = adj.groupBy(F.col("other").alias("v")).agg(F.count(F.lit(1)).alias("deg"))

    if max_center_degree is not None:
        cdeg = adj.groupBy("center").agg(F.count(F.lit(1)).alias("cdeg"))
        dropped = cdeg.filter(F.col("cdeg") > max_center_degree).count()
        if dropped:
            log.warning(
                "%s: dropping %d centers with fan-out > %d from wedge "
                "generation (their pairs lose those credits)",
                count_name,
                dropped,
                max_center_degree,
            )
        adj = adj.join(
            cdeg.filter(F.col("cdeg") <= max_center_degree).select("center"),
            "center",
        )

    left = adj.select("center", F.col("other").alias("id_a"))
    right = adj.select("center", F.col("other").alias("id_b"))
    # shuffle_hash: build one per-center partition hash table instead of
    # sort-merge sorting both adjacency copies (cap bounds build rows)
    pairs = (
        left.join(right.hint("shuffle_hash"), "center")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias(count_name))
        .filter(F.col(count_name) >= min_common)
    )

    out = (
        pairs.join(
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
            count_name,
            (
                F.col(count_name)
                / (F.col("deg_a") + F.col("deg_b") - F.col(count_name))
            ).alias("jaccard"),
            (F.col(count_name) / F.least("deg_a", "deg_b")).alias("overlap"),
        )
    )
    return out


def cocitation(
    spark: SparkSession,
    edges: DataFrame,
    max_center_degree: int | None = 10_000,
    min_common: int = 1,
) -> DataFrame:
    """Co-citation pairs → (id_a, id_b, cocitations, jaccard, overlap),
    id_a < id_b. Two pages are co-cited once for every page that links
    to both; jaccard/overlap normalize by in-degrees."""
    return _pair_similarity(
        edges, "src_id", "dst_id", max_center_degree, min_common, "cocitations"
    )


def bibliographic_coupling(
    spark: SparkSession,
    edges: DataFrame,
    max_center_degree: int | None = 10_000,
    min_common: int = 1,
) -> DataFrame:
    """Bibliographic-coupling pairs → (id_a, id_b, couplings, jaccard,
    overlap), id_a < id_b. Two pages are coupled once for every page
    they both link to; jaccard/overlap normalize by out-degrees."""
    return _pair_similarity(
        edges, "dst_id", "src_id", max_center_degree, min_common, "couplings"
    )
