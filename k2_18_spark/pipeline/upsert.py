"""Edge-upsert merge (SURVEY.md J7) — the refiner's graph-update rule.

Reference semantics (src/refiner_longrange.py:1021-1193), per new edge
keyed by (source, target):
- no existing edge for the pair → ADD, conditions
  ``added_by=refiner_longrange_v1``
- same (source, target, type) exists → keep max weight (UPDATE when the
  new weight is strictly greater)
- pair exists only with other types → if new weight ≥ max existing
  weight of the pair, REMOVE all the pair's edges and add the new one
  with ``fixed_by=refiner_longrange_v1``; else keep existing
- finally drop PREREQUISITE self-loops (:1173-1184)

Batch divergence (documented): the reference applies new edges
sequentially, so two new edges hitting the same pair see each other's
effects. The Spark version is set-oriented: new edges are first
collapsed to the max-weight edge per (src,dst,type), then resolved
against the existing table in one pass — identical to the sequential
result whenever each (src,dst) appears once in the batch (the refiner
dedupes candidate pairs, so this is the reference's own steady state).

Shape: one full-outer-style resolution via joins + ``when`` — or an
Iceberg ``MERGE INTO`` with custom matched clauses where a catalog
exists; this sandbox has no Iceberg jars, so the join form is the
implementation and the MERGE mapping is noted per clause.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ADDED_MARK = "added_by=refiner_longrange_v1"
FIXED_MARK = "fixed_by=refiner_longrange_v1"


def upsert_edges(existing: DataFrame, new: DataFrame) -> tuple[DataFrame, DataFrame]:
    """→ (merged_edges, outcome_stats).

    ``existing``/``new``: (src_id, dst_id, edge_type, weight[, conditions]).
    outcome_stats: (outcome, edge_type, n) with outcome ∈
    {added, updated, replaced, kept}.
    """
    if "conditions" not in existing.columns:
        existing = existing.withColumn("conditions", F.lit(None).cast("string"))

    # collapse the new batch: max weight per (src,dst,type)
    w = Window.partitionBy("src_id", "dst_id", "edge_type").orderBy(
        F.col("weight").desc()
    )
    new = (
        new.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .select("src_id", "dst_id", "edge_type", "weight")
    )

    # per-pair context from the existing table
    pair_stats = existing.groupBy("src_id", "dst_id").agg(
        F.max(F.coalesce("weight", F.lit(0.5))).alias("pair_max_w")
    )
    same_type = existing.select(
        "src_id",
        "dst_id",
        "edge_type",
        F.coalesce("weight", F.lit(0.5)).alias("old_weight"),
    )

    resolved = (
        new.join(pair_stats, ["src_id", "dst_id"], "left")
        .join(same_type, ["src_id", "dst_id", "edge_type"], "left")
        .withColumn(
            "outcome",
            F.when(F.col("pair_max_w").isNull(), F.lit("added"))  # MERGE: NOT MATCHED → INSERT
            .when(
                F.col("old_weight").isNotNull(),
                F.when(F.col("weight") > F.col("old_weight"), F.lit("updated"))
                .otherwise(F.lit("kept")),  # MATCHED same type → UPDATE weight
            )
            .when(
                F.col("weight") >= F.col("pair_max_w"), F.lit("replaced")
            )  # MATCHED other types → DELETE pair + INSERT
            .otherwise(F.lit("kept")),
        )
    ).cache()

    stats = resolved.groupBy("outcome", "edge_type").agg(F.count(F.lit(1)).alias("n"))

    # pairs whose existing edges are removed by a replacement
    replaced_pairs = resolved.filter(F.col("outcome") == "replaced").select(
        "src_id", "dst_id"
    )
    # existing edges that get a weight bump
    updates = resolved.filter(F.col("outcome") == "updated").select(
        "src_id", "dst_id", "edge_type", F.col("weight").alias("new_weight")
    )

    survivors = (
        existing.join(replaced_pairs, ["src_id", "dst_id"], "left_anti")
        .join(updates, ["src_id", "dst_id", "edge_type"], "left")
        .select(
            "src_id",
            "dst_id",
            "edge_type",
            F.coalesce("new_weight", "weight").alias("weight"),
            "conditions",
        )
    )
    additions = resolved.filter(F.col("outcome").isin("added", "replaced")).select(
        "src_id",
        "dst_id",
        "edge_type",
        "weight",
        F.when(F.col("outcome") == "added", F.lit(ADDED_MARK))
        .otherwise(F.lit(FIXED_MARK))
        .alias("conditions"),
    )

    merged = survivors.unionByName(additions).filter(
        ~(
            (F.col("edge_type") == "PREREQUISITE")
            & (F.col("src_id") == F.col("dst_id"))
        )
    )
    return merged, stats
