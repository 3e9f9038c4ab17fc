"""Global graph statistics — reciprocity and degree assortativity
(north_rule additions: the standard whole-graph health measures for a
directed web link graph; not present in the reference).

Both are single aggregates over the edge table — no driver-side state
beyond the scalar result, every step a groupBy/join with map-side
partial aggregation.

- ``reciprocity``: nx.overall_reciprocity semantics — on the simple
  directed graph (parallel edges collapsed), the fraction of directed
  edges whose reverse edge also exists; self-loops stay in the
  denominator but are never counted as reciprocated (measured against
  nx 3.6, not assumed).
- ``degree_assortativity``: nx.degree_assortativity_coefficient
  semantics on the simple undirected projection — the Pearson
  correlation of endpoint degrees over the mirrored edge list
  (each edge contributes both (deg u, deg v) and (deg v, deg u);
  self-loops dropped with the projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def reciprocity(spark: SparkSession, edges: DataFrame) -> float:
    """Fraction of directed edges with an existing reverse edge."""
    e = edges.select("src_id", "dst_id").distinct()
    rev = e.select(F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id"))
    row = (
        e.filter(F.col("src_id") != F.col("dst_id"))
        .join(rev.hint("shuffle_hash"), ["src_id", "dst_id"], "left_semi")
        .agg(F.count(F.lit(1)).alias("recip"))
        .collect()[0]
    )
    total = e.count()
    if total == 0:
        raise ValueError("reciprocity is undefined for an empty graph")
    return row["recip"] / total


def degree_assortativity(spark: SparkSession, edges: DataFrame) -> float:
    """Pearson degree-degree correlation on the undirected projection."""
    und = (
        edges.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    mirrored = und.unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    xy = (
        mirrored.join(
            deg.select(F.col("v").alias("a"), F.col("deg").alias("x")).hint(
                "shuffle_hash"
            ),
            "a",
        )
        .join(
            deg.select(F.col("v").alias("b"), F.col("deg").alias("y")).hint(
                "shuffle_hash"
            ),
            "b",
        )
        .select(F.col("x").cast("double"), F.col("y").cast("double"))
    )
    r = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).collect()[0]
    n = r["n"]
    if n == 0:
        raise ValueError("assortativity is undefined without edges")
    cov = r["sxy"] / n - (r["sx"] / n) * (r["sy"] / n)
    vx = r["sxx"] / n - (r["sx"] / n) ** 2
    vy = r["syy"] / n - (r["sy"] / n) ** 2
    if vx == 0 or vy == 0:
        raise ValueError("assortativity is undefined on a degree-regular graph")
    return cov / (vx * vy) ** 0.5
