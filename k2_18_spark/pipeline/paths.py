"""Course sequence + demo-path building blocks (SURVEY.md T3, G13, T5).

- course_sequence: parse ``{slug}:c:{position}`` Chunk ids, order by
  position (reference viz/graph2metrics.py:1582-1635)
- ancestors: reverse BFS over a filtered edge-type set from a start
  vertex (strategy-3 demo path, viz/graph2metrics.py:1413-1433) as an
  iterative frontier join
- top_node_per_cluster: max-PageRank representative (T5)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEMO_PATH_EDGE_TYPES = ["PREREQUISITE", "ELABORATES", "EXAMPLE_OF"]


def course_sequence(nodes: DataFrame) -> DataFrame:
    """Chunk nodes ordered by position → (id, slug, position,
    sequence_order).

    Reference semantics (viz/graph2metrics.py:1599-1624): only Chunk
    ids containing ``:c:`` participate, position = int after ``:c:``
    (unparseable ids are skipped with a warning there, filtered here),
    and the sequence sorts by POSITION ALONE across slugs (ties broken
    by id for determinism; the reference keeps input order)."""
    split = F.split("id", ":c:")
    chunks = (
        nodes.filter((F.col("type") == "Chunk") & F.col("id").contains(":c:"))
        .select(
            "id",
            split.getItem(0).alias("slug"),
            # try_cast: non-numeric positions are skipped, not ANSI errors
            F.get(split, 1).try_cast("long").alias("position"),
        )
        .filter(F.col("position").isNotNull())
    )
    w = Window.orderBy("position", "id")
    return chunks.withColumn("sequence_order", F.row_number().over(w))


def ancestors(
    spark: SparkSession,
    edges: DataFrame,
    start_id: str,
    edge_types: list[str] | None = None,
    max_depth: int = 100,
) -> DataFrame:
    """All ancestors of ``start_id`` over the reversed filtered edges.
    → (id, depth) with depth = BFS distance (start excluded)."""
    types = [t.upper() for t in (edge_types or DEMO_PATH_EDGE_TYPES)]
    rev = (
        edges.filter(F.upper("edge_type").isin(types))
        .select(F.col("dst_id").alias("from_id"), F.col("src_id").alias("to_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = spark.createDataFrame([(start_id,)], "id string")
    visited = frontier.withColumn("depth", F.lit(0)).localCheckpoint(eager=True)
    for depth in range(1, max_depth + 1):
        nxt = (
            rev.join(frontier.withColumnRenamed("id", "from_id"), "from_id")
            .select(F.col("to_id").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.withColumn("depth", F.lit(depth))
        ).localCheckpoint(eager=True)
        frontier = nxt
    return visited.filter(F.col("id") != start_id)


def top_node_per_cluster(
    node_metrics: DataFrame, rank_col: str = "pagerank"
) -> DataFrame:
    """T5: max-rank representative per cluster."""
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(rank_col).desc(), F.col("id").asc()
    )
    return (
        node_metrics.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
