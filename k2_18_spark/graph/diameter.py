"""BFS distances and double-sweep pseudo-diameter — the cheap exact-ish
diameter statistic every webgraph release quotes next to the ANF
effective diameter (``graph/anf.py`` estimates the distance
DISTRIBUTION; the double sweep pins a concrete witness path).

``bfs_distances`` is the engine's generic unweighted frontier loop:
one shuffle-hash join of the frontier against the persisted
src-partitioned edges + one anti-join against the visited set per
round — the same plan shape as the bow-tie closures
(``graph/bowtie.py``), exposed as a reusable operator.

``pseudo_diameter`` runs the classic double sweep (Magnien, Latapy &
Habib 2009): BFS from a deterministic start (min vertex id unless
given), hop to the farthest vertex found (ties → min id), BFS again;
the second eccentricity is a lower bound on the true diameter that is
exact on trees and empirically tight on web/social graphs. Runs on
the component containing the start vertex; the graph is symmetrized
unless ``directed=True``.

Driver traffic: two 1-row ``collect``s (the sweep endpoints) — the
distance tables never leave the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _sym_edges(edges: DataFrame, directed: bool) -> DataFrame:
    e = edges.select("src_id", "dst_id").filter(
        F.col("src_id") != F.col("dst_id")
    )
    if not directed:
        e = e.union(e.select(F.col("dst_id"), F.col("src_id")))
    return e.distinct()


def bfs_distances(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    directed: bool = False,
    max_rounds: int = 256,
    _prepared_edges: DataFrame | None = None,
) -> DataFrame:
    """Unweighted BFS → (id, dist) for every vertex reachable from any
    source row (``sources``: one ``id`` column; multi-source BFS takes
    the min distance by construction)."""
    e = (
        _prepared_edges
        if _prepared_edges is not None
        else _sym_edges(edges, directed)
        .repartition("src_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    dist = (
        sources.select("id", F.lit(0).cast("long").alias("dist"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for r in range(1, max_rounds + 1):
        nxt = (
            frontier.join(
                e.withColumnRenamed("src_id", "id").hint("shuffle_hash"), "id"
            )
            .select(F.col("dst_id").alias("id"))
            .distinct()
            .join(dist.select("id"), "id", "left_anti")
            .select("id", F.lit(r).cast("long").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    else:
        raise RuntimeError(f"BFS did not exhaust within {max_rounds} rounds")

    if _prepared_edges is None:
        e.unpersist()
    return dist


def pseudo_diameter(
    spark: SparkSession,
    edges: DataFrame,
    start: str | None = None,
    directed: bool = False,
    max_rounds: int = 256,
) -> DataFrame:
    """Double-sweep diameter lower bound → ONE row
    (start_id, sweep1_ecc, peripheral_id, diameter_lb, n_reached).

    ``peripheral_id`` is the farthest vertex from ``start`` (ties →
    min id); ``diameter_lb`` its eccentricity (= the true diameter on
    trees, a lower bound otherwise); ``n_reached`` the component size
    seen from the second sweep."""
    e = (
        _sym_edges(edges, directed)
        .repartition("src_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e.count()

    if start is None:
        start = e.select(F.min("src_id").alias("m")).collect()[0]["m"]
        if start is None:
            e.unpersist()
            return spark.createDataFrame(
                [],
                "start_id string, sweep1_ecc long, peripheral_id string,"
                " diameter_lb long, n_reached long",
            )

    src_df = spark.createDataFrame([(start,)], "id string")
    d1 = bfs_distances(
        spark, edges, src_df, directed, max_rounds, _prepared_edges=e
    )
    far = (
        d1.orderBy(F.col("dist").desc(), F.col("id").asc()).limit(1).collect()
    )[0]
    p_df = spark.createDataFrame([(far["id"],)], "id string")
    d2 = bfs_distances(
        spark, edges, p_df, directed, max_rounds, _prepared_edges=e
    )
    agg = d2.agg(
        F.max("dist").alias("diameter_lb"),
        F.count(F.lit(1)).alias("n_reached"),
    ).collect()[0]
    e.unpersist()
    return spark.createDataFrame(
        [
            (
                start,
                int(far["dist"]),
                far["id"],
                int(agg["diameter_lb"]),
                int(agg["n_reached"]),
            )
        ],
        "start_id string, sweep1_ecc long, peripheral_id string,"
        " diameter_lb long, n_reached long",
    )
