"""Jones-Plassmann greedy graph coloring — deterministic, distributed.

Proper vertex coloring is the classic scheduling primitive on big
graphs: color classes are conflict-free batches (no two adjacent
vertices share a color), so per-class parallel updates — crawl
politeness groups, simultaneous page re-rank updates, lock-free edge
mutations — can run without coordination. Complements
``graph/mis.py``: one MIS is a single conflict-free batch; a coloring
partitions the WHOLE graph into such batches.

Jones & Plassmann (1993, public) derandomized with the engine's hash
idiom: vertex ``v`` has the fixed priority ``md5(seed | v)`` (id
tie-break — a unique total order). Each round, every uncolored vertex
whose priority exceeds all its uncolored neighbors' picks the
smallest color absent among its already-colored neighbors (the mex).
Adjacent vertices can never color in the same round (one has the
larger priority), so the coloring is proper by construction, and the
mex rule bounds colors by max-degree + 1. Expected O(log n) rounds on
bounded-degree graphs.

Per round: one semi-join to confine edges to uncolored endpoints,
one per-vertex max aggregation (local-maximum test), one join of the
winners against the colored set + ``array_except``/``array_min`` mex
— all JVM-side, frontier-sized state, no driver collect. The colored
set grows monotonically and is re-checkpointed per round, exactly the
components/LPA state-pass pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def greedy_coloring(
    spark: SparkSession,
    edges: DataFrame,
    seed: str = "color",
    max_rounds: int = 256,
) -> DataFrame:
    """Deterministic Jones-Plassmann coloring on the symmetrized
    simple graph → (id, color int, round int): ``color`` is
    conflict-free across every edge; ``round`` is the superstep the
    vertex was colored in."""
    e = edges.select("src_id", "dst_id").filter(
        F.col("src_id") != F.col("dst_id")
    )
    e = (
        e.unionByName(e.select(F.col("dst_id").alias("src_id"),
                               F.col("src_id").alias("dst_id")))
        .distinct()
        .repartition("src_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e.count()

    # mex never exceeds the max degree, so a shared 0..K candidate
    # range is safe (scalar driver aggregate, not a data collect)
    max_deg = (
        e.groupBy("src_id").count().agg(F.max("count")).collect()[0][0]
    )
    K = int(max_deg or 0) + 1

    pri = F.struct(
        F.md5(
            F.encode(F.concat_ws("|", F.lit(seed), F.col("id")), "UTF-8")
        ).alias("h"),
        F.col("id").alias("i"),
    )
    unc = (
        edges.select(F.col("src_id").alias("id"))
        .unionByName(edges.select(F.col("dst_id").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    colored = spark.createDataFrame(
        [], "id string, color int, round int"
    ).localCheckpoint(eager=True)

    for r in range(1, max_rounds + 1):
        keys = unc.select("id", pri.alias("ky"))
        nbmax = (
            e.join(keys.withColumnRenamed("id", "dst_id"), "dst_id")
            .join(
                unc.withColumnRenamed("id", "src_id").hint("shuffle_hash"),
                "src_id",
                "left_semi",
            )
            .groupBy(F.col("src_id").alias("id"))
            .agg(F.max("ky").alias("nb"))
        )
        cand = (
            keys.join(nbmax, "id", "left")
            .filter(F.col("nb").isNull() | (F.col("ky") > F.col("nb")))
            .select("id")
        )
        used = (
            e.withColumnRenamed("src_id", "id")
            .join(cand.hint("shuffle_hash"), "id", "left_semi")
            .join(
                colored.select(
                    F.col("id").alias("dst_id"), "color"
                ).hint("shuffle_hash"),
                "dst_id",
            )
            .groupBy("id")
            .agg(F.collect_set("color").alias("used"))
        )
        newly = (
            cand.join(used, "id", "left")
            .select(
                "id",
                F.array_min(
                    F.array_except(
                        F.sequence(F.lit(0), F.lit(K)),
                        F.coalesce("used", F.array().cast("array<int>")),
                    )
                ).cast("int").alias("color"),
                F.lit(r).alias("round"),
            )
            .localCheckpoint(eager=True)
        )
        colored = colored.unionByName(newly).localCheckpoint(eager=True)
        unc = unc.join(newly, "id", "left_anti").localCheckpoint(eager=True)
        if unc.isEmpty():
            break
    else:
        raise RuntimeError(
            f"coloring did not settle within {max_rounds} rounds"
        )

    e.unpersist()
    return colored
