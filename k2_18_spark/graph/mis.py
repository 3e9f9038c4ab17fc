"""Luby's maximal independent set — deterministic, hash-priority rounds.

An MIS is the standard building block for distributed graph coloring,
scheduling-conflict resolution, and landmark selection on web graphs
(pick a set of mutually non-adjacent hub pages). The reference has no
MIS (its NetworkX layer stops at centralities/communities); this is a
scale-path addition in the same spirit as ``graph/walks.py``.

Luby's algorithm (Luby 1986, SIAM J. Comput. — public), derandomized
the same way the walk sampler is: vertex ``v``'s round-``r`` priority
is ``md5(seed | v | r)`` with the id as tie-break (a unique total
order, identical to DuckDB's ``md5(...) || id`` string order). Each
round, every still-undecided vertex whose priority is a strict local
minimum among its undecided neighbors enters the set; its neighbors
are excluded; the rest re-draw next round. Two adjacent vertices can
never enter in the same round (one of them has the larger key), so
independence holds by construction, and a vertex only leaves the
undecided pool via membership or an adjacent member, so the result is
maximal. Expected O(log n) rounds; every round is TWO semi-joins to
confine the edge set to undecided endpoints + one per-vertex min
aggregation — all shuffle-hash against the persisted symmetric edge
table, frontier-sized state, no driver collect.

Returns (id, in_mis, round): ``round`` is the round the vertex was
DECIDED (entered the set, or saw a neighbor enter). Degree-0 vertices
enter in round 1 vacuously.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _round_key(seed: str, r: int):
    return F.struct(
        F.md5(
            F.encode(
                F.concat_ws("|", F.lit(seed), F.col("id"), F.lit(str(r))),
                "UTF-8",
            )
        ).alias("h"),
        F.col("id").alias("i"),
    )


def maximal_independent_set(
    spark: SparkSession,
    edges: DataFrame,
    seed: str = "mis",
    max_rounds: int = 64,
) -> DataFrame:
    """Deterministic Luby MIS on the symmetrized simple graph →
    (id, in_mis boolean, round int)."""
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

    und = (
        edges.select(F.col("src_id").alias("id"))
        .unionByName(edges.select(F.col("dst_id").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    decided: list[DataFrame] = []
    for r in range(1, max_rounds + 1):
        keys = und.select("id", _round_key(seed, r).alias("ky"))
        # edge set confined to undecided endpoints (both sides)
        ue = (
            e.join(und.withColumnRenamed("id", "src_id").hint("shuffle_hash"),
                   "src_id", "left_semi")
            .join(und.withColumnRenamed("id", "dst_id").hint("shuffle_hash"),
                  "dst_id", "left_semi")
        )
        nbmin = (
            ue.join(
                keys.withColumnRenamed("id", "dst_id").hint("shuffle_hash"),
                "dst_id",
            )
            .groupBy(F.col("src_id").alias("id"))
            .agg(F.min("ky").alias("nb"))
        )
        new_mis = (
            keys.join(nbmin, "id", "left")
            .filter(F.col("nb").isNull() | (F.col("ky") < F.col("nb")))
            .select("id")
            .localCheckpoint(eager=True)
        )
        excl = (
            ue.join(
                new_mis.withColumnRenamed("id", "src_id").hint(
                    "shuffle_hash"
                ),
                "src_id",
                "left_semi",
            )
            .select(F.col("dst_id").alias("id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        decided.append(
            new_mis.select(
                "id", F.lit(True).alias("in_mis"), F.lit(r).alias("round")
            ).unionByName(
                excl.select(
                    "id", F.lit(False).alias("in_mis"),
                    F.lit(r).alias("round"),
                )
            )
        )
        und = (
            und.join(new_mis, "id", "left_anti")
            .join(excl, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if und.isEmpty():
            break
    else:
        raise RuntimeError(f"MIS did not settle within {max_rounds} rounds")

    e.unpersist()
    return reduce(DataFrame.unionByName, decided)
