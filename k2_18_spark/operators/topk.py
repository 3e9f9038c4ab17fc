"""Distributed approximate top-k from per-partition summaries
(TPUT / threshold-algorithm family — Cao & Wang PODC'04, Fagin's TA).

The 100-TB shape: each "node" (partition) ships only its local top-m
(key, cnt) rows instead of its full long-tail count table, so the
merge shuffles P·m rows no matter how many distinct keys exist.
For every candidate key the merge derives

- ``lb``: sum of its counts over partitions where it DID make the
  local top-m (counts it provably has), and
- ``ub``: lb + Σ floor_p over partitions where it did not appear —
  floor_p is partition p's m-th local count (a key absent from the
  top-m of p has local count ≤ floor_p); partitions with fewer than
  m distinct keys have floor 0 (their summary is complete).

The returned top-k is ranked by lb (key ascending tie-break) and is
provably exact whenever the k-th lb ≥ the largest ub among excluded
keys — at web scale (Zipfian hosts/URLs) a small m makes that hold
almost always, and the caller can check it from the columns.

Determinism contract: the partition column is caller-supplied (a row
attribute like ``event_id % P``, never ``spark_partition_id()``), so
the same input yields the same summaries in any engine and a DuckDB
oracle replays every row bit-exactly. On a real cluster you'd feed
the physical partition id instead and the per-(part,key) counts
collapse map-side with zero pre-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def approx_topk(
    df: DataFrame,
    key_col: str,
    part_col: str,
    k: int = 10,
    m: int = 20,
) -> DataFrame:
    """→ (key string-ish, lb long, ub long) — top-k by lb.

    ``df`` is raw rows; counting, local top-m, and the bound merge all
    happen here. Rank rule: lb desc, key asc; ties beyond k are cut
    deterministically by that order.
    """
    if k < 1 or m < 1:
        raise ValueError(f"k and m must be >= 1, got k={k} m={m}")
    counts = (
        df.select(F.col(part_col).alias("part"), F.col(key_col).alias("key"))
        .groupBy("part", "key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("part").orderBy(F.desc("cnt"), F.asc("key"))
    ranked = counts.select(
        "part", "key", "cnt", F.row_number().over(w).alias("rn")
    )
    tops = ranked.filter(F.col("rn") <= m)
    # floor_p = m-th local count, 0 when the summary already holds every
    # key of the partition (n_keys < m → nothing was truncated)
    floors = ranked.groupBy("part").agg(
        F.max("rn").alias("n_keys"),
        F.max(F.when(F.col("rn") == m, F.col("cnt"))).alias("mth"),
    ).select(
        "part",
        F.when(F.col("n_keys") < m, F.lit(0))
        .otherwise(F.col("mth"))
        .cast("long")
        .alias("floor_p"),
    )
    total_floor = floors.agg(F.sum("floor_p").alias("total_floor"))
    per_key = (
        tops.join(floors, "part")
        .groupBy("key")
        .agg(
            F.sum("cnt").alias("lb"),
            F.sum("floor_p").alias("seen_floor"),
        )
    )
    bounded = per_key.crossJoin(F.broadcast(total_floor)).select(
        "key",
        F.col("lb").cast("long").alias("lb"),
        (F.col("lb") + F.col("total_floor") - F.col("seen_floor"))
        .cast("long")
        .alias("ub"),
    )
    wk = Window.orderBy(F.desc("lb"), F.asc("key"))
    return (
        bounded.select("key", "lb", "ub", F.row_number().over(wk).alias("rk"))
        .filter(F.col("rk") <= k)
        .select("key", "lb", "ub")
    )
