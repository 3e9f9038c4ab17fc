"""SALSA — the Stochastic Approach for Link-Structure Analysis.

Lempel & Moran (WWW9 2000 / ACM TOIS 19(2) 2001): hub and authority
scores as the stationary distributions of two-step random walks on the
bipartite hub/authority support graph — the stochastic sibling of HITS
that is robust to the TKC (tightly-knit community) effect. Not present
in the reference (its importance measures are PageRank-family,
``viz/graph2metrics.py:620-665``); this extends the same edge-table
contract alongside :mod:`k2_18_spark.graph.hits`.

No power iteration is needed. The authority chain (step backward along
an in-link, then forward along an out-link) is the two-step restriction
of the standard weighted random walk on the undirected bipartite graph
whose left side is hub-copies and right side authority-copies, so
within each connected component of that bipartite graph the stationary
mass of authority ``v`` is proportional to its (weighted) in-degree;
the per-component mass is the share of authority nodes that start
there. This closed form is the standard implemented SALSA (Najork,
"Comparing the effectiveness of HITS and SALSA", WSDM 2007):

    a(v) = |A_C(v)| / |A|  ·  w_in(v)  / Σ_{u ∈ A_C(v)} w_in(u)
    h(u) = |H_C(u)| / |H|  ·  w_out(u) / Σ_{k ∈ H_C(u)} w_out(k)

where A/H are the authority/hub node sets (positive in/out degree),
and C(·) is the node's connected component in the bipartite support
graph. Both score vectors are exactly L1-normalized by construction.
Parallel (src,dst) edge rows sum their weights (MultiDiGraph
adjacency); the chain is always aperiodic (every authority has a
positive self-transition through any of its in-hubs), so the closed
form equals the power-iteration limit from the uniform start — the
tests verify that equivalence against an independent dense-chain
oracle.

Spark plan: one groupBy to collapse parallel edges, one connected-
components run on the tagged bipartite edge list (min-label superstep
loop, shuffle = the |V_bip| label vector per round), then two
map-side-combinable per-component aggregates and one hash join each to
attach the component stats back — no O(Σ d²) co-citation wedge join,
which is the naive SALSA materialization and blows up on hub pages at
web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from k2_18_spark.graph.components import connected_components

__all__ = ["salsa"]

# bipartite side tags — \x01 cannot appear in sane ids, so tagged ids
# never collide across sides even when a node is both hub and authority
_H = "H\x01"
_A = "A\x01"


def salsa(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """→ DataFrame (id, hub, authority), each column L1-normalized.

    Nodes with no out-edges have hub 0; no in-edges, authority 0.
    ``nodes`` (optional, column ``id``) adds isolated vertices as
    zero/zero rows so the output covers the full vertex set.
    """
    w = F.col("weight") if "weight" in edges.columns else F.lit(1.0)
    e = (
        edges.select(
            F.col("src_id").alias("src"),
            F.col("dst_id").alias("dst"),
            w.cast("double").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if e.count() == 0:
        out = spark.createDataFrame([], "id string, hub double, authority double")
        if nodes is not None:
            out = nodes.select(
                "id", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
            )
        e.unpersist()
        return out

    bip = e.select(
        F.concat(F.lit(_H), "src").alias("src_id"),
        F.concat(F.lit(_A), "dst").alias("dst_id"),
    )
    comp = connected_components(
        spark, bip, num_partitions=num_partitions
    ).select(
        F.substring("id", 3, 2**31 - 1).alias("id"),
        F.substring("id", 1, 1).alias("side"),
        "component_id",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    comp.count()

    def _side(tag: str, deg_df: DataFrame, deg_col: str, out_col: str) -> DataFrame:
        tagged = comp.filter(F.col("side") == tag).join(
            deg_df.hint("shuffle_hash"), "id"
        )
        total = tagged.count()  # |A| or |H|
        stats = tagged.groupBy("component_id").agg(
            F.count("*").alias("n_c"), F.sum(deg_col).alias("w_c")
        )
        return (
            # per-component stats can approach |V| rows on a sparse web
            # graph (many small components) — hash-join, don't broadcast
            tagged.join(stats.hint("shuffle_hash"), "component_id")
            .select(
                "id",
                (
                    (F.col("n_c") / F.lit(float(total)))
                    * (F.col(deg_col) / F.col("w_c"))
                ).alias(out_col),
            )
        )

    win = e.groupBy(F.col("dst").alias("id")).agg(F.sum("w").alias("win"))
    wout = e.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("wout"))
    auth = _side("A", win, "win", "authority")
    hub = _side("H", wout, "wout", "hub")

    out = (
        hub.join(auth, "id", "full_outer")
        .select(
            "id",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
    )
    if nodes is not None:
        out = (
            nodes.select("id")
            .distinct()
            .join(out, "id", "left")
            .select(
                "id",
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
            )
        )
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    comp.unpersist()
    return out
