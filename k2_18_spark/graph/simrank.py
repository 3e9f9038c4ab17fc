"""SimRank — "two pages are similar if similar pages link to them".

Jeh & Widom (KDD 2002, public): s(a,a) = 1 and

    s_{k+1}(a, b) = C / (|I(a)||I(b)|) · Σ_{i∈I(a)} Σ_{j∈I(b)} s_k(i, j)

the in-link analogue of co-citation iterated to a fixpoint — it
scores structural similarity through multi-hop endorsement, where
``graph/cocitation.py`` stops at one hop.

Exact SimRank is inherently quadratic: the state is a VERTEX-PAIR
table and one iteration touches every pair of co-incident edges
(O(|E|²/|V|) on average). This implementation is honest about that:

- the state is kept SPARSE — only pairs with nonzero score exist,
  which on sparse graphs is the set of pairs with a common ancestor
  within k hops, far below n²;
- each iteration is two shuffle-hash joins of the pair state against
  the in-edge table (i → a side, then j → b side) + one (a, b)
  aggregation — the same plan family as the triangle wedge join;
- a ``max_nodes`` guard (default 10 000) refuses blind full-graph
  runs: at web scale you run SimRank on a candidate SUBGRAPH (a
  topic cluster, a host's pages, the neighborhood of a seed set —
  e.g. the output of ``graph/components.py`` or a PPR sweep), not on
  10^12 vertices. Pass a bigger guard explicitly to accept the cost.

Scores are returned for ordered pairs a < b with s > ``min_sim``
(the diagonal is implicit 1.0); ``round_to`` decimal rounding makes
the result reproducible across summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def simrank(
    spark: SparkSession,
    edges: DataFrame,
    c: float = 0.8,
    iterations: int = 3,
    min_sim: float = 1e-4,
    round_to: int = 6,
    max_nodes: int = 10_000,
) -> DataFrame:
    """Exact iterative SimRank → (a, b, sim) for a < b, sim rounded
    to ``round_to`` and > ``min_sim``."""
    e = (
        edges.select("src_id", "dst_id")
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
        .repartition("dst_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e.count()

    nodes = (
        edges.select(F.col("src_id").alias("id"))
        .unionByName(edges.select(F.col("dst_id").alias("id")))
        .distinct()
    )
    n = nodes.count()
    if n > max_nodes:
        e.unpersist()
        raise ValueError(
            f"simrank state is O(n²) and n={n} > max_nodes={max_nodes}; "
            "run on a candidate subgraph (component, cluster, PPR "
            "neighborhood) or raise max_nodes explicitly"
        )

    din = e.groupBy(F.col("dst_id").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )

    # sparse state: ordered pairs (a, b, v) with v > 0, BOTH
    # orientations kept so the double sum sees (i, j) and (j, i)
    s = nodes.select(
        F.col("id").alias("a"), F.col("id").alias("b"),
        F.lit(1.0).alias("v"),
    ).localCheckpoint(eager=True)

    for _ in range(iterations):
        propagated = (
            s.join(
                e.select(
                    F.col("src_id").alias("a"), F.col("dst_id").alias("na")
                ).hint("shuffle_hash"),
                "a",
            )
            .join(
                e.select(
                    F.col("src_id").alias("b"), F.col("dst_id").alias("nb")
                ).hint("shuffle_hash"),
                "b",
            )
            .filter(F.col("na") != F.col("nb"))
            .groupBy(F.col("na").alias("a"), F.col("nb").alias("b"))
            .agg(F.sum("v").alias("sv"))
            .join(din.withColumnRenamed("id", "a"), "a")
            .withColumnRenamed("d", "da")
            .join(din.withColumnRenamed("id", "b"), "b")
            .select(
                "a", "b",
                (F.lit(c) * F.col("sv") / (F.col("da") * F.col("d"))).alias(
                    "v"
                ),
            )
        )
        s = (
            nodes.select(
                F.col("id").alias("a"), F.col("id").alias("b"),
                F.lit(1.0).alias("v"),
            )
            .unionByName(propagated)
            .localCheckpoint(eager=True)
        )

    e.unpersist()
    return (
        s.filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round("v", round_to).alias("sim"))
        .filter(F.col("sim") > min_sim)
    )
