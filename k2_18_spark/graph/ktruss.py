"""k-truss extraction as an edge-peeling DataFrame loop.

The k-truss of an undirected graph is the maximal subgraph in which
every edge participates in ≥ k−2 triangles of that subgraph (Cohen,
"Trusses: cohesive subgraphs for social network analysis", 2008) — the
edge-strength refinement of the k-core, the standard community-core /
spam-filter primitive on web link graphs. The reference has no
equivalent; this extends the engine's undirected-projection family
(G3/G17) with the same edge-table contract.

Algorithm: iterative peeling. Round t computes per-edge triangle
support inside the CURRENT surviving edge set and drops every edge
with support < k−2; removals destroy triangles, so peeling cascades to
a fixpoint — exactly the k-truss.

Spark plan per round, on the persisted surviving canonical edge set:
- triangles are enumerated once per round with the SAME degree-
  orientation trick as the triangle counter (wedges only at each
  triangle's smallest-(degree, id) corner → per-vertex fan-out
  O(sqrt(E)) even on power-law graphs),
- each triangle is exploded to its three canonical edges and counted
  (map-side partial aggregation),
- survivors: support ≥ k−2 via an inner join that streams the edge set
  and hashes the (usually much smaller) support table.
The surviving set shrinks monotonically and is re-persisted each round
(lazy localCheckpoint fused with the changed-count aggregate). With
``checkpoint_dir`` every round writes survivors + lineage through
CheckpointStore and a killed job resumes mid-peel.

Semantics match ``nx.k_truss``: direction and parallel edges are
collapsed, self-loops dropped, k ≥ 2 (k=2 keeps every edge that has
both endpoints, i.e. support ≥ 0). Returns the surviving edges with
their final within-truss support — all integers, so the driver oracle
(``__spark_entry__.graph_ktruss``) compares with no tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k2_18_spark.checkpoint import CheckpointStore


def k_truss(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    checkpoint_dir: str | None = None,
    job_name: str = "ktruss",
    max_rounds: int = 1000,
    num_partitions: int | None = None,
) -> DataFrame:
    """→ (id_a, id_b, support) of the k-truss, id_a < id_b."""
    from k2_18_spark.session import superstep_conf

    if k < 2:
        raise ValueError("k must be >= 2")
    with superstep_conf(spark):
        return _ktruss_loop(
            spark, edges, k, checkpoint_dir, job_name, max_rounds, num_partitions
        )


def _edge_support(cur: DataFrame) -> DataFrame:
    """Per-edge triangle support on canonical pairs (a < b) →
    (a, b, support); edges in no triangle get support 0."""
    deg = (
        cur.select(F.col("a").alias("v"))
        .union(cur.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    oriented = (
        cur.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")).hint(
            "shuffle_hash"), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")).hint(
            "shuffle_hash"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("lo"), F.col("b").alias("hi")),
            )
            .otherwise(F.struct(F.col("b").alias("lo"), F.col("a").alias("hi")))
            .alias("e"),
        )
        .select("e.lo", "e.hi")
    )
    e1 = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    wedges = e1.join(e2.hint("shuffle_hash"), "x").filter(F.col("y") < F.col("z"))
    closing = cur.select(F.col("a").alias("y"), F.col("b").alias("z"))
    tri = wedges.join(closing.hint("shuffle_hash"), ["y", "z"], "left_semi")
    tri_edges = (
        tri.select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .unionAll(
            tri.select(F.least("x", "z").alias("a"), F.greatest("x", "z").alias("b"))
        )
        .unionAll(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
    )
    sup = tri_edges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))
    return cur.join(sup.hint("shuffle_hash"), ["a", "b"], "left").select(
        "a", "b", F.coalesce("support", F.lit(0)).cast("long").alias("support")
    )


def _ktruss_loop(
    spark, edges, k, checkpoint_dir, job_name, max_rounds, num_partitions
) -> DataFrame:
    cur = (
        edges.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if num_partitions:
        cur = cur.repartition(num_partitions, "a")
    cur = cur.localCheckpoint(eager=True)

    store = (
        CheckpointStore(spark, checkpoint_dir, job_name, state_version="ktruss-v1")
        if checkpoint_dir
        else None
    )
    start = 0
    if store is not None:
        last = store.latest_iteration()
        if last is not None:
            cur = store.load_state(last).select("a", "b")
            if store.load_marker(last).get("converged"):
                return _final(cur)
            start = last + 1

    min_support = k - 2
    n_edges = cur.count()
    for it in range(start, max_rounds):
        if n_edges == 0:
            if store is not None:
                store.annotate(max(it - 1, 0), converged=True)
            break
        nxt = (
            _edge_support(cur)
            .filter(F.col("support") >= min_support)
            .select("a", "b")
        )
        prev = cur
        if store is not None:
            nxt = store.save_state(it, nxt, rows_in=n_edges)
        else:
            nxt = nxt.localCheckpoint(eager=False)
        n_next = nxt.count()
        cur = nxt
        prev.unpersist()
        converged = n_next == n_edges
        if store is not None:
            store.annotate(it, edges=n_next, converged=bool(converged))
        n_edges = n_next
        if converged:
            break
    else:
        raise RuntimeError(f"k_truss did not converge in {max_rounds} rounds")

    return _final(cur)


def _final(cur: DataFrame) -> DataFrame:
    """Surviving edges with their within-truss support, renamed to the
    output contract."""
    return _edge_support(cur).select(
        F.col("a").alias("id_a"), F.col("b").alias("id_b"), "support"
    )
