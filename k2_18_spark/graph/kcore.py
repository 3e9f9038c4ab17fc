"""k-core extraction as a DataFrame peeling loop.

The k-core of an undirected graph is the maximal subgraph in which
every vertex has degree ≥ k (Seidman, "Network structure and minimum
degree", Social Networks 1983 — the standard dense-subgraph /
web-spam / community-seed primitive). The reference has no
equivalent; this extends the engine's undirected-projection family
(G3 components, U2/U3) with the same edge-table contract.

Algorithm: iterative peeling. Round t removes every vertex whose
degree in the CURRENT surviving subgraph is < k; removing a vertex
can drop a neighbor below k, so peeling cascades (a dangling path
peels one vertex per round from its tail). The fixpoint is exactly
the k-core; rounds ≤ the longest peel cascade (O(diameter)-ish on web
graphs, |V| worst case on a bare path).

Spark plan per round, on the persisted surviving edge set E_t:
- degree count: one groupBy over the mirrored pairs (map-side
  partial aggregation — hub degrees partition-bounded),
- peel set: degree < k (usually small after round 1),
- survivors: E_{t+1} = E_t anti-join peeled on BOTH endpoints —
  two hash anti-joins that stream E_t and hash the peel set.
E_t shrinks monotonically and the loop re-persists the shrunken set
each round (lazy localCheckpoint fused with the changed-count
aggregate, the house superstep idiom), so late rounds cost O(core
size), not O(|E|). With ``checkpoint_dir`` every round writes the
surviving edge set + lineage through CheckpointStore and a killed
job resumes mid-peel.

Semantics notes:
- undirected simple graph: edge direction and parallel edges are
  collapsed before peeling (degree = number of distinct neighbors);
  self-loops are dropped (nx.k_core requires that too).
- returns (id, degree): the surviving vertices with their degree
  INSIDE the k-core — both integers, so the driver oracle
  (``__spark_entry__.graph_kcore``) compares with no tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from k2_18_spark.checkpoint import CheckpointStore


def k_core(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    checkpoint_dir: str | None = None,
    job_name: str = "kcore",
    max_rounds: int = 1000,
    num_partitions: int | None = None,
) -> DataFrame:
    """→ (id, degree) of the k-core of the undirected projection."""
    from k2_18_spark.session import superstep_conf

    if k < 1:
        raise ValueError("k must be >= 1")
    with superstep_conf(spark):
        return _kcore_loop(
            spark, edges, k, checkpoint_dir, job_name, max_rounds, num_partitions
        )


def _mirror(pairs: DataFrame) -> DataFrame:
    return pairs.union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))


def _kcore_loop(
    spark, edges, k, checkpoint_dir, job_name, max_rounds, num_partitions
) -> DataFrame:
    # canonical undirected simple pairs (a < b), self-loops dropped
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
        CheckpointStore(spark, checkpoint_dir, job_name, state_version="kcore-v1")
        if checkpoint_dir
        else None
    )
    start = 0
    if store is not None:
        last = store.latest_iteration()
        if last is not None:
            cur = store.load_state(last).select("a", "b")
            if store.load_marker(last).get("converged"):
                return _degrees(cur)
            start = last + 1

    n_edges = cur.count()
    for it in range(start, max_rounds):
        if n_edges == 0:
            if store is not None:
                store.annotate(max(it - 1, 0), converged=True)
            break
        deg = (
            _mirror(cur)
            .groupBy(F.col("a").alias("id"))
            .agg(F.count("*").alias("deg"))
        )
        peeled = deg.filter(F.col("deg") < k).select("id")
        nxt = (
            cur.join(peeled.withColumnRenamed("id", "a").hint("shuffle_hash"),
                     "a", "left_anti")
            .join(peeled.withColumnRenamed("id", "b").hint("shuffle_hash"),
                  "b", "left_anti")
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
        raise RuntimeError(f"k_core did not converge in {max_rounds} rounds")

    return _degrees(cur)


def _degrees(pairs: DataFrame) -> DataFrame:
    return (
        _mirror(pairs)
        .groupBy(F.col("a").alias("id"))
        .agg(F.count("*").cast("long").alias("degree"))
    )
