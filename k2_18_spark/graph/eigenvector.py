"""Eigenvector centrality as a DataFrame superstep loop.

The classic Bonacich measure: the principal eigenvector of the
adjacency matrix, computed by power iteration on (A^T + I) — the
identity shift guarantees convergence to the principal component on
periodic graphs. Semantics follow the pure-python
``networkx.eigenvector_centrality`` (reimplemented from the published
algorithm, not copied): start uniform 1/n, per round
``x'(v) = x(v) + Σ_{u→v} x(u)·w(u,v)``, L2-normalize, stop when the
L1 delta drops below ``n·tol``. The reference's metrics suite has no
equivalent (its importance measure is PageRank-family,
``viz/graph2metrics.py:620-665``); this extends the same edge-table
contract, like HITS (``graph/hits.py``).

Spark plan, per iteration: ONE shuffle-hash join streaming the
persisted src-partitioned edge table against the |V|-row score
vector, one groupBy with map-side partial sums (weighted sums are
associative — hub in-degrees never skew the reduce), a left join back
onto the state, one scalar job for the L2 norm (which also
materializes the round's pre-norm state via lazy localCheckpoint) and
one for the convergence delta fused with the state checkpoint.
Per-round shuffle volume is the |V| score vector, not |E|.

``fixed_iter=K`` runs exactly K rounds with no convergence test —
deterministic, which the driver-oracle query uses (the DuckDB twin
unrolls the same K rounds in a recursive CTE; see
``__spark_entry__._EIGEN_ORACLE``). ``checkpoint_dir`` gives the
house CheckpointStore contract: per-iteration state + per-partition
lineage rows and mid-run resume.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from k2_18_spark.checkpoint import CheckpointStore
from k2_18_spark.graph.adjacency import vertex_ids
from k2_18_spark.graph.pagerank import PowerIterationFailedConvergence


def eigenvector_centrality(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 100,
    tol: float = 1e-6,
    fixed_iter: int | None = None,
    checkpoint_dir: str | None = None,
    job_name: str = "eigenvector",
    num_partitions: int | None = None,
) -> DataFrame:
    """→ (id, eigenvector_centrality), L2-normalized.

    Parallel (src,dst) edge rows sum their weights (MultiDiGraph
    adjacency semantics); on directed graphs the score flows along
    in-edges, like nx. ``fixed_iter`` runs exactly that many rounds
    (deterministic mode); otherwise the loop raises
    PowerIterationFailedConvergence after ``max_iter``.
    """
    from k2_18_spark.session import superstep_conf

    with superstep_conf(spark):
        return _eigen_loop(
            spark,
            edges,
            nodes,
            max_iter,
            tol,
            fixed_iter,
            checkpoint_dir,
            job_name,
            num_partitions,
        )


def _eigen_loop(
    spark,
    edges,
    nodes,
    max_iter,
    tol,
    fixed_iter,
    checkpoint_dir,
    job_name,
    num_partitions,
) -> DataFrame:
    verts = vertex_ids(edges, nodes).persist(StorageLevel.MEMORY_AND_DISK)
    n = verts.count()
    if n == 0:
        return spark.createDataFrame([], "id string, eigenvector_centrality double")

    w = F.col("weight") if "weight" in edges.columns else F.lit(1.0)
    e = (
        edges.select(
            F.col("src_id").alias("src"),
            F.col("dst_id").alias("dst"),
            w.cast("double").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    e = e.repartition(*([num_partitions, "src"] if num_partitions else ["src"]))
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    e.count()

    store = (
        CheckpointStore(spark, checkpoint_dir, job_name, state_version="eigen-v1")
        if checkpoint_dir
        else None
    )

    state = None  # (id, x)
    start = 0
    rounds = fixed_iter if fixed_iter is not None else max_iter
    if store is not None:
        last = store.latest_iteration()
        if last is not None:
            state = store.load_state(last).select("id", "x")
            if store.load_marker(last).get("converged"):
                out = state.select(
                    "id", F.col("x").alias("eigenvector_centrality")
                )
                verts.unpersist()
                e.unpersist()
                return out
            start = last + 1
    if state is None:
        state = verts.select(
            "id", (F.lit(1.0) / F.lit(float(n))).alias("x")
        ).localCheckpoint(eager=True)

    for it in range(start, rounds):
        contrib = (
            e.join(
                state.select(F.col("id").alias("src"), "x").hint("shuffle_hash"),
                "src",
            )
            .select("dst", (F.col("x") * F.col("w")).alias("c"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("c").alias("c"))
        )
        raw = (
            state.select("id", F.col("x").alias("x_prev"))
            .join(contrib.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                "x_prev",
                (F.col("x_prev") + F.coalesce("c", F.lit(0.0))).alias("x_raw"),
            )
            .localCheckpoint(eager=False)
        )
        sq = raw.agg(F.sum(F.col("x_raw") * F.col("x_raw")).alias("s")).collect()[0]
        norm = math.sqrt(sq["s"]) or 1.0  # nx: `or 1` (identity keeps it > 0)
        new = raw.select(
            "id", (F.col("x_raw") / F.lit(norm)).alias("x"), "x_prev"
        )
        prev = state
        if store is not None:
            new = store.save_state(it, new, rows_in=n)
        else:
            new = new.localCheckpoint(eager=False)
        err = new.agg(
            F.sum(F.abs(F.col("x") - F.col("x_prev"))).alias("e")
        ).collect()[0]["e"]
        state = new.select("id", "x")
        prev.unpersist()
        converged = fixed_iter is None and err < n * tol
        if store is not None:
            store.annotate(it, err=float(err), converged=bool(converged))
        if converged:
            break
    else:
        if fixed_iter is None:
            raise PowerIterationFailedConvergence(
                f"eigenvector_centrality did not converge in {max_iter} "
                f"iterations (tol={tol})"
            )

    out = state.select("id", F.col("x").alias("eigenvector_centrality"))
    verts.unpersist()
    e.unpersist()
    return out
