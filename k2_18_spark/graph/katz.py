"""Katz centrality as a DataFrame superstep loop — the attenuated
walk-count centrality (Katz 1953): ``x = β Σ_k α^k (Aᵀ)^k 1``, the
damped cousin of eigenvector centrality that stays finite on DAGs and
weakly-connected web graphs where the principal eigenvector collapses
onto the strongly-connected core. PageRank is Katz with out-degree
normalization; HITS is its bipartite factorization — this completes
the canonical link-analysis centrality family
(``graph/eigenvector.py``, ``graph/hits.py``, ``graph/pagerank.py``).

Semantics follow pure-python ``networkx.katz_centrality``
(reimplemented from the published iteration, not copied): start
``x = 0``, per round ``x'(v) = α Σ_{u→v} x(u)·w(u,v) + β``, stop when
the L1 delta of the UN-normalized iterates drops below ``n·tol``,
then L2-normalize once. Convergence requires ``α < 1/λ_max``; the
loop raises ``PowerIterationFailedConvergence`` past ``max_iter``
like nx. Parallel (src,dst) rows sum (MultiDiGraph adjacency).

Spark plan per round — identical shape to eigenvector: ONE
shuffle-hash join streaming the persisted src-partitioned collapsed
edges against the |V|-row score vector, map-side-partial groupBy sum,
left join back, one fused convergence-delta job. Per-round shuffle =
the |V| vector. ``fixed_iter=K`` gives the deterministic mode the
driver oracle unrolls; ``checkpoint_dir`` gives the house
CheckpointStore lineage/resume contract.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from k2_18_spark.checkpoint import CheckpointStore
from k2_18_spark.graph.adjacency import vertex_ids
from k2_18_spark.graph.pagerank import PowerIterationFailedConvergence


def katz_centrality(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    alpha: float = 0.1,
    beta: float = 1.0,
    max_iter: int = 1000,
    tol: float = 1e-6,
    normalized: bool = True,
    fixed_iter: int | None = None,
    checkpoint_dir: str | None = None,
    job_name: str = "katz",
    num_partitions: int | None = None,
) -> DataFrame:
    """→ (id, katz_centrality). nx.katz_centrality semantics; scores
    flow along in-edges. ``fixed_iter`` runs exactly K rounds with no
    convergence test (deterministic oracle mode)."""
    from k2_18_spark.session import superstep_conf

    with superstep_conf(spark):
        return _katz_loop(
            spark, edges, nodes, alpha, beta, max_iter, tol, normalized,
            fixed_iter, checkpoint_dir, job_name, num_partitions,
        )


def _katz_loop(
    spark, edges, nodes, alpha, beta, max_iter, tol, normalized, fixed_iter,
    checkpoint_dir, job_name, num_partitions,
) -> DataFrame:
    verts = vertex_ids(edges, nodes).persist(StorageLevel.MEMORY_AND_DISK)
    n = verts.count()
    if n == 0:
        return spark.createDataFrame([], "id string, katz_centrality double")

    w = F.col("weight") if "weight" in edges.columns else F.lit(1.0)
    e = (
        edges.select(
            F.col("src_id").alias("src"),
            F.col("dst_id").alias("dst"),
            w.cast("double").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .repartition(*([num_partitions, "src"] if num_partitions else ["src"]))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e.count()

    store = (
        CheckpointStore(spark, checkpoint_dir, job_name, state_version="katz-v1")
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
                out = _finish(state, normalized)
                verts.unpersist(), e.unpersist()
                return out
            start = last + 1
    if state is None:
        state = verts.select("id", F.lit(0.0).alias("x")).localCheckpoint(
            eager=True
        )

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
        new = (
            state.select("id", F.col("x").alias("x_prev"))
            .join(contrib.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                (
                    F.lit(float(alpha)) * F.coalesce("c", F.lit(0.0))
                    + F.lit(float(beta))
                ).alias("x"),
                "x_prev",
            )
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
                f"katz_centrality did not converge in {max_iter} iterations "
                f"(tol={tol}; is alpha < 1/lambda_max?)"
            )

    out = _finish(state, normalized)
    verts.unpersist()
    e.unpersist()
    return out


def _finish(state: DataFrame, normalized: bool) -> DataFrame:
    if not normalized:
        return state.select("id", F.col("x").alias("katz_centrality"))
    sq = state.agg(F.sum(F.col("x") * F.col("x")).alias("s")).collect()[0]["s"]
    norm = math.sqrt(sq or 0.0) or 1.0  # nx: `or 1`
    return state.select(
        "id", (F.col("x") / F.lit(norm)).alias("katz_centrality")
    )
