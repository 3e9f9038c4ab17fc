"""Weighted PageRank as a DataFrame-only superstep loop (SURVEY.md G1/G2).

Reproduces NetworkX power-iteration semantics exactly (reference calls
``nx.pagerank(G, alpha=0.85, max_iter=100, weight="weight")`` at
viz/graph2metrics.py:716-729):

- right-stochastic transition: contribution of edge (u,v) is
  ``rank_u * weight_uv / out_wsum_u``
- dangling vertices (no out-edges) redistribute their whole rank
  uniformly (the personalization vector is uniform 1/n)
- update: ``r' = alpha * (contrib + dangling_mass / n) + (1-alpha)/n``
- convergence: L1 delta ``sum(|r'-r|) < n * tol`` (nx criterion);
  raises like nx's PowerIterationFailedConvergence after max_iter
  unless ``strict=False``.
- empty edge set → uniform 1/n (reference viz/graph2metrics.py:726-729)

Scale design (north_rule):
- the edge table is prepared once (frac precomputed, hash-partitioned
  by src_id, persisted) — each superstep shuffles only the rank vector.
- hub sources (top-k out-degree tail) are joined via an explicit
  broadcast of their rank slice; the long tail goes through the normal
  shuffle join (AQE skew-join covers residual skew).
- hub destinations need no salting: Spark's partial hash aggregation
  combines map-side, bounding any destination's final fan-in by the
  partition count.
- every superstep checkpoints the rank vector + per-partition lineage
  (CheckpointStore); a killed job resumes from the last complete
  iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k2_18_spark.checkpoint import CheckpointStore
from k2_18_spark.graph.adjacency import Adjacency, build_adjacency


class PowerIterationFailedConvergence(RuntimeError):
    pass


# iterations executed by the most recent pagerank() call (bench probe)
LAST_RUN_ITERATIONS: int = 0


def _superstep(
    ranks: DataFrame,
    adj: Adjacency,
    alpha: float,
    n: int,
    dangling_mass: float,
) -> DataFrame:
    """One power iteration plan (caller materializes/checkpoints it).

    ``ranks`` must carry (id, rank, dangling); ``dangling_mass`` is the
    sum of ranks of dangling vertices (computed by the caller in the
    same aggregate pass as the previous iteration's L1 delta — one
    driver job per superstep, not two).
    """
    edges = adj.edges  # src_id(long), dst_id(long), frac — encoded
    # shuffle_hash: build the hash table on the vertex-sized rank side,
    # STREAM the persisted edge table — no per-superstep sort of |E| rows
    # (sort-merge would re-sort the edges every iteration)
    rank_src = ranks.select(F.col("id").alias("src_id"), "rank").hint("shuffle_hash")

    if adj.hub_ids:
        hub_ranks = rank_src.filter(F.col("src_id").isin(adj.hub_ids))
        tail_ranks = rank_src.filter(~F.col("src_id").isin(adj.hub_ids))
        contribs = adj.edges_hub.join(F.broadcast(hub_ranks), "src_id").unionByName(
            adj.edges_tail.join(tail_ranks, "src_id")
        )
    else:
        contribs = edges.join(rank_src, "src_id")

    # shrink to (dst_id, contrib) before the aggregate shuffle
    agg = (
        contribs.select("dst_id", (F.col("rank") * F.col("frac")).alias("c"))
        .groupBy(F.col("dst_id").alias("id"))
        .agg(F.sum("c").alias("contrib"))
    )

    base = alpha * dangling_mass / n + (1.0 - alpha) / n
    new_ranks = (
        ranks.select("id", F.col("rank").alias("prev_rank"), "dangling")
        .join(agg.hint("shuffle_hash"), "id", "left")
        .select(
            "id",
            (F.lit(alpha) * F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(base)).alias(
                "rank"
            ),
            "prev_rank",
            "dangling",
        )
    )
    return new_ranks


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-6,
    checkpoint_dir: str | None = None,
    job_name: str = "pagerank",
    num_partitions: int | None = None,
    hub_top_k: int = 256,
    strict: bool = True,
    adj: Adjacency | None = None,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Weighted PageRank to convergence → DataFrame (id, rank).

    ``checkpoint_dir`` enables parquet checkpoints + lineage + resume;
    without it state is truncated via localCheckpoint (no resume).

    ``init_ranks`` (id, rank) warm-starts the power iteration — the
    incremental-crawl idiom: after a small edge delta, seed with the
    previous converged vector instead of uniform and re-converge in a
    handful of supersteps. Vertices missing from ``init_ranks`` (new
    pages) start at 1/n, departed vertices are dropped, and the vector
    is renormalized to unit mass; the fixpoint is identical to a cold
    start (power iteration is init-independent), only the superstep
    count changes. Ignored when a checkpoint resume is in progress
    (the stored state is newer by definition).
    """
    from k2_18_spark.session import superstep_conf

    with superstep_conf(spark):
        return _pagerank_loop(
            spark, edges, nodes, alpha, max_iter, tol, checkpoint_dir,
            job_name, num_partitions, hub_top_k, strict, adj, init_ranks,
        )


def _pagerank_loop(
    spark, edges, nodes, alpha, max_iter, tol, checkpoint_dir,
    job_name, num_partitions, hub_top_k, strict, adj, init_ranks=None,
) -> DataFrame:
    own_adj = adj is None
    if adj is None:
        adj = build_adjacency(
            edges, nodes, num_partitions=num_partitions, hub_top_k=hub_top_k
        )
    n = adj.n
    if n == 0:
        return spark.createDataFrame([], "id string, rank double")

    def decode(df: DataFrame) -> DataFrame:
        """Encoded (id(long), rank) → original string ids."""
        return df.join(adj.vertices.select("id", "orig_id"), "id").select(
            F.col("orig_id").alias("id"), "rank"
        )

    # Empty edge set → uniform (reference viz/graph2metrics.py:726-729).
    if adj.edges.isEmpty():
        out = adj.vertices.select(
            F.col("orig_id").alias("id"), F.lit(1.0 / n).alias("rank")
        )
        if own_adj:
            out = out.localCheckpoint(eager=True)
            adj.unpersist()
        return out

    store = (
        CheckpointStore(
            spark, checkpoint_dir, job_name, state_version="encoded-long-v2"
        )
        if checkpoint_dir
        else None
    )

    start_iter = 0
    ranks = None
    if store is not None:
        last = store.latest_iteration()
        if last is not None:
            # state is stored ENCODED; dense_vertex_ids is deterministic,
            # so a fresh run re-derives the same encoding before resuming
            ranks = store.load_state(last)
            marker = store.load_marker(last)
            if marker.get("converged"):
                return decode(ranks.select("id", "rank"))
            start_iter = last + 1

    if ranks is None and init_ranks is not None:
        seeded = adj.vertices.select("id", "orig_id", "dangling").join(
            init_ranks.select(
                F.col("id").alias("orig_id"), F.col("rank").alias("init_rank")
            ),
            "orig_id",
            "left",
        )
        seeded = seeded.select(
            "id",
            F.coalesce("init_rank", F.lit(1.0 / n)).alias("rank"),
            "dangling",
        ).localCheckpoint(eager=True)
        total = seeded.agg(F.sum("rank")).collect()[0][0] or 0.0
        if total <= 0.0:
            raise ValueError("init_ranks carries no positive mass")
        ranks = seeded.select(
            "id", (F.col("rank") / F.lit(total)).alias("rank"), "dangling"
        ).localCheckpoint(eager=True)
        seeded.unpersist()

    if ranks is None:
        ranks = adj.vertices.select(
            "id", F.lit(1.0 / n).alias("rank"), "dangling"
        )
        ranks = ranks.localCheckpoint(eager=True)

    # dangling mass of the current rank vector (folded into the per-
    # iteration delta aggregate below, so steady state runs ONE driver
    # aggregate per superstep).
    dangling_mass = (
        ranks.agg(F.sum(F.when(F.col("dangling"), F.col("rank")))).collect()[0][0]
        or 0.0
    )

    global LAST_RUN_ITERATIONS
    converged = False
    it = start_iter - 1
    for it in range(start_iter, max_iter):
        prev_state = ranks
        new_ranks = _superstep(ranks, adj, alpha, n, dangling_mass)
        if store is not None:
            new_ranks = store.save_state(it, new_ranks, rows_in=n)
        else:
            # lazy: the delta aggregate below materializes the checkpoint
            # in the SAME job — one scheduling round per superstep, not two
            new_ranks = new_ranks.localCheckpoint(eager=False)
        err, dangling_mass = new_ranks.agg(
            F.sum(F.abs(F.col("rank") - F.col("prev_rank"))),
            F.sum(F.when(F.col("dangling"), F.col("rank"))),
        ).collect()[0]
        err = err or 0.0
        dangling_mass = dangling_mass or 0.0
        ranks = new_ranks.select("id", "rank", "dangling")
        # the new state is materialized — release the previous
        # iteration's checkpoint blocks (they'd otherwise pin |V| rows
        # per superstep for the whole loop)
        prev_state.unpersist()
        if err < n * tol:
            converged = True
            if store is not None:
                # Mark the final iteration as converged for resume.
                store.annotate(it, converged=True)
            break

    LAST_RUN_ITERATIONS = it + 1

    if not converged and strict:
        raise PowerIterationFailedConvergence(
            f"pagerank failed to converge in {max_iter} iterations"
        )

    out = decode(ranks.select("id", "rank"))
    if own_adj:
        out = out.localCheckpoint(eager=True)
        adj.unpersist()
    return out


def personalized_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    seeds: list[str],
    nodes: DataFrame | None = None,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-6,
    checkpoint_dir: str | None = None,
    job_name: str = "ppr",
    num_partitions: int | None = None,
    hub_top_k: int = 256,
    strict: bool = True,
    adj: Adjacency | None = None,
) -> DataFrame:
    """Personalized PageRank (random walk with restart to ``seeds``)
    → DataFrame (id, rank).

    NetworkX ``pagerank(personalization=...)`` semantics: teleport
    vector p uniform over the seed set, dangling mass redistributed by
    p, L1 convergence err < n·tol from a uniform start. The update is

        r' = alpha · (Aᵀ r) + (alpha · dangling_mass + 1 − alpha) · p

    — identical plan shape to the global loop (same skew-split rank
    join, same fused delta+dangling aggregate, one driver job per
    superstep); the only difference is the per-vertex base, carried as
    a sparse ``p`` column in the checkpointed state instead of a
    scalar. Seeds absent from the graph are ignored; an empty
    effective seed set raises ValueError (p would not normalize).
    """
    from k2_18_spark.session import superstep_conf

    if not seeds:
        raise ValueError("personalized_pagerank: empty seed set")
    with superstep_conf(spark):
        return _ppr_loop(
            spark, edges, seeds, nodes, alpha, max_iter, tol,
            checkpoint_dir, job_name, num_partitions, hub_top_k, strict,
            adj,
        )


def _ppr_loop(
    spark, edges, seeds, nodes, alpha, max_iter, tol, checkpoint_dir,
    job_name, num_partitions, hub_top_k, strict, adj,
) -> DataFrame:
    own_adj = adj is None
    if adj is None:
        adj = build_adjacency(
            edges, nodes, num_partitions=num_partitions, hub_top_k=hub_top_k
        )
    n = adj.n
    if n == 0:
        return spark.createDataFrame([], "id string, rank double")

    seeds_df = spark.createDataFrame(
        [(s,) for s in set(seeds)], "orig_id string"
    )
    seed_verts = adj.vertices.join(F.broadcast(seeds_df), "orig_id").select("id")
    num_seeds = seed_verts.count()
    if num_seeds == 0:
        raise ValueError(
            "personalized_pagerank: no seed is a vertex of the graph"
        )
    p_val = 1.0 / num_seeds

    def decode(df: DataFrame) -> DataFrame:
        return df.join(adj.vertices.select("id", "orig_id"), "id").select(
            F.col("orig_id").alias("id"), "rank"
        )

    base_state = adj.vertices.join(
        F.broadcast(seed_verts.withColumn("is_seed", F.lit(True))), "id", "left"
    ).select(
        "id",
        "dangling",
        F.when(F.col("is_seed"), F.lit(p_val)).otherwise(F.lit(0.0)).alias("p"),
    )

    if adj.edges.isEmpty():
        # every vertex is dangling: the fixpoint of
        # r = (alpha·Σr + 1 − alpha)·p is r = p
        out = base_state.join(adj.vertices.select("id", "orig_id"), "id").select(
            F.col("orig_id").alias("id"), F.col("p").alias("rank")
        )
        if own_adj:
            out = out.localCheckpoint(eager=True)
            adj.unpersist()
        return out

    store = (
        CheckpointStore(
            spark, checkpoint_dir, job_name, state_version="ppr-encoded-long-v1"
        )
        if checkpoint_dir
        else None
    )

    start_iter = 0
    ranks = None
    if store is not None:
        last = store.latest_iteration()
        if last is not None:
            ranks = store.load_state(last)
            if store.load_marker(last).get("converged"):
                return decode(ranks.select("id", "rank"))
            start_iter = last + 1

    if ranks is None:
        ranks = base_state.select(
            "id", F.lit(1.0 / n).alias("rank"), "dangling", "p"
        ).localCheckpoint(eager=True)

    dangling_mass = (
        ranks.agg(F.sum(F.when(F.col("dangling"), F.col("rank")))).collect()[0][0]
        or 0.0
    )

    global LAST_RUN_ITERATIONS
    converged = False
    it = start_iter - 1
    for it in range(start_iter, max_iter):
        prev_state = ranks
        # same contribution join as the global superstep; the base is
        # the sparse per-vertex p column instead of a scalar
        rank_src = ranks.select(F.col("id").alias("src_id"), "rank").hint(
            "shuffle_hash"
        )
        if adj.hub_ids:
            hub_ranks = rank_src.filter(F.col("src_id").isin(adj.hub_ids))
            tail_ranks = rank_src.filter(~F.col("src_id").isin(adj.hub_ids))
            contribs = adj.edges_hub.join(
                F.broadcast(hub_ranks), "src_id"
            ).unionByName(adj.edges_tail.join(tail_ranks, "src_id"))
        else:
            contribs = adj.edges.join(rank_src, "src_id")
        agg = (
            contribs.select("dst_id", (F.col("rank") * F.col("frac")).alias("c"))
            .groupBy(F.col("dst_id").alias("id"))
            .agg(F.sum("c").alias("contrib"))
        )
        base_coef = alpha * dangling_mass + (1.0 - alpha)
        new_ranks = (
            ranks.select("id", F.col("rank").alias("prev_rank"), "dangling", "p")
            .join(agg.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                (
                    F.lit(alpha) * F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.lit(base_coef) * F.col("p")
                ).alias("rank"),
                "prev_rank",
                "dangling",
                "p",
            )
        )
        if store is not None:
            new_ranks = store.save_state(it, new_ranks, rows_in=n)
        else:
            new_ranks = new_ranks.localCheckpoint(eager=False)
        err, dangling_mass = new_ranks.agg(
            F.sum(F.abs(F.col("rank") - F.col("prev_rank"))),
            F.sum(F.when(F.col("dangling"), F.col("rank"))),
        ).collect()[0]
        err = err or 0.0
        dangling_mass = dangling_mass or 0.0
        ranks = new_ranks.select("id", "rank", "dangling", "p")
        prev_state.unpersist()
        if err < n * tol:
            converged = True
            if store is not None:
                store.annotate(it, converged=True)
            break

    LAST_RUN_ITERATIONS = it + 1

    if not converged and strict:
        raise PowerIterationFailedConvergence(
            f"personalized pagerank failed to converge in {max_iter} iterations"
        )

    out = decode(ranks.select("id", "rank"))
    if own_adj:
        out = out.localCheckpoint(eager=True)
        adj.unpersist()
    return out


def educational_importance(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    edu_types: list[str] | None = None,
    **kwargs,
) -> DataFrame:
    """PageRank on the educational-edge subgraph, all vertices retained
    (reference viz/graph2metrics.py:620-665). Non-convergence falls back
    to tol=1e-3 like the reference (:657-659)."""
    from k2_18_spark.graph.adjacency import metrics_view
    from k2_18_spark.schemas import EDUCATIONAL_EDGE_TYPES

    types = [t.upper() for t in (edu_types or EDUCATIONAL_EDGE_TYPES)]
    # collapse parallel typed edges first, THEN filter survivors by type
    # (reference builds the nx.DiGraph before taking the edu subgraph —
    # viz/graph2metrics.py:163-170, :636-641)
    edu_edges = metrics_view(edges).filter(F.upper(F.col("edge_type")).isin(types))
    if nodes is None:
        # All original vertices keep teleport mass even if isolated.
        from k2_18_spark.graph.adjacency import vertex_ids

        nodes = vertex_ids(edges, None)
    kwargs.setdefault("job_name", "educational_importance")
    try:
        return pagerank(spark, edu_edges, nodes=nodes, **kwargs)
    except PowerIterationFailedConvergence:
        kwargs.update({"tol": 1e-3, "max_iter": 200})
        return pagerank(spark, edu_edges, nodes=nodes, **kwargs)
