"""Distributed Louvain community detection — SURVEY.md G4 scale path.

The reference clusters with python-louvain (seeded, inherently
sequential, viz/graph2metrics.py:417-511; practical ceiling a few
thousand nodes). ``graph/louvain.py`` replicates that algorithm
driver-side for fixture-scale parity. THIS module is the genuinely
distributed tier: the same two nested Louvain phases — greedy
modularity-gain label moving, then community coarsening — expressed
as DataFrame superstep loops, so the G4 scale path optimizes the
actual Louvain objective (Newman Q, :mod:`k2_18_spark.graph.stats`)
instead of falling back to plain label propagation.

Determinism (the property the sequential algorithm lacks): moves are
SEMI-SYNCHRONOUS — each round only vertices whose dense-order parity
matches the round parity may move, which breaks the two-vertex swap
oscillation synchronous gain-moving exhibits, exactly like the LPA
loop (graph/lpa.py). Within a round every active vertex evaluates

    score(c) = k_i,in(c) − γ · Σ_tot(c \\ i) · k_i / (2m)

over its neighbor communities plus its own (python-louvain's gain,
reimplemented from the published formula), and adopts the argmax
under the deterministic order (score desc, prefer staying, min
community id). Scores can optionally be rounded (``score_round``)
so an external SQL oracle summing the same doubles in a different
order reproduces the exact trajectory — the LPA ``vote_round`` trick.

Scale: one |E|-shuffle per round (the parity-pre-split persisted
symmetric edge table joins the community vector, then ONE
repartition-by-vertex serves both the (v, community) weight sum and
the per-vertex argmax — the LPA subset-rule plan), plus two O(|V|)
aggregates for Σ_tot and the move application. Coarsening collapses
each level's graph with a single canonical-pair groupBy; self-loops
(intra-community mass) ride along as a separate per-vertex column and
contribute to degrees but never to move gains, matching the
sequential algorithm. Levels checkpoint the COMPOSED original→community
mapping through the house CheckpointStore (resume granularity = one
coarsening level; per-round move counts land in the level marker).
"""

from __future__ import annotations

import logging
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from k2_18_spark.checkpoint import CheckpointStore
from k2_18_spark.graph.adjacency import dense_vertex_ids, vertex_ids
from k2_18_spark.graph.lpa import undirected_projection

log = logging.getLogger(__name__)

#: per-level move-round counts of the most recent run (observability)
LAST_RUN_LEVEL_ROUNDS: list[int] = []
#: per-level realized modularity gain (Σ per-move ΔQ) of the most
#: recent run — the plateau early-exit reads these same numbers
LAST_RUN_LEVEL_DQ: list[float] = []


def louvain_superstep(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    resolution: float = 1.0,
    max_rounds_per_level: int = 10,
    max_levels: int = 10,
    checkpoint_dir: str | None = None,
    job_name: str = "louvain",
    num_partitions: int | None = None,
    score_round: int | None = None,
    min_moves_frac: float = 0.01,
    min_round_dq: float | None = None,
) -> DataFrame:
    """→ (id, cluster_id), sequential ids by min member order (T6).

    Directed input edges are projected to the canonical undirected
    form first (U2, bidirectional weights summed, self-loops dropped —
    the same projection the sequential reference clusters).

    ``min_moves_frac``: a level's move loop also stops once two
    consecutive rounds each move ≤ ``frac·n_level`` vertices — on
    inputs that never quiesce under synchronous dynamics (the bench
    power-law graph churns ~20 % of labels per round, same measured
    behavior as LPA) the residual churn is handed to the next
    coarsening level instead of burning the round cap. The threshold
    floors to 0 below ``1/frac`` vertices, i.e. small graphs keep the
    exact zero-move convergence the planted-topology tests pin. Set
    0.0 for strict zero-move semantics (the driver-oracle query does,
    so its unrolled-SQL twin replays the identical trajectory).

    ``min_round_dq``: the modularity-plateau exit. Every applied move's
    greedy gain ΔQ·m = score(best) − score(current), evaluated against
    round-start Σ_tot (concurrent same-parity moves make the round sum
    an estimate of the realized ΔQ), rides through the existing
    move-application aggregate, so each round's total ΔQ is free; a
    round whose ΔQ falls below this threshold ends the level, and a
    LEVEL whose total ΔQ falls below it ends the run (moves that churn
    labels without improving Q — the power-law steady state — stop
    burning supersteps). ``None`` disables (the exact-trajectory
    oracle default).
    """
    from k2_18_spark.session import superstep_conf

    with superstep_conf(spark):
        return _louvain_loop(
            spark, edges, nodes, resolution, max_rounds_per_level,
            max_levels, checkpoint_dir, job_name, num_partitions,
            score_round, min_moves_frac, min_round_dq,
        )


def _persist(df: DataFrame) -> DataFrame:
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def _move_phase(
    spark,
    proj: DataFrame,
    selfw: DataFrame,
    resolution: float,
    m: float,
    max_rounds: int,
    num_partitions: int | None,
    score_round: int | None,
    min_moves_frac: float = 0.0,
    min_round_dq: float | None = None,
) -> tuple[DataFrame, int, list[int], float]:
    """One Louvain level: greedy gain moves until two consecutive
    rounds (a full even+odd cycle) each move ≤ floor(frac·n) vertices
    (frac 0 = exact quiescence), or — with ``min_round_dq`` — until a
    round's realized modularity gain falls below the threshold.
    ``proj`` is canonical (a, b, w) with a<b, a!=b; ``selfw`` is
    (v, s) intra-vertex mass. Returns (comm(v,c), total moves,
    per-round move counts, level ΔQ). Vertex keys are dense longs; the
    per-round state carries the static degree k so Σ_tot and the gain
    join need no extra degree-table joins."""
    sym_all = (
        proj.select(F.col("a").alias("v"), F.col("b").alias("nbr"), "w")
        .union(proj.select(F.col("b").alias("v"), F.col("a").alias("nbr"), "w"))
        .withColumn("par", F.pmod(F.col("v"), F.lit(2)).cast("int"))
        .repartition(*([num_partitions, "nbr"] if num_partitions else ["nbr"]))
        # staging persist (r6): the two parity halves below used to
        # each materialize this union+repartition from scratch — the
        # level build paid the 2|E| shuffle TWICE. Cache it once, let
        # the halves filter from the cache, release it.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _t_build = time.time()
    sym_by_par = [
        _persist(sym_all.filter(F.col("par") == p).drop("par")) for p in (0, 1)
    ]
    # weighted degree k_i = Σ incident w + 2·self-loop mass (the
    # undirected degree convention modularity uses); vertices with ONLY
    # a self-loop still appear via the selfw union. Computed off the
    # persisted canonical pair table (both endpoint directions), not
    # off sym_all — sym_all's repartition-by-nbr would re-shuffle 2|E|
    # rows just to build this one |V|-row vector (r6, guide §2.4).
    k = (
        proj.select(F.col("a").alias("v"), "w")
        .union(proj.select(F.col("b").alias("v"), "w"))
        .union(selfw.select("v", (F.col("s") * 2).alias("w")))
        .groupBy("v")
        .agg(F.sum("w").alias("k"))
    )
    for s in sym_by_par:
        s.count()
    sym_all.unpersist()
    log.info("louvain sym-build wall=%.1fs", time.time() - _t_build)
    _t_build = time.time()

    # state carries (v, c, k): k is static per level, riding along so
    # every per-round consumer (Σ_tot, the gain expression) reads it
    # without a join against a separate degree table
    comm = k.select("v", F.col("v").alias("c"), "k").localCheckpoint(eager=True)
    n_level = comm.count()
    log.info(
        "louvain level-setup n=%d wall=%.1fs", n_level, time.time() - _t_build
    )
    threshold = int(n_level * min_moves_frac)
    rounds: list[int] = []
    total_moves = 0
    level_dq = 0.0
    prev_moves = None
    gamma = F.lit(resolution)
    two_m = F.lit(2.0 * m)
    for r in range(max_rounds):
        _t0 = time.time()
        active = sym_by_par[r % 2]
        # k_in(v, c) over neighbor communities — the one |E|-sized
        # shuffle of the round (subset rule: repartition by v serves
        # the (v,c) sum AND the per-v argmax)
        k_in = (
            active.join(
                comm.select(F.col("v").alias("nbr"), "c").hint("shuffle_hash"),
                "nbr",
            )
            .select("v", "c", "w")
            .repartition(*([num_partitions, "v"] if num_partitions else ["v"]))
            .groupBy("v", "c")
            .agg(F.sum("w").alias("k_in"))
        )
        # Σ_tot per community straight off the state (shrinks as
        # communities merge). The cand⋈sigma join is SKEW-prone: once
        # communities consolidate, most candidate rows carry a handful
        # of giant community ids and a hash join serializes on 1-2 hot
        # partitions (measured: round walls grew 1.4s→28.6s within a
        # level). Σ_tot is ≤ n_level rows of (long, double), so below
        # the same 4M-row gate the LPA frontier uses we broadcast it;
        # above the gate communities are still fine-grained (skew-free
        # by construction — consolidation is what shrinks the table).
        sigma = comm.groupBy("c").agg(F.sum("k").alias("tot"))
        if n_level <= 4_000_000:
            sigma = F.broadcast(sigma)
        else:
            sigma = sigma.hint("shuffle_hash")
        cur = comm.filter(F.pmod(F.col("v"), F.lit(2)) == F.lit(r % 2)).select(
            "v", F.col("c").alias("c0"), "k"
        )
        # r6 rework (guide §2.4): the old plan unioned a synthetic
        # (v, c0, 0.0) stay row into k_in and re-aggregated — the union
        # destroyed k_in's hash(v) partitioning, costing TWO extra
        # exchanges of the candidate table per round (groupBy(v,c),
        # then the re-exchange for the join on v). Now the neighbor
        # candidates aggregate in place (k_in is already partitioned by
        # v) and the stay option is synthesized on the |V|/2-row `cur`
        # side: stay score with k_in=0 comes from one broadcast join of
        # sigma on c0, and `greatest` against the aggregated neighbor
        # max reproduces the old merged-candidate argmax exactly —
        # including the k_in(c0) ≥ 0 clamp the union's max gave, since
        # score is monotone in k_in and round() is monotone, so
        # greatest(actual-c0 score, zero-k_in score) ==
        # score(max(k_in, 0)). score0 (the realized stay score) feeds
        # the gain/ΔQ observability unchanged.
        score = (
            F.col("k_in")
            - gamma
            * (F.col("tot") - F.when(F.col("c") == F.col("c0"), F.col("k")).otherwise(0.0))
            * F.col("k")
            / two_m
        )
        stay_score = (
            F.lit(0.0) - gamma * (F.col("tot") - F.col("k")) * F.col("k") / two_m
        )
        if score_round is not None:
            score = F.round(score, score_round)
            stay_score = F.round(stay_score, score_round)
        nb = (
            k_in.join(cur.hint("shuffle_hash"), "v")
            .join(sigma, "c")
            .groupBy("v")
            .agg(
                F.max(
                    F.struct(
                        score.alias("score"),
                        (F.col("c") == F.col("c0")).cast("int").alias("stay"),
                        (-F.col("c")).alias("neg_c"),
                    )
                ).alias("m"),
                F.max(F.when(F.col("c") == F.col("c0"), score)).alias("s0"),
            )
        )
        stay = cur.join(
            sigma.withColumnRenamed("c", "c0"), "c0"
        ).select(
            "v",
            F.struct(
                stay_score.alias("score"),
                F.lit(1).cast("int").alias("stay"),
                (-F.col("c0")).alias("neg_c"),
            ).alias("m0"),
            stay_score.alias("s0b"),
        )
        best = (
            stay.join(nb, "v", "left")
            .select(
                "v",
                F.greatest("m", "m0").alias("m"),
                F.greatest("s0", "s0b").alias("s0"),
            )
            .select(
                "v",
                (-F.col("m.neg_c")).alias("best_c"),
                (F.col("m.score") - F.col("s0")).alias("gain"),
            )
        )
        # STATE HANDOFF — the order here is load-bearing. Spark 4's
        # Dataset.localCheckpoint rewrites the new LogicalRDD's stats
        # from the ORIGIN plan (rewriteStatsAndConstraints), and the
        # size-only join estimate is the PRODUCT of the children's
        # sizeInBytes. Chaining checkpoints of join plans therefore
        # compounds the products: sizeInBytes ~ S^(2^round), the
        # BigInteger's bit-length doubles per round, and the driver
        # ends up inside BigInteger.multiplyToomCook3 for minutes
        # (jstack-verified; round walls grew 1 s → 28 s → 1368 s).
        # Materializing through a persisted InMemoryRelation first
        # resets the stats to the REAL cached byte size, so the
        # checkpoint inherits a bounded number. Measured flat at
        # ~1 s/round at the state that previously exploded.
        new_comm = (
            comm.withColumnRenamed("c", "old_c")
            .join(best.hint("shuffle_hash"), "v", "left")
            .select(
                "v", F.coalesce("best_c", "old_c").alias("c"), "old_c", "k",
                "gain",
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        moved = F.col("c") != F.col("old_c")
        stats = new_comm.agg(
            F.sum(moved.cast("long")).alias("moves"),
            F.sum(F.when(moved, F.col("gain"))).alias("dq_m"),
        ).collect()[0]
        moves = stats["moves"] or 0
        round_dq = (stats["dq_m"] or 0.0) / m
        log.info(
            "louvain round=%d moves=%d dq=%.6g wall=%.1fs",
            r, moves, round_dq, time.time() - _t0,
        )
        rounds.append(moves)
        total_moves += moves
        level_dq += round_dq
        prev = comm
        comm = new_comm.select("v", "c", "k").localCheckpoint(eager=True)
        new_comm.unpersist()
        prev.unpersist()
        if moves <= threshold and prev_moves is not None and prev_moves <= threshold:
            break
        if min_round_dq is not None and round_dq < min_round_dq:
            break
        prev_moves = moves
    for s in sym_by_par:
        s.unpersist()
    return comm.select("v", "c"), total_moves, rounds, level_dq


def _louvain_loop(
    spark, edges, nodes, resolution, max_rounds_per_level, max_levels,
    checkpoint_dir, job_name, num_partitions, score_round, min_moves_frac,
    min_round_dq=None,
) -> DataFrame:
    _t0 = time.time()
    # node_order shortcut (r6 — the lpa.py/sssp.py idiom): when the
    # caller's node table already carries the canonical order key, the
    # whole two-phase dense-numbering build (distinct + range
    # repartition + offsets collect + window) is redundant
    if nodes is not None and "node_order" in nodes.columns:
        verts = _persist(nodes.select("id", F.col("node_order").alias("ord")))
    else:
        verts = _persist(dense_vertex_ids(vertex_ids(edges, nodes)))
    n = verts.count()
    if n == 0:
        return spark.createDataFrame([], "id string, cluster_id int")
    log.info("louvain verts n=%d wall=%.1fs", n, time.time() - _t0)

    proj0 = undirected_projection(edges)
    enc_a = verts.select(F.col("id").alias("a"), F.col("ord").alias("_ea"))
    enc_b = verts.select(F.col("id").alias("b"), F.col("ord").alias("_eb"))
    proj = _persist(
        proj0.join(enc_a.hint("shuffle_hash"), "a")
        .join(enc_b.hint("shuffle_hash"), "b")
        .select(
            F.col("_ea").alias("a"), F.col("_eb").alias("b"),
            F.col("weight").alias("w"),
        )
    )
    selfw = _persist(
        proj.select(F.col("a").alias("v"), F.lit(0.0).alias("s")).limit(0)
    )
    _t1 = time.time()
    m = (proj.agg(F.sum("w")).collect()[0][0] or 0.0)
    log.info("louvain proj+m wall=%.1fs", time.time() - _t1)
    if m == 0:
        # no edges: every vertex its own singleton community
        out = verts.select(
            "id",
            (F.dense_rank().over(Window.orderBy("ord")) - 1)
            .cast("int")
            .alias("cluster_id"),
        )
        verts.unpersist()
        return out

    store = (
        CheckpointStore(
            spark, checkpoint_dir, job_name, state_version="louvain-levels-v1"
        )
        if checkpoint_dir
        else None
    )
    # mapping: original ord → current community (composed across levels)
    mapping = verts.select(F.col("ord").alias("v"), F.col("ord").alias("c"))
    start_level = 0
    if store is not None:
        last = store.latest_iteration()
        if last is not None:
            state = store.load_state(last)
            mapping = state.select("v", "c")
            if store.load_marker(last).get("converged"):
                return _emit(mapping, verts)
            # rebuild the level-(last+1) coarse graph from the mapping
            proj, selfw = _coarsen(proj, selfw, mapping, num_partitions)
            start_level = last + 1

    global LAST_RUN_LEVEL_ROUNDS, LAST_RUN_LEVEL_DQ
    LAST_RUN_LEVEL_ROUNDS = []
    LAST_RUN_LEVEL_DQ = []
    for level in range(start_level, max_levels):
        comm, moves, rounds, level_dq = _move_phase(
            spark, proj, selfw, resolution, m, max_rounds_per_level,
            num_partitions, score_round, min_moves_frac, min_round_dq,
        )
        LAST_RUN_LEVEL_ROUNDS.append(len(rounds))
        LAST_RUN_LEVEL_DQ.append(level_dq)
        # compose: original → level community. LEFT join: isolated
        # singletons never enter the edge-derived comm table and keep
        # their own id (their id can't collide with a surviving
        # community id — an isolated vertex is never any other
        # vertex's neighbor community).
        new_mapping = (
            mapping.join(
                comm.select(F.col("v").alias("c"), F.col("c").alias("_nc")).hint(
                    "shuffle_hash"
                ),
                "c",
                "left",
            )
            .select("v", F.coalesce("_nc", "c").alias("c"))
            .localCheckpoint(eager=False)
        )
        if store is not None:
            new_mapping = store.save_state(
                level, new_mapping.select("v", "c"), rows_in=n
            )
            store.annotate(level, moves=moves, rounds=rounds)
        new_mapping.count()
        mapping = new_mapping.select("v", "c")
        log.info(
            "louvain level=%d moves=%d rounds=%d dq=%.6g",
            level, moves, len(rounds), level_dq,
        )
        if moves == 0 or (
            min_round_dq is not None and level_dq < min_round_dq
        ):
            if store is not None:
                store.annotate(level, converged=True)
            break
        if level + 1 >= max_levels:
            break  # level cap: skip the coarsening no later level reads
        _tc = time.time()
        new_proj, new_selfw = _coarsen(proj, selfw, comm, num_partitions)
        log.info("louvain coarsen wall=%.1fs", time.time() - _tc)
        proj.unpersist()
        selfw.unpersist()
        proj, selfw = new_proj, new_selfw

    out = _emit(mapping, verts)
    proj.unpersist()
    selfw.unpersist()
    verts.unpersist()
    return out


def _coarsen(
    proj: DataFrame, selfw: DataFrame, comm: DataFrame,
    num_partitions: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Contract communities → (coarse proj, coarse selfw), persisted.
    Intra-community edge mass + member self-loops become the
    supervertex's self-loop; inter-community mass collapses to one
    canonical pair per community pair."""
    ca = comm.select(F.col("v").alias("a"), F.col("c").alias("_ca"))
    cb = comm.select(F.col("v").alias("b"), F.col("c").alias("_cb"))
    # staging persist (r6): tagged feeds BOTH the coarse pair rollup
    # and the self-loop rollup — without it the two counts below each
    # re-ran the full two-join |E| tagging
    tagged = (
        proj.join(ca.hint("shuffle_hash"), "a")
        .join(cb.hint("shuffle_hash"), "b")
        .select(F.col("_ca").alias("ca"), F.col("_cb").alias("cb"), "w")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # localCheckpoint, not persist (r6): the coarse tables feed the
    # next level's ENTIRE job set (sym build, k, every move round), and
    # a cached-but-deep plan makes each of those jobs re-analyze and
    # cache-match the full two-join coarsening lineage — measured 3× on
    # the level-1 setup despite a 2.6× smaller graph. Checkpointing
    # truncates the lineage to a LogicalRDD (the pagerank idiom), so
    # level n+1 plans start flat; the lazy checkpoint materializes in
    # the same job as the count below.
    new_proj = (
        tagged.filter(F.col("ca") != F.col("cb"))
        .select(
            F.least("ca", "cb").alias("a"),
            F.greatest("ca", "cb").alias("b"),
            "w",
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    loops = tagged.filter(F.col("ca") == F.col("cb")).select(
        F.col("ca").alias("v"), F.col("w").alias("s")
    )
    member_loops = (
        selfw.join(
            comm.select(F.col("v"), F.col("c")).hint("shuffle_hash"), "v"
        ).select(F.col("c").alias("v"), "s")
    )
    new_selfw = (
        loops.unionByName(member_loops)
        .groupBy("v")
        .agg(F.sum("s").alias("s"))
        .localCheckpoint(eager=False)
    )
    new_proj.count()
    new_selfw.count()
    tagged.unpersist()
    return new_proj, new_selfw


def _emit(mapping: DataFrame, verts: DataFrame) -> DataFrame:
    """(orig ord → community) → (id, cluster_id) with sequential ids
    ordered by min member ord (T6, reference renumbering)."""
    min_ord = mapping.groupBy("c").agg(F.min("v").alias("min_ord"))
    ranked = min_ord.select(
        "c",
        (F.dense_rank().over(Window.orderBy("min_ord")) - 1)
        .cast("int")
        .alias("cluster_id"),
    )
    dec = verts.select(F.col("ord").alias("v"), F.col("id").alias("orig_id"))
    return (
        mapping.join(F.broadcast(ranked), "c")
        .join(dec, "v")
        .select(F.col("orig_id").alias("id"), "cluster_id")
    )
