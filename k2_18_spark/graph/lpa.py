"""Weighted label propagation (community labels) — SURVEY.md G4 scale path.

The reference clusters with python-louvain (seeded, inherently
sequential — viz/graph2metrics.py:417-511). The north_rule names
*label propagation* as the distributed algorithm; we run synchronous
weighted LPA over the same undirected projection the reference builds
(bidirectional weights summed, U2: viz/graph2metrics.py:459-472) and
apply the same deterministic renumbering (clusters sorted by min
member key). Divergence vs Louvain goldens is documented in SURVEY §7.

Determinism: semi-synchronous updates — each superstep only vertices
whose node-order parity (``ord % 2``) matches the round parity adopt
the label with the max total incident weight (ties → smaller label);
the other half wait. This 2-coloring breaks the label-swap oscillation
pure synchronous LPA exhibits on bipartite-ish structures while
staying fully deterministic (order parity is data-derived, not random,
and — unlike a hash — expressible in ANSI SQL, so the driver's DuckDB
oracle can replay the exact trajectory). Convergence = a full even+odd
cycle with zero changes, or the iteration cap; once a full cycle
changes nothing, every later iteration is a fixpoint, so the state at
the cap equals the converged state. Deterministic renumbering makes
the output stable either way.

Scale: the projected edge list is built and persisted once WITH the
receiving vertex's parity precomputed; each superstep filters the edge
table to the active parity class BEFORE the vote join, so only half
the |E|-sized vote traffic crosses the wire per round (the inactive
half's votes were previously computed and discarded). groupBy(vertex,
label) has map-side partial aggregation (hub-safe); per-vertex argmax
is a max(struct) hash aggregate — no global sort. Supersteps
checkpoint labels + lineage like every other loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

import logging

from k2_18_spark.checkpoint import CheckpointStore
from k2_18_spark.graph.adjacency import metrics_view, vertex_ids

log = logging.getLogger(__name__)

# rounds in which the changed-label frontier actually pruned the vote
# join during the most recent run (observability for tests/bench —
# same pattern as pagerank.LAST_RUN_ITERATIONS)
LAST_RUN_FRONTIER_ROUNDS = 0


def undirected_projection(edges: DataFrame) -> DataFrame:
    """U2: canonical-pair projection, bidirectional weights summed
    (reference viz/graph2metrics.py:459-472). → (a, b, weight), a<b."""
    e = metrics_view(edges).filter(F.col("src_id") != F.col("dst_id"))
    return (
        e.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
            "weight",
        )
        .groupBy("a", "b")
        .agg(F.sum("weight").alias("weight"))
    )


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    job_name: str = "lpa",
    num_partitions: int | None = None,
    vote_round: int | None = None,
    use_frontier: bool = True,
) -> DataFrame:
    """→ (id, cluster_id) — sequential ids by min member order (T6).

    ``vote_round``: optionally round the per-(vertex,label) weight sums
    to this many decimals before the argmax — makes tie-breaking
    agree bit-for-bit with an external SQL oracle summing the same
    weights in a different order (use ≥ 9 so only float noise rounds
    away).

    ``use_frontier``: enable the changed-label frontier (provably
    trajectory-identical; False forces full votes every round — used by
    the equivalence test)."""
    from k2_18_spark.session import superstep_conf

    with superstep_conf(spark):
        return _lpa_loop(
            spark, edges, nodes, max_iter, checkpoint_dir, job_name,
            num_partitions, vote_round, use_frontier,
        )


def _lpa_loop(
    spark, edges, nodes, max_iter, checkpoint_dir, job_name, num_partitions,
    vote_round, use_frontier=True,
) -> DataFrame:
    from k2_18_spark.graph.adjacency import dense_vertex_ids

    if nodes is not None and "node_order" in nodes.columns:
        verts = nodes.select("id", F.col("node_order").alias("ord"))
    else:
        # deterministic dense order ids WITHOUT a single-task global sort
        verts = dense_vertex_ids(vertex_ids(edges, nodes))
    verts = verts.persist(StorageLevel.MEMORY_AND_DISK)
    n = verts.count()
    if n == 0:
        return spark.createDataFrame([], "id string, cluster_id int")

    proj = undirected_projection(edges)
    # both directions for message passing: (v, nbr, weight, par), with
    # endpoints dictionary-ENCODED to the (long) order ids — supersteps
    # shuffle 8-byte keys, never strings. The receiving vertex's order
    # parity is just v % 2 after encoding, so each superstep filters the
    # edge table to the active class BEFORE the vote join (halves the
    # per-round shuffle; the old plan computed votes for all vertices
    # and discarded half).
    enc_a = verts.select(F.col("id").alias("a"), F.col("ord").alias("_va"))
    enc_b = verts.select(F.col("id").alias("b"), F.col("ord").alias("_vb"))
    proj_enc = (
        proj.join(enc_a.hint("shuffle_hash"), "a")
        .join(enc_b.hint("shuffle_hash"), "b")
        .select(F.col("_va").alias("a"), F.col("_vb").alias("b"), "weight")
    )
    sym_all = (
        proj_enc.select(F.col("a").alias("v"), F.col("b").alias("nbr"), "weight")
        .union(
            proj_enc.select(F.col("b").alias("v"), F.col("a").alias("nbr"), "weight")
        )
        .withColumn("par", F.pmod(F.col("v"), F.lit(2)).cast("int"))
        .repartition(*( [num_partitions, "nbr"] if num_partitions else ["nbr"] ))
        # staging persist (r6): the two parity halves below used to
        # each materialize the union+repartition from scratch — the
        # build paid the 2|E| shuffle twice. Cache once, filter from
        # the cache, release.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # pre-SPLIT by receiver parity: each round joins/scans only its
    # active half instead of filtering the full persisted table
    sym_by_par = [
        sym_all.filter(F.col("par") == p)
        .drop("par")
        .persist(StorageLevel.MEMORY_AND_DISK)
        for p in (0, 1)
    ]
    for s in sym_by_par:
        s.count()  # eager — supersteps must not pay the build
    sym_all.unpersist()

    store = (
        CheckpointStore(
            spark, checkpoint_dir, job_name, state_version="encoded-long-v2"
        )
        if checkpoint_dir
        else None
    )
    labels = None
    start_iter = 0
    if store is not None:
        last = store.latest_iteration()
        if last is not None:
            state = store.load_state(last)
            labels = state.select("id", "label")
            if store.load_marker(last).get("converged"):
                return _renumber(labels, verts)
            start_iter = last + 1
    if labels is None:
        labels = verts.select(
            F.col("ord").alias("id"), F.col("ord").alias("label")
        ).localCheckpoint(eager=True)

    # changed-label frontier state: the encoded ids that changed in the
    # two most recent iterations (None until recorded — resume restarts
    # with two full-vote rounds, which is always correct, just slower)
    changed_dfs: dict[int, DataFrame] = {}
    changed_cnts: dict[int, int] = {}
    # don't broadcast frontiers beyond this many vertices (the gate that
    # keeps the optimization safe at 10^9-vertex scale)
    max_frontier_broadcast = min(max(n // 4, 1), 4_000_000)

    global LAST_RUN_FRONTIER_ROUNDS
    LAST_RUN_FRONTIER_ROUNDS = 0

    prev_changed = None
    for it in range(start_iter, max_iter):
        # CHANGED-LABEL FRONTIER: an active vertex's argmax can only
        # differ from its previous vote (two iterations ago, same
        # parity) if ≥1 neighbor changed label in iteration it-1 or
        # it-2 — identical vote multiset ⇒ identical argmax incl.
        # tie-break, so skipping it cannot alter the trajectory. Late
        # rounds' vote joins collapse to the few edges around still-
        # moving labels instead of the full |E|/2 half-table.
        active_edges = sym_by_par[it % 2]
        frontier = None
        c1, c2 = changed_dfs.get(it - 1), changed_dfs.get(it - 2)
        if (
            use_frontier
            and it >= start_iter + 2
            and it >= 2
            and c1 is not None
            and c2 is not None
            and (changed_cnts[it - 1] + changed_cnts[it - 2])
            < max_frontier_broadcast
        ):
            moved = c1.unionByName(c2).distinct()
            frontier = (
                active_edges.join(
                    F.broadcast(moved.withColumnRenamed("id", "nbr")), "nbr"
                )
                .select("v")
                .distinct()
                .localCheckpoint(eager=False)  # count() below materializes
            )
            if frontier.count() < max_frontier_broadcast:
                # scan of the persisted half + broadcast semi-filter —
                # no shuffle on the edge side
                active_edges = active_edges.join(F.broadcast(frontier), "v")
                LAST_RUN_FRONTIER_ROUNDS += 1
            # else: hub-dense frontier — full vote is cheaper than a
            # giant broadcast; correctness unaffected either way

        # neighbor label weights: vote(v, label) = Σ weight of edges to
        # neighbors currently holding `label`, computed ONLY for this
        # round's active parity class (the filter hits the persisted
        # edge table before anything shuffles).
        # shuffle_hash: hash the label vector, stream the edges; then ONE
        # shuffle by vertex serves both aggregations below — hash(v)
        # partitioning satisfies the (v,label) sum AND the per-v argmax
        # (subset rule), so the vote table crosses the wire once per round
        w_sum = F.sum("weight")
        if vote_round is not None:
            w_sum = F.round(w_sum, vote_round)
        votes = (
            active_edges
            .join(
                labels.select(F.col("id").alias("nbr"), "label").hint(
                    "shuffle_hash"
                ),
                "nbr",
            )
            .select(F.col("v").alias("id"), "label", "weight")
            .repartition(*( [num_partitions, "id"] if num_partitions else ["id"] ))
            .groupBy("id", "label")
            .agg(w_sum.alias("w"))
        )
        # argmax(w) with min-label tie-break as a single hash aggregate
        # (exchange-free after the repartition above)
        best = votes.groupBy("id").agg(
            F.max(F.struct(F.col("w"), (-F.col("label")).alias("neg_label"))).alias(
                "m"
            )
        ).select("id", (-F.col("m.neg_label")).alias("best_label"))
        # semi-synchronous: `best` only contains active-parity vertices
        # (the sym filter above), so coalesce IS the parity gate —
        # inactive vertices and isolated active ones keep their label
        new_labels = (
            labels.withColumnRenamed("label", "old_label")
            .join(best.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.coalesce("best_label", "old_label").alias("label"),
                "old_label",
            )
        )
        prev_state = labels
        if store is not None:
            new_labels = store.save_state(it, new_labels, rows_in=n)
        else:
            # lazy: the changed_df count below computes new_labels and
            # materializes BOTH checkpoints in one job (was three jobs:
            # labels checkpoint, changed checkpoint, count)
            new_labels = new_labels.localCheckpoint(eager=False)
        changed_df = (
            new_labels.filter(F.col("label") != F.col("old_label"))
            .select("id")
            .localCheckpoint(eager=False)
        )
        changed = changed_df.count()
        log.info("lpa iteration=%d changed=%d (n=%d)", it, changed, n)
        changed_dfs[it] = changed_df
        changed_cnts[it] = changed
        stale = changed_dfs.pop(it - 2, None)  # only last two rounds matter
        if stale is not None:
            stale.unpersist()
        labels = new_labels.select("id", "label")
        prev_state.unpersist()  # release the prior superstep's blocks
        if frontier is not None:
            frontier.unpersist()
        # converged when a full even+odd cycle changes nothing
        if changed == 0 and prev_changed == 0:
            if store is not None:
                store.annotate(it, converged=True)
            break
        prev_changed = changed

    out = _renumber(labels, verts)
    verts.unpersist()
    for s in sym_by_par:
        s.unpersist()
    return out


def _renumber(labels: DataFrame, verts: DataFrame) -> DataFrame:
    """Sequential cluster ids ordered by min member ``ord`` (T6 —
    reference renumbers Louvain clusters by min node id,
    viz/graph2metrics.py:498-505; we use the order key for stability),
    decoding the encoded (order-long) vertex keys back to string ids.

    Labels ARE member order ids under the encoding, so min(label) per
    cluster is the min member ord — no extra member join needed."""
    min_ord = labels.groupBy("label").agg(F.min("id").alias("min_ord"))
    ranked = min_ord.select(
        "label",
        (F.dense_rank().over(Window.orderBy("min_ord")) - 1)
        .cast("int")
        .alias("cluster_id"),
    )
    dec = verts.select(F.col("ord").alias("id"), F.col("id").alias("orig_id"))
    return (
        labels.join(F.broadcast(ranked), "label")
        .join(dec, "id")
        .select(F.col("orig_id").alias("id"), "cluster_id")
    )
