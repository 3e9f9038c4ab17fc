"""Seeded (semi-supervised) label propagation — spread a small set of
trusted labels (spam/ham, language, topic) through the link graph with
the seeds CLAMPED, the Zhu & Ghahramani (2002) label-spreading idiom in
its discrete-argmax form. TrustRank (``graph/trustrank.py``) is the
continuous cousin; this one answers "which label", not "how much
trust".

Semantics (fully deterministic, synchronous):

- seeds keep their label forever (clamped)
- every round, each NON-seed vertex adopts the label with the largest
  total incident weight among currently-labeled neighbors; ties break
  to the SMALLEST label (string order); vertices with no labeled
  neighbor stay unlabeled (NULL)
- updates are synchronous (all votes read the previous round's
  labels), so the trajectory is a pure function of the input — what
  the unrolled SQL oracle replays
- stops when a round changes nothing (labels then are a fixpoint) or
  at ``max_iter``

``directed=False`` (default) votes over the undirected weight-summed
projection (U2 — community semantics); ``directed=True`` votes along
edge direction only (src labels flow to dst — endorsement semantics,
the natural mode for spam labels on a web graph).

Scale plan: one shuffle per round — labeled vertices hash-join the
persisted nbr-partitioned message edges, groupBy(v, label) with
map-side partial aggregation (hub-safe), argmax via min(struct(-w,
label)) hash aggregate (no sort). The label state is |V|-rows max;
per-round state is localCheckpoint-truncated and checkpointed to the
house CheckpointStore (lineage + kill/resume) when ``checkpoint_dir``
is set.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from k2_18_spark.checkpoint import CheckpointStore
from k2_18_spark.graph.lpa import undirected_projection

log = logging.getLogger(__name__)

LAST_RUN_ROUNDS = 0


def seeded_label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    max_iter: int = 20,
    directed: bool = False,
    vote_round: int | None = None,
    checkpoint_dir: str | None = None,
    job_name: str = "seeded_lpa",
) -> DataFrame:
    """→ (id, label, is_seed) for every vertex; label NULL when the
    seeds' labels never reach the vertex. ``seeds`` is (id, label).

    ``vote_round`` optionally rounds vote sums before the argmax so an
    external oracle summing in a different order tie-breaks
    identically (use ≥ 9; unweighted graphs don't need it)."""
    from k2_18_spark.session import superstep_conf

    with superstep_conf(spark):
        return _loop(
            spark, edges, seeds, max_iter, directed, vote_round,
            checkpoint_dir, job_name,
        )


def _loop(
    spark, edges, seeds, max_iter, directed, vote_round, checkpoint_dir,
    job_name,
) -> DataFrame:
    global LAST_RUN_ROUNDS

    if directed:
        msg = (
            edges.filter(F.col("src_id") != F.col("dst_id"))
            .groupBy(
                F.col("src_id").alias("nbr"), F.col("dst_id").alias("v")
            )
            .agg(F.sum("weight").alias("weight"))
        )
    else:
        proj = undirected_projection(edges)
        msg = proj.select(
            F.col("a").alias("nbr"), F.col("b").alias("v"), "weight"
        ).union(
            proj.select(
                F.col("b").alias("nbr"), F.col("a").alias("v"), "weight"
            )
        )
    msg = msg.repartition("nbr").persist(StorageLevel.MEMORY_AND_DISK)
    msg.count()

    verts = (
        msg.select(F.col("v").alias("id"))
        .union(msg.select(F.col("nbr").alias("id")))
        .union(seeds.select("id"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts.count()

    seed_tbl = (
        seeds.groupBy("id").agg(F.min("label").alias("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    seed_tbl.count()

    store = (
        CheckpointStore(
            spark, checkpoint_dir, job_name, state_version="seeded-lpa-v1"
        )
        if checkpoint_dir
        else None
    )

    state = None  # (id, label nullable, is_seed)
    start_iter = 0
    if store is not None:
        last = store.latest_iteration()
        if last is not None:
            state = store.load_state(last)
            if store.load_marker(last).get("converged"):
                return state
            start_iter = last + 1
    if state is None:
        state = (
            verts.join(seed_tbl, "id", "left")
            .select("id", "label", F.col("label").isNotNull().alias("is_seed"))
            .localCheckpoint(eager=True)
        )

    LAST_RUN_ROUNDS = 0
    for it in range(start_iter, max_iter):
        labeled = state.filter(F.col("label").isNotNull()).select(
            F.col("id").alias("nbr"), F.col("label")
        )
        w = F.sum("weight")
        if vote_round is not None:
            w = F.round(w, vote_round)
        votes = (
            msg.join(labeled.hint("shuffle_hash"), "nbr")
            .groupBy("v", "label")
            .agg(w.alias("w"))
        )
        argmax = votes.groupBy("v").agg(
            F.min(F.struct((-F.col("w")).alias("nw"), "label"))
            .getField("label")
            .alias("new_label")
        )
        new_state = (
            state.join(
                argmax.hint("shuffle_hash"),
                state["id"] == argmax["v"],
                "left",
            )
            .select(
                "id",
                F.when(F.col("is_seed"), F.col("label"))
                .otherwise(F.coalesce("new_label", "label"))
                .alias("label"),
                "is_seed",
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_state.alias("n")
            .join(state.alias("o"), "id")
            .filter(~F.col("n.label").eqNullSafe(F.col("o.label")))
            .count()
        )
        state.unpersist()  # release the prior superstep's checkpoint blocks
        state = new_state
        LAST_RUN_ROUNDS = it - start_iter + 1
        if store is not None:
            state = store.save_state(it, state, extra={"changed": changed})
            store.annotate(it, converged=(changed == 0))
        log.info("%s: iteration %d changed %d labels", job_name, it, changed)
        if changed == 0:
            break

    msg.unpersist(), verts.unpersist(), seed_tbl.unpersist()
    return state
