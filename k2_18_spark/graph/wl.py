"""Weisfeiler-Lehman label refinement — structural fingerprints for
vertices and whole graphs.

1-WL color refinement (Weisfeiler & Lehman 1968; the graph-hash form
of Shervashidze et al. JMLR 2011): every vertex starts from a label
of its local degree signature and each round re-labels to a hash of
(own label, sorted multiset of neighbor labels). After R rounds two
vertices share a label only if their R-hop neighborhoods are
indistinguishable by 1-WL — the standard cheap structural-role /
template-detection signal on web graphs (boilerplate site-graph
shapes hash identically), and ``wl_signature`` collapses the label
multiset into one graph-level hash, the usual subgraph-dedup key.
Known limitation (by construction, tested): 1-WL cannot separate
regular graphs of equal degree — C6 and 2×C3 collide.

Determinism: labels are md5 hex strings; the neighbor multiset is
sorted lexicographically (ASCII) before hashing, so every round is a
pure function of the graph — bit-for-bit reproducible in DuckDB,
which is what the ``graph_wl`` oracle replays.

Semantics:
- parallel edges collapse to one, self-loops dropped;
- directed mode tags out-neighbors ``o:`` and in-neighbors ``i:``
  (a vertex distinguishes fan-in from fan-out); undirected mode tags
  everything ``n:`` over the symmetrized edge set;
- initial label ``md5('wl0|' || out_deg || '|' || in_deg)``
  (undirected: both numbers equal the degree);
- round t: ``md5(prev || '|' || join(sorted(tag || prev(nbr)), ','))``
  — isolated vertices hash ``prev || '|'``.

Scale plan: the tagged message table (v, nbr, tag) is built once,
repartitioned on ``nbr`` and persisted; each round is ONE
shuffle-hash join of the |V|-row label state against it plus ONE
groupBy(v) with a sort-free collect_list → array_sort (the per-vertex
list is degree-sized — hub vertices make wide rows, the same bound
every WL implementation has; cap-degree upstream if a 10^8-degree
hub exists). State is localCheckpoint-truncated per round and
checkpointed to the house CheckpointStore (lineage + kill/resume)
when ``checkpoint_dir`` is set.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from k2_18_spark.checkpoint import CheckpointStore

log = logging.getLogger(__name__)

LAST_RUN_ROUNDS = 0


def wl_refinement(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 3,
    directed: bool = True,
    nodes: DataFrame | None = None,
    checkpoint_dir: str | None = None,
    job_name: str = "wl",
) -> DataFrame:
    """→ (id, wl_label) after ``rounds`` refinement rounds.

    ``nodes`` (optional, column ``id``) adds isolated vertices."""
    from k2_18_spark.session import superstep_conf

    with superstep_conf(spark):
        return _loop(
            spark, edges, rounds, directed, nodes, checkpoint_dir, job_name
        )


def _loop(
    spark, edges, rounds, directed, nodes, checkpoint_dir, job_name
) -> DataFrame:
    global LAST_RUN_ROUNDS

    e = (
        edges.select(F.col("src_id").alias("s"), F.col("dst_id").alias("t"))
        .filter(F.col("s") != F.col("t"))
        .distinct()
    )
    if directed:
        msg = e.select(
            F.col("t").alias("v"), F.col("s").alias("nbr"), F.lit("i:").alias("tag")
        ).union(
            e.select(
                F.col("s").alias("v"), F.col("t").alias("nbr"),
                F.lit("o:").alias("tag"),
            )
        )
    else:
        und = e.select("s", "t").union(
            e.select(F.col("t").alias("s"), F.col("s").alias("t"))
        ).distinct()
        msg = und.select(
            F.col("s").alias("v"), F.col("t").alias("nbr"),
            F.lit("n:").alias("tag"),
        )
    msg = msg.repartition("nbr").persist(StorageLevel.MEMORY_AND_DISK)
    msg.count()

    verts = msg.select(F.col("v").alias("id")).union(
        msg.select(F.col("nbr").alias("id"))
    )
    if nodes is not None:
        verts = verts.union(nodes.select("id"))
    verts = verts.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    verts.count()

    # initial label: degree signature (out, in) — undirected msg holds
    # each edge in both directions, so out==in==degree there
    outd = msg.filter(F.col("tag") != F.lit("i:")).groupBy(
        F.col("v").alias("id")
    ).agg(F.count(F.lit(1)).alias("od"))
    ind_tag = "i:" if directed else "n:"
    ind = msg.filter(F.col("tag") == F.lit(ind_tag)).groupBy(
        F.col("v").alias("id")
    ).agg(F.count(F.lit(1)).alias("idg"))

    store = (
        CheckpointStore(spark, checkpoint_dir, job_name, state_version="wl-v1")
        if checkpoint_dir
        else None
    )

    state = None  # (id, lab)
    start_iter = 0
    if store is not None:
        last = store.latest_iteration()
        if last is not None:
            state = store.load_state(last)
            if store.load_marker(last).get("final"):
                return state.select("id", F.col("lab").alias("wl_label"))
            start_iter = last + 1
    if state is None:
        state = (
            verts.join(outd, "id", "left")
            .join(ind, "id", "left")
            .select(
                "id",
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit("wl0"),
                        F.coalesce("od", F.lit(0)).cast("string"),
                        F.coalesce("idg", F.lit(0)).cast("string"),
                    )
                ).alias("lab"),
            )
            .localCheckpoint(eager=True)
        )

    LAST_RUN_ROUNDS = 0
    for it in range(start_iter, rounds):
        nbr_lab = state.select(F.col("id").alias("nbr"), F.col("lab").alias("nl"))
        agg = (
            msg.join(nbr_lab.hint("shuffle_hash"), "nbr")
            .groupBy("v")
            .agg(
                F.array_join(
                    F.array_sort(
                        F.collect_list(F.concat(F.col("tag"), F.col("nl")))
                    ),
                    ",",
                ).alias("ms")
            )
        )
        new_state = (
            state.join(
                agg.hint("shuffle_hash"), state["id"] == agg["v"], "left"
            )
            .select(
                "id",
                F.md5(
                    F.concat(
                        F.col("lab"), F.lit("|"), F.coalesce("ms", F.lit(""))
                    )
                ).alias("lab"),
            )
            .localCheckpoint(eager=True)
        )
        state.unpersist()
        state = new_state
        LAST_RUN_ROUNDS = it - start_iter + 1
        if store is not None:
            state = store.save_state(it, state)
            store.annotate(it, final=(it == rounds - 1))
        log.info("%s: round %d done", job_name, it)

    msg.unpersist(), verts.unpersist()
    return state.select("id", F.col("lab").alias("wl_label"))


def wl_signature(labels: DataFrame) -> str:
    """Graph-level fingerprint: md5 over the sorted ``label:count``
    multiset of a ``wl_refinement`` result. ONE map-side-combinable
    groupBy + a 1-row driver collect."""
    row = (
        labels.groupBy("wl_label")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.md5(
                F.array_join(
                    F.array_sort(
                        F.collect_list(
                            F.concat_ws(":", "wl_label", F.col("c"))
                        )
                    ),
                    ",",
                )
            ).alias("sig")
        )
        .collect()[0]
    )
    return row.sig
