"""Weakly connected components as a DataFrame superstep loop (SURVEY.md G3).

Semantics (reference viz/graph2metrics.py:258-287):
- components of the undirected projection
- deterministic renumbering: components sorted by the minimum original
  node position (``node_order``) of any member → sequential IDs 0..k-1.
  Exact match vs the reference is required (north_rule).

Algorithm: iterative min-label propagation ("hash-to-min" small-star
variant). Every vertex starts with label = its own order-stable key;
each superstep every vertex takes the min label over itself and its
neighbors (over symmetrized edges); converges in O(diameter) rounds —
large-diameter graphs still terminate because labels strictly decrease.
Labels are (min node_order of the member seen so far), so the final
label IS the renumbering key: `dense_rank` over distinct labels gives
the reference's sequential component IDs directly.

Scale: the symmetrized edge table is built and persisted once,
partitioned by src; each superstep shuffles only the label vector
(groupBy min has map-side partial aggregation, so hub vertices don't
skew the reduce). Each superstep checkpoints labels + lineage and can
resume (same CheckpointStore contract as PageRank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from k2_18_spark.checkpoint import CheckpointStore
from k2_18_spark.graph.adjacency import vertex_ids


# supersteps executed by the most recent connected_components run
# (observability for warm-start tests/bench, pagerank.LAST_RUN_ITERATIONS idiom)
LAST_RUN_ITERATIONS = 0


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    checkpoint_dir: str | None = None,
    job_name: str = "components",
    max_iter: int = 200,
    num_partitions: int | None = None,
    init_labels: DataFrame | None = None,
) -> DataFrame:
    """→ DataFrame (id, component_id) with reference-exact numbering.

    ``nodes`` should carry ``node_order`` (original file position) for
    reference-exact renumbering; without it, ordering falls back to the
    lexicographic id (documented divergence: the reference renumbers by
    min *file position* — viz/graph2metrics.py:277-279).

    ``init_labels``: a previous run's (id, component_id) output warm-
    starts the min-label iteration after an edge delta — valid for
    edge/vertex ADDITIONS only (old components are then subsets of new
    ones, and min-of-mins = the true min, so the fixpoint is identical;
    removals can split components, which a monotone-decreasing label
    can never express — run cold after removals). New vertices absent
    from ``init_labels`` start at their own label. The daily-crawl
    companion of ``pagerank(init_ranks=...)``; an unchanged graph
    re-converges in 1 superstep (the zero-change probe).
    """
    from k2_18_spark.session import superstep_conf

    with superstep_conf(spark):
        return _components_loop(
            spark, edges, nodes, checkpoint_dir, job_name, max_iter,
            num_partitions, init_labels,
        )


def _components_loop(
    spark, edges, nodes, checkpoint_dir, job_name, max_iter, num_partitions,
    init_labels=None,
) -> DataFrame:
    global LAST_RUN_ITERATIONS
    from k2_18_spark.graph.adjacency import dense_vertex_ids

    if nodes is not None and "node_order" in nodes.columns:
        verts = nodes.select("id", F.col("node_order").alias("ord"))
    else:
        # deterministic dense order ids WITHOUT a single-task global sort
        verts = dense_vertex_ids(vertex_ids(edges, nodes))
    verts = verts.persist(StorageLevel.MEMORY_AND_DISK)
    n = verts.count()
    if n == 0:
        return spark.createDataFrame([], "id string, component_id int")

    # Symmetrized edge list keyed by vertex (U3) — built & persisted once,
    # with endpoints dictionary-ENCODED to the (long) order ids so every
    # superstep shuffles 8-byte keys, never the string ids. Dedup happens
    # on CANONICAL |E| pairs before mirroring (half the distinct input of
    # the naive symmetrize-then-distinct). Partitioned by b — the
    # per-superstep join key — so only the label vector shuffles each
    # round, never the edge table.
    enc_a = verts.select(F.col("id").alias("a"), F.col("ord").alias("_va"))
    enc_b = verts.select(F.col("id").alias("b"), F.col("ord").alias("_vb"))
    pairs = (
        edges.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .join(enc_a.hint("shuffle_hash"), "a")
        .join(enc_b.hint("shuffle_hash"), "b")
        .select(F.col("_va").alias("a"), F.col("_vb").alias("b"))
    )
    sym = (
        pairs.union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .repartition(*( [num_partitions, "b"] if num_partitions else ["b"] ))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sym.count()  # eager — supersteps must not pay the build

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
            # state is stored ENCODED (id = order long); the encoding is
            # deterministic, so a fresh run resumes against the same ids
            state = store.load_state(last)
            labels = state.select("id", "label")
            if store.load_marker(last).get("converged"):
                return _renumber(labels, verts)
            start_iter = last + 1
    if labels is None and init_labels is not None:
        # encode the previous assignment: every old component collapses
        # to the min ORDER ID of its members under the new vertex set
        prev = init_labels.select("id", F.col("component_id").alias("comp"))
        tagged = verts.join(prev.hint("shuffle_hash"), "id", "left")
        comp_min = (
            tagged.filter(F.col("comp").isNotNull())
            .groupBy("comp")
            .agg(F.min("ord").alias("lab0"))
        )
        labels = (
            tagged.join(comp_min.hint("shuffle_hash"), "comp", "left")
            .select(
                F.col("ord").alias("id"),
                F.coalesce("lab0", "ord").alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    if labels is None:
        labels = verts.select(
            F.col("ord").alias("id"), F.col("ord").alias("label")
        ).localCheckpoint(eager=True)

    LAST_RUN_ITERATIONS = 0
    for it in range(start_iter, max_iter):
        # shuffle_hash: hash the |V|-sized label vector, stream the
        # persisted symmetrized edges (no per-round sort of |2E| rows)
        neighbor_min = (
            sym.join(
                labels.select(F.col("id").alias("b"), "label").hint("shuffle_hash"),
                "b",
            )
            .select("a", "label")
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.withColumnRenamed("label", "old_label")
            .join(neighbor_min.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.least(
                    F.col("old_label"), F.coalesce(F.col("nbr_label"), F.col("old_label"))
                ).alias("label"),
                F.col("old_label"),
            )
        )
        prev_state = labels
        if store is not None:
            new_labels = store.save_state(it, new_labels, rows_in=n)
        else:
            # lazy: the changed-count aggregate materializes the checkpoint
            # in the SAME job — one scheduling round per superstep, not two
            new_labels = new_labels.localCheckpoint(eager=False)
        changed = (
            new_labels.agg(
                F.sum((F.col("label") != F.col("old_label")).cast("long"))
            ).collect()[0][0]
            or 0
        )
        labels = new_labels.select("id", "label")
        prev_state.unpersist()  # release the prior superstep's blocks
        LAST_RUN_ITERATIONS = it - start_iter + 1
        if changed == 0:
            if store is not None:
                store.annotate(it, converged=True)
            break
    else:
        raise RuntimeError(f"components did not converge in {max_iter} supersteps")

    out = _renumber(labels, verts)
    verts.unpersist()
    sym.unpersist()
    return out


def connected_components_star(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 60,
    num_partitions: int | None = None,
) -> DataFrame:
    """O(log n)-round connected components via alternating large-star /
    small-star (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SOCC'14) — the HIGH-DIAMETER alternative to the min-label
    loop: min-label converges in O(diameter) label-vector rounds (ideal
    for web-ish graphs), while star rounds rewrite the |E|-sized edge
    set but need only O(log n) of them, so a 10^6-long chain finishes
    in ~20 rounds instead of 10^6.

    Same contract as connected_components: → (id, component_id),
    reference-exact numbering (component label = min member order id,
    dense-ranked). Vertices are dictionary-encoded like every other
    superstep loop.

    Per round: one groupBy-min over the oriented edge set + one join —
    map-side partial aggregation keeps hub groups partition-bounded.
    Star rounds converge when small-star changes nothing (checked with
    an exact anti-join, not a probabilistic hash).
    """
    from k2_18_spark.session import superstep_conf

    with superstep_conf(spark):
        return _components_star_loop(spark, edges, nodes, max_iter, num_partitions)


def _components_star_loop(spark, edges, nodes, max_iter, num_partitions):
    from k2_18_spark.graph.adjacency import dense_vertex_ids

    if nodes is not None and "node_order" in nodes.columns:
        verts = nodes.select("id", F.col("node_order").alias("ord"))
    else:
        verts = dense_vertex_ids(vertex_ids(edges, nodes))
    verts = verts.persist(StorageLevel.MEMORY_AND_DISK)
    n = verts.count()
    if n == 0:
        return spark.createDataFrame([], "id string, component_id int")

    enc_a = verts.select(F.col("id").alias("a"), F.col("ord").alias("_va"))
    enc_b = verts.select(F.col("id").alias("b"), F.col("ord").alias("_vb"))
    # oriented unique pairs (u > v): u points at a smaller vertex
    e = (
        edges.select(
            F.least("src_id", "dst_id").alias("b"),
            F.greatest("src_id", "dst_id").alias("a"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .join(enc_a.hint("shuffle_hash"), "a")
        .join(enc_b.hint("shuffle_hash"), "b")
        .select(F.col("_va").alias("u"), F.col("_vb").alias("v"))  # u > v
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # large-star: every strictly-larger neighbor of u links to
        # m = min(Γ(u) ∪ {u}). Neighbors of u = both orientations.
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m_all = sym.groupBy("u").agg(F.least(F.min("v"), F.min("u")).alias("m"))
        e = (
            sym.filter(F.col("v") > F.col("u"))
            .join(m_all.hint("shuffle_hash"), "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
            # lazy: the small-star checkpoint job below materializes this
            # in the same scheduling round
            .localCheckpoint(eager=False)
        )
        # small-star: on the (u > v) orientation, all small neighbors
        # and u itself link to m = min of the small neighborhood.
        m_small = e.groupBy("u").agg(F.least(F.min("v"), F.min("u")).alias("m"))
        new_e = (
            e.join(m_small.hint("shuffle_hash"), "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(m_small.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        e = new_e
        # converged ⇔ star forest: no edge's target has an outgoing
        # edge (two-hop chain). A star forest's centers are necessarily
        # the component minima — a non-minimal center would have an
        # outgoing edge (orientation is always larger→smaller).
        chains = e.join(
            e.select(F.col("u").alias("v")).distinct(), "v", "left_semi"
        )
        if chains.isEmpty():
            break
    else:
        raise RuntimeError(f"star components did not converge in {max_iter} rounds")

    # stars: every non-root points at its component min; roots implicit
    labels = (
        verts.select(F.col("ord").alias("id"))
        .join(e.select(F.col("u").alias("id"), F.col("v").alias("lbl")), "id", "left")
        .select("id", F.coalesce("lbl", F.col("id")).alias("label"))
    )
    out = _renumber(labels, verts)
    verts.unpersist()
    return out


def _renumber(labels: DataFrame, verts: DataFrame) -> DataFrame:
    """Sequential component IDs by ascending min-order label (T6), and
    decode the encoded vertex keys back to the original string ids.

    The label already equals the min original position of the
    component, so ranking the DISTINCT labels reproduces the reference
    numbering (viz/graph2metrics.py:279-285). The global sort runs over
    #components rows (small), never over |V| — the broadcast join maps
    vertices to their component id without a second global sort."""
    distinct = labels.select("label").distinct()
    ranked = distinct.select(
        "label",
        (F.row_number().over(Window.orderBy("label")) - 1)
        .cast("int")
        .alias("component_id"),
    )
    dec = verts.select(F.col("ord").alias("id"), F.col("id").alias("orig_id"))
    return (
        labels.join(F.broadcast(ranked), "label")
        .join(dec, "id")
        .select(F.col("orig_id").alias("id"), "component_id")
    )
