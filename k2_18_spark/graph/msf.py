"""Minimum spanning forest via Borůvka supersteps (SURVEY.md G41).

The reference has no MSF pass, but a link-graph engine at crawl scale
needs one: the MSF of the similarity/affinity graph is the standard
backbone for single-link clustering (dedup families), bottleneck-path
queries, and visual graph skeletons — the same undirected projection
the component/Louvain passes already consume (reference
viz/graph2metrics.py builds that projection at :258-287).

Algorithm (Borůvka, the textbook distributed MSF — every GraphX/
Pregel MSF is this shape):

  each round:
    1. every component picks its MINIMUM incident cross-component
       edge under the lexicographic total order (weight, a, b)
       (groupBy min of a struct — associative, map-side combinable,
       hub-safe)
    2. picked edges join the forest; the components that picked each
       other hook into merge trees (parent = other endpoint's
       component; the only cycles are mutual 2-cycles over the SAME
       edge — a strict total order forbids longer ones — broken by
       rooting at the smaller label)
    3. merge trees flatten by pointer doubling (the components.py
       idiom) and every vertex relabels to its root

  components at least halve per round → ≤ ceil(log2 V) rounds, each
  inner flatten ≤ log2(longest hook chain) doublings of a table whose
  size is the CURRENT component count (shrinks geometrically — the
  per-round work is dominated by the two label-vector joins against
  the once-persisted canonical edge table).

Determinism / uniqueness: parallel edges fold to their pair minimum
first; the (weight, ord_a, ord_b) key is then UNIQUE per edge, and an
MSF under a strict total order is unique — so the output edge set is
engine-reproducible bit-for-bit and any SQL engine can replay the
rounds (the DuckDB oracle in __spark_entry__ unrolls them; vertex
encoding from adjacency.dense_vertex_ids is monotone in the string
id, so (w, ord_a, ord_b) order ≡ (w, a, b) order on the original ids).

Scale: endpoints are dictionary-encoded to 8-byte longs once; the
canonical pair table is persisted once and every round shuffles only
the |V| label vector plus the (geometrically shrinking) parent table.
Weights must be finite and non-NULL (negative is fine for MSF) —
validated up front with one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from k2_18_spark.graph.adjacency import dense_vertex_ids, vertex_ids

# supersteps executed by the most recent run (observability — the
# pagerank.LAST_RUN_ITERATIONS idiom)
LAST_RUN_ITERATIONS = 0


def minimum_spanning_forest(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 64,
    num_partitions: int | None = None,
    driver_flatten_max: int = 2_000_000,
) -> DataFrame:
    """→ DataFrame ``(src_id, dst_id, weight double)`` — the unique
    minimum spanning forest of the undirected projection under the
    strict total order (weight, src_id, dst_id), with
    ``src_id < dst_id`` canonical rows. Disconnected inputs yield one
    tree per component (|V| − #components rows total).

    ``driver_flatten_max``: hook-tree flatten tier switch. The parent
    table has one row per still-active component; at or below the
    threshold it collects (~16 B/row — the scc.py/louvain.py driver-
    tier contract, count checked BEFORE collecting) and flattens with
    union-find in O(n α); above it the distributed pointer-doubling
    path runs. Both tiers produce identical roots (tested).
    """
    from k2_18_spark.session import superstep_conf

    with superstep_conf(spark):
        return _msf_loop(
            spark, edges, nodes, max_iter, num_partitions, driver_flatten_max
        )


def _driver_flatten(pairs: list) -> dict:
    """Union-find flatten of hook pointers (comp → parent) whose only
    cycles are mutual 2-pairs: each group roots at the smaller label of
    its mutual pair; every chain resolves to that root."""
    par = {c: p for c, p in pairs}
    root: dict = {}
    for c in par:
        if c in root:
            continue
        path = [c]
        x = c
        while True:
            p = par[x]
            if p in root:
                r = root[p]
                break
            if par.get(p) == x:  # mutual 2-cycle → smaller label is root
                r = min(x, p)
                path.append(p)  # p is in the cycle — resolve it too
                break
            path.append(p)
            x = p
        for y in path:
            root[y] = r
    return root


def _msf_loop(spark, edges, nodes, max_iter, num_partitions, driver_flatten_max):
    global LAST_RUN_ITERATIONS
    out_schema = "src_id string, dst_id string, weight double"

    w = F.col("weight").cast("double")
    bad = edges.agg(
        F.sum((w.isNull() | F.isnan(w) | (F.abs(w) == float("inf"))).cast("long"))
    ).collect()[0][0]
    if bad:
        raise ValueError(
            f"minimum_spanning_forest: {bad} edge(s) with NULL/NaN/non-finite "
            "weight — sanitize weights first (functions/weights.py, P4)"
        )

    # canonical undirected pairs, folded to the per-pair minimum weight
    pairs = (
        edges.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
            w.alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )

    verts = dense_vertex_ids(vertex_ids(edges, nodes)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n = verts.count()
    if n == 0:
        verts.unpersist()
        return spark.createDataFrame([], out_schema)

    enc_a = verts.select(F.col("id").alias("a"), F.col("ord").alias("va"))
    enc_b = verts.select(F.col("id").alias("b"), F.col("ord").alias("vb"))
    pairs = (
        pairs.join(enc_a.hint("shuffle_hash"), "a")
        .join(enc_b.hint("shuffle_hash"), "b")
        .select("va", "vb", "w", "a", "b")
        .repartition(*([num_partitions, "va"] if num_partitions else ["va"]))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pairs.count()  # eager — supersteps must not pay the build

    # component label per vertex (starts as itself)
    comp = verts.select(F.col("ord").alias("v"), F.col("ord").alias("c"))
    comp = comp.localCheckpoint(eager=True)

    forest_parts: list[DataFrame] = []
    LAST_RUN_ITERATIONS = 0
    for it in range(max_iter):
        lab_a = comp.select(F.col("v").alias("va"), F.col("c").alias("ca"))
        lab_b = comp.select(F.col("v").alias("vb"), F.col("c").alias("cb"))
        cross = (
            pairs.join(lab_a.hint("shuffle_hash"), "va")
            .join(lab_b.hint("shuffle_hash"), "vb")
            .filter(F.col("ca") != F.col("cb"))
        )
        # each endpoint component bids its lexicographic-min edge; the
        # struct min is associative → map-side combinable under hubs.
        # (w, ka, kb) already identifies the edge uniquely; the string
        # endpoints ride along for the output and never drive the min.
        key = F.struct(
            F.col("w").alias("w"),
            F.col("va").alias("ka"),
            F.col("vb").alias("kb"),
            F.col("a").alias("a"),
            F.col("b").alias("b"),
        )
        bids = cross.select(
            F.col("ca").alias("comp"), key.alias("k"), F.col("cb").alias("other")
        ).union(
            cross.select(
                F.col("cb").alias("comp"), key.alias("k"), F.col("ca").alias("other")
            )
        )
        # lazy checkpoint materialized by the count in the SAME job —
        # one scheduling round, the pagerank.py idiom
        cand = (
            bids.groupBy("comp")
            .agg(F.min(F.struct(F.col("k"), F.col("other"))).alias("m"))
            .select(
                "comp",
                F.col("m.k.a").alias("a"),
                F.col("m.k.b").alias("b"),
                F.col("m.k.w").alias("w"),
                F.col("m.other").alias("parent"),
            )
            .localCheckpoint(eager=False)
        )
        n_active = cand.count()
        LAST_RUN_ITERATIONS = it + 1
        if n_active == 0:  # no cross-component edge anywhere — done
            cand.unpersist()
            break
        picked = cand.select("a", "b", "w").distinct().localCheckpoint(eager=True)
        forest_parts.append(picked)

        # hook: parent[comp] = other-endpoint component of its min edge.
        # Mutual 2-cycles (both picked the same edge) root at the
        # smaller label; longer cycles cannot exist under a strict
        # total order. Flatten tier by the row count just measured.
        if n_active <= driver_flatten_max:
            root = _driver_flatten(
                [(r["comp"], r["parent"]) for r in cand.select("comp", "parent").collect()]
            )
            relabel = spark.createDataFrame(
                list(root.items()), "c long, root long"
            )
        else:
            par0 = cand.select("comp", "parent")
            grand = par0.select(
                F.col("comp").alias("parent"), F.col("parent").alias("gp")
            )
            par = (
                par0.join(grand.hint("shuffle_hash"), "parent", "left")
                .select(
                    "comp",
                    F.when(
                        (F.col("gp") == F.col("comp"))
                        & (F.col("comp") < F.col("parent")),
                        F.col("comp"),
                    )
                    .otherwise(F.col("parent"))
                    .alias("parent"),
                )
                .localCheckpoint(eager=False)
            )
            # pointer doubling until the parent table is a star (one
            # fused job per doubling; the table has one row per active
            # component — shrinks geometrically)
            while True:
                jump = par.select(
                    F.col("comp").alias("parent"), F.col("parent").alias("pp")
                )
                doubled = (
                    par.join(jump.hint("shuffle_hash"), "parent", "left")
                    .select(
                        "comp", F.coalesce("pp", "parent").alias("parent"),
                        (
                            F.col("pp").isNotNull()
                            & (F.col("pp") != F.col("parent"))
                        ).alias("moved"),
                    )
                    .localCheckpoint(eager=False)
                )
                moved = doubled.agg(
                    F.sum(F.col("moved").cast("long"))
                ).collect()[0][0]
                par.unpersist()
                par = doubled  # the checkpointed frame (moved col rides along)
                if not moved:
                    break
            relabel = par.select(
                F.col("comp").alias("c"), F.col("parent").alias("root")
            )
        cand.unpersist()

        prev_comp = comp
        comp = (
            comp.join(relabel.hint("shuffle_hash"), "c", "left")
            .select("v", F.coalesce("root", "c").alias("c"))
            .localCheckpoint(eager=True)
        )
        prev_comp.unpersist()
    else:
        raise RuntimeError(f"msf did not converge in {max_iter} rounds")

    if not forest_parts:
        out = spark.createDataFrame([], out_schema)
    else:
        acc = forest_parts[0]
        for p in forest_parts[1:]:
            acc = acc.union(p)
        out = acc.select(
            F.col("a").alias("src_id"), F.col("b").alias("dst_id"), "w"
        ).select("src_id", "dst_id", F.col("w").alias("weight"))
        out = out.localCheckpoint(eager=True)
    verts.unpersist()
    pairs.unpersist()
    return out
