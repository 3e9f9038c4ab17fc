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

import logging
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from k2_18_spark.graph.adjacency import dense_vertex_ids, vertex_ids

log = logging.getLogger(__name__)

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
    driver_kruskal_max: int = 1_000_000,
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
            spark, edges, nodes, max_iter, num_partitions,
            driver_flatten_max, driver_kruskal_max,
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


def _driver_kruskal(pdf) -> list:
    """Kruskal over the collected contracted live edge set
    (ca, cb, w, ka, kb) under the strict (w, ka, kb) total order —
    the driver finish tier: once the contracted graph is small the
    fixed ~3-job-per-round superstep floor dwarfs the work, and the
    MSF of the contracted graph equals the remaining forest edges
    (uniqueness under the strict order). Returns [(ka, kb, w), ...]."""
    order = sorted(
        zip(
            pdf["w"].tolist(), pdf["ka"].tolist(), pdf["kb"].tolist(),
            pdf["ca"].tolist(), pdf["cb"].tolist(),
        )
    )
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    picked = []
    for w, ka, kb, ca, cb in order:
        ra, rb = find(ca), find(cb)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            picked.append((ka, kb, w))
    return picked


def _msf_loop(spark, edges, nodes, max_iter, num_partitions,
              driver_flatten_max, driver_kruskal_max):
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

    # r6 rework (guide §2.4): Borůvka WITH EDGE CONTRACTION. The r5
    # loop kept the full |E| pair table fixed and re-attached the |V|
    # component-label vector to BOTH endpoints every round (two joins,
    # one forcing a fresh |E|-row exchange on vb per round, string
    # endpoints riding every shuffle). But (a) the per-vertex label
    # vector is never part of the output — only the forest edges are —
    # and (b) an edge that goes intra-component can never go cross
    # again, so the live edge set can be RELABELED AND FILTERED in
    # place each round: endpoints become component ids, the relabel map
    # has one row per still-active component (geometrically shrinking,
    # broadcast below the same driver-tier threshold), and round 1
    # needs no label join at all (labels start as the identity).
    # Strings leave the loop entirely: the min key is (w, ka, kb) on
    # the dense encoding — monotone in the string ids — and the ≤|V|-1
    # forest rows decode once at the end. Identical trajectory, same
    # unique MSF.
    enc_a = verts.select(F.col("id").alias("a"), F.col("ord").alias("va"))
    enc_b = verts.select(F.col("id").alias("b"), F.col("ord").alias("vb"))
    live = (
        pairs.join(enc_a.hint("shuffle_hash"), "a")
        .join(enc_b.hint("shuffle_hash"), "b")
        .select(
            F.col("va").alias("ca"),
            F.col("vb").alias("cb"),
            "w",
            F.col("va").alias("ka"),
            F.col("vb").alias("kb"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # (no repartition: nothing in the loop relies on a specific edge
    # partitioning — the bids groupBy does its own exchange and the
    # old probe-join layout is gone, so the extra full |E| exchange
    # the r5 build paid bought nothing)
    live_rows = live.count()  # eager — supersteps must not pay the build

    forest_parts: list[DataFrame] = []
    cands: list[DataFrame] = []
    LAST_RUN_ITERATIONS = 0
    for it in range(max_iter):
        _t0 = time.time()
        if live_rows == 0:
            break
        if live_rows <= driver_kruskal_max:
            # driver finish tier (count-guarded, ≤40 B/row): Kruskal
            # over the contracted remainder — identical edges (unique
            # MSF), none of the ~3-job-per-round superstep floor
            picked = _driver_kruskal(live.toPandas())
            if picked:
                import pandas as pd

                forest_parts.append(
                    spark.createDataFrame(
                        pd.DataFrame(
                            picked, columns=["ka", "kb", "w"]
                        ),
                        "ka long, kb long, w double",
                    )
                )
            LAST_RUN_ITERATIONS = it + 1
            log.info(
                "msf round=%d driver-kruskal rows=%d wall=%.1fs",
                it, live_rows, time.time() - _t0,
            )
            break
        # each endpoint component bids its lexicographic-min edge; the
        # struct min is associative → map-side combinable under hubs.
        # (w, ka, kb) identifies the edge uniquely.
        key = F.struct(
            F.col("w").alias("w"),
            F.col("ka").alias("ka"),
            F.col("kb").alias("kb"),
        )
        bids = live.select(
            F.col("ca").alias("comp"), key.alias("k"), F.col("cb").alias("other")
        ).union(
            live.select(
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
                F.col("m.k.ka").alias("ka"),
                F.col("m.k.kb").alias("kb"),
                F.col("m.k.w").alias("w"),
                F.col("m.other").alias("parent"),
            )
            .localCheckpoint(eager=False)
        )
        n_active = cand.count()
        _t1 = time.time()
        LAST_RUN_ITERATIONS = it + 1
        if n_active == 0:  # no cross-component edge anywhere — done
            cand.unpersist()
            break
        # the checkpointed cand stays alive until the final union, so
        # the picked edges need no extra eager materialization per round
        cands.append(cand)
        forest_parts.append(cand.select("ka", "kb", "w").distinct())

        # hook: parent[comp] = other-endpoint component of its min edge.
        # Mutual 2-cycles (both picked the same edge) root at the
        # smaller label; longer cycles cannot exist under a strict
        # total order. Flatten tier by the row count just measured.
        if n_active <= driver_flatten_max:
            # Arrow both ways (r6): row-collect + pickled createDataFrame
            # measured ~seconds per round at 10^5 components; the same
            # 16 B/row through Arrow is milliseconds
            pdf = cand.select("comp", "parent").toPandas()
            root = _driver_flatten(
                list(zip(pdf["comp"].tolist(), pdf["parent"].tolist()))
            )
            import pandas as pd

            relabel = spark.createDataFrame(
                pd.DataFrame(
                    {"c": list(root.keys()), "root": list(root.values())}
                ),
                "c long, root long",
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

        # contract: relabel both endpoints of the live edge set to the
        # round's roots and drop the now-intra-component rows. Every
        # bidding component is in `relabel` (n_active rows); broadcast
        # below the driver tier keeps the live table's partitioning,
        # above it the shuffle-hash join runs on the shrinking tables.
        if n_active <= driver_flatten_max:
            ra = F.broadcast(relabel)
            rb = F.broadcast(relabel)
        else:
            ra = relabel.hint("shuffle_hash")
            rb = relabel.hint("shuffle_hash")
        # relabel, drop intra-component rows, then COLLAPSE parallel
        # component pairs to their (w, ka, kb)-min edge — any future
        # merge's min edge between two component groups is the min over
        # per-pair minima, so dropping dominated parallels preserves
        # every later bid; this is what makes `live` (not just the
        # component count) shrink geometrically, so the driver-Kruskal
        # finish tier actually engages.
        relabeled = (
            live.join(ra.withColumnRenamed("c", "ca"), "ca", "left")
            .withColumnRenamed("root", "ra")
            .join(rb.withColumnRenamed("c", "cb"), "cb", "left")
            .select(
                F.coalesce("ra", "ca").alias("ca"),
                F.coalesce("root", "cb").alias("cb"),
                "w",
                "ka",
                "kb",
            )
            .filter(F.col("ca") != F.col("cb"))
        )
        new_live = (
            relabeled.select(
                F.least("ca", "cb").alias("ca"),
                F.greatest("ca", "cb").alias("cb"),
                F.struct("w", "ka", "kb").alias("k"),
            )
            .groupBy("ca", "cb")
            .agg(F.min("k").alias("k"))
            .select(
                "ca", "cb",
                F.col("k.w").alias("w"),
                F.col("k.ka").alias("ka"),
                F.col("k.kb").alias("kb"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        live_rows = new_live.count()
        live.unpersist()
        live = new_live
        log.info(
            "msf round=%d n_active=%d live_rows=%d bids=%.1fs "
            "relabel+contract=%.1fs",
            it, n_active, live_rows, _t1 - _t0, time.time() - _t1,
        )
    else:
        raise RuntimeError(f"msf did not converge in {max_iter} rounds")

    if not forest_parts:
        out = spark.createDataFrame([], out_schema)
    else:
        acc = forest_parts[0]
        for p in forest_parts[1:]:
            acc = acc.union(p)
        # decode the ≤|V|−1 forest rows back to string endpoints once —
        # the only place strings appear after the build
        dec_a = verts.select(F.col("ord").alias("ka"), F.col("id").alias("src_id"))
        dec_b = verts.select(F.col("ord").alias("kb"), F.col("id").alias("dst_id"))
        out = (
            acc.join(dec_a.hint("shuffle_hash"), "ka")
            .join(dec_b.hint("shuffle_hash"), "kb")
            .select("src_id", "dst_id", F.col("w").alias("weight"))
        )
        out = out.localCheckpoint(eager=True)
    for c in cands:
        c.unpersist()
    verts.unpersist()
    live.unpersist()
    return out
