"""SCC condensation + prerequisite depth / learning effort (SURVEY.md G5).

Reference semantics (viz/graph2metrics.py:290-384):
- subgraph of PREREQUISITE edges over ALL nodes, node difficulty
  defaulting to 3 (viz/config.toml:25)
- strongly connected components → condensed DAG
- topological DP: depth[c] = max(depth[pred]) + 1 (0 at sources);
  effort[c] = max(effort[pred]) + Σ difficulty(members of c)
- every member of an SCC shares its depth/effort
- empty prereq graph → depth 0, effort = own difficulty

Distributed realization:
1. *Trim peeling*: iteratively remove vertices with zero in-degree or
   zero out-degree in the remaining subgraph — each removed vertex is a
   singleton SCC. Prerequisite graphs are near-DAGs, so this resolves
   almost everything in O(longest chain) cheap supersteps.
2. The residual cyclic core (deliberate PREREQUISITE cycles are rare
   and small) is collected and solved with driver-side Tarjan, then
   broadcast back. A guard raises if the core exceeds
   ``max_core_vertices`` — at true web scale you'd switch to the
   FW-BW-coloring superstep algorithm; the hybrid keeps the hot path
   all-DataFrame while staying exact.
3. Condensation + level-synchronous longest-path DP as superstep
   joins: each round assigns every SCC whose predecessors are all
   assigned (rounds = condensation depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from k2_18_spark.graph.adjacency import metrics_view

DEFAULT_DIFFICULTY = 3


def _tarjan(vertices: list, adj: dict) -> dict:
    """Iterative Tarjan SCC for the residual cyclic core. → v: root."""
    index_of: dict = {}
    low: dict = {}
    on_stack: set = set()
    stack: list = []
    result: dict = {}
    counter = [0]

    for start in vertices:
        if start in index_of:
            continue
        work = [(start, iter(adj.get(start, ())))]
        index_of[start] = low[start] = counter[0]
        counter[0] += 1
        stack.append(start)
        on_stack.add(start)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index_of:
                    index_of[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj.get(w, ()))))
                    advanced = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index_of[w])
            if not advanced:
                work.pop()
                if work:
                    parent = work[-1][0]
                    low[parent] = min(low[parent], low[v])
                if low[v] == index_of[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on_stack.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    root = min(comp)
                    for w in comp:
                        result[w] = root
    return result


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_core_vertices: int = 2_000_000,
    method: str = "auto",
) -> DataFrame:
    """→ (id, scc_id) where scc_id = min member id of the SCC.

    ``edges`` is the (already filtered) subgraph to decompose.

    ``method``: "auto" runs driver Tarjan on cyclic cores up to
    ``max_core_vertices`` and switches to the distributed
    forward-backward decomposition (_fwbw_scc) above it; "tarjan" /
    "fwbw" force a path ("tarjan" raises over the limit).
    """
    from k2_18_spark.graph.adjacency import vertex_ids

    verts = vertex_ids(edges, nodes).persist(StorageLevel.MEMORY_AND_DISK)
    e = (
        metrics_view(edges)
        .select("src_id", "dst_id")
        .filter(F.col("src_id") != F.col("dst_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # 1. trim peeling: vertices outside any cycle are singleton SCCs
    remaining_v = verts.select("id").localCheckpoint(eager=True)
    remaining_e = e.localCheckpoint(eager=True)
    while True:
        srcs = remaining_e.select(F.col("src_id").alias("id")).distinct()
        dsts = remaining_e.select(F.col("dst_id").alias("id")).distinct()
        core = srcs.join(dsts, "id", "inner")  # has both in- and out-edges
        new_e = remaining_e.join(
            core.withColumnRenamed("id", "src_id"), "src_id", "left_semi"
        ).join(core.withColumnRenamed("id", "dst_id"), "dst_id", "left_semi")
        new_e = new_e.localCheckpoint(eager=True)
        before = remaining_e.count()
        after = new_e.count()
        remaining_e = new_e
        if after == before:
            break
        if after == 0:
            break

    # 2. residual cyclic core → driver Tarjan
    if remaining_e.isEmpty():
        scc = verts.select("id", F.col("id").alias("scc_id"))
        return scc

    # guard BEFORE the collect — a huge cyclic core must never OOM the
    # driver; above the limit "auto" switches to the distributed path
    n_core = (
        remaining_e.select(F.col("src_id").alias("id"))
        .union(remaining_e.select(F.col("dst_id").alias("id")))
        .distinct()
        .count()
    )
    if method == "fwbw" or (method == "auto" and n_core > max_core_vertices):
        core_df = _fwbw_scc(spark, remaining_e)
    else:
        if n_core > max_core_vertices:
            raise RuntimeError(
                f"cyclic core too large for driver Tarjan ({n_core} vertices)"
            )
        core_edges = remaining_e.collect()
        core_vertices = {r["src_id"] for r in core_edges} | {
            r["dst_id"] for r in core_edges
        }
        adj: dict = {}
        for r in core_edges:
            adj.setdefault(r["src_id"], []).append(r["dst_id"])
        core_map = _tarjan(sorted(core_vertices), adj)
        core_df = spark.createDataFrame(
            list(core_map.items()), "id string, scc_id string"
        )
    scc = (
        verts.join(core_df, "id", "left")
        .select("id", F.coalesce("scc_id", F.col("id")).alias("scc_id"))
    )
    return scc


def _fwbw_scc(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 64,
    max_bfs_supersteps: int = 512,
) -> DataFrame:
    """Distributed forward-backward SCC decomposition of a cyclic core
    (Fleischer/Hendrickson/Pinar FW-BW, multi-pivot variant): per
    round, every active partition picks its min vertex as pivot,
    forward- and backward-BFS run for ALL partitions simultaneously
    (partition-confined frontiers), FW ∩ BW is the pivot's SCC, and the
    leftovers split into FW-only / BW-only / untouched sub-partitions.
    Wholly DataFrame-side — the web-scale path when the trimmed cyclic
    core exceeds the driver-Tarjan budget.

    The pivot is the partition MINIMUM and belongs to its SCC, so the
    emitted scc_id = min member id, matching the Tarjan path exactly.
    → (id, scc_id), core vertices only."""
    from k2_18_spark.graph.adjacency import dense_vertex_ids, vertex_ids

    vmap = dense_vertex_ids(vertex_ids(edges, None))  # (id, ord)
    es = (
        edges.join(
            vmap.select(F.col("id").alias("src_id"), F.col("ord").alias("s")),
            "src_id",
        )
        .join(
            vmap.select(F.col("id").alias("dst_id"), F.col("ord").alias("d")),
            "dst_id",
        )
        .select("s", "d")
        .localCheckpoint(eager=True)
    )
    parts = vmap.select(
        F.col("ord").alias("id"), F.lit(0).cast("long").alias("part")
    ).localCheckpoint(eager=True)
    settled = None

    def bfs(src: str, dst: str) -> DataFrame:
        """Multi-source partition-confined reachability from the pivots
        along (src→dst) edges. → (part, id) reached set."""
        reached = pivots.select("part", F.col("pivot").alias("id")).localCheckpoint(
            eager=True
        )
        frontier = reached
        for _ in range(max_bfs_supersteps):
            nxt = (
                frontier.join(
                    es.withColumnRenamed(src, "id").hint("shuffle_hash"), "id"
                )
                .select("part", F.col(dst).alias("id"))
                .join(
                    parts.withColumnRenamed("part", "_p").hint("shuffle_hash"),
                    "id",
                )
                .filter(F.col("part") == F.col("_p"))
                .select("part", "id")
                .distinct()
                .join(reached, ["part", "id"], "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            reached = reached.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        else:
            raise RuntimeError("FW-BW BFS exceeded max_bfs_supersteps")
        return reached

    for _ in range(max_rounds):
        if parts.isEmpty():
            break
        pivots = parts.groupBy("part").agg(F.min("id").alias("pivot"))
        fw = bfs("s", "d")
        bw = bfs("d", "s")
        scc_rows = (
            fw.join(bw, ["part", "id"])
            .join(pivots, "part")
            .select("id", F.col("pivot").alias("scc"))
            .localCheckpoint(eager=True)
        )
        settled = (
            scc_rows
            if settled is None
            else settled.unionByName(scc_rows).localCheckpoint(eager=True)
        )
        remaining = parts.join(scc_rows.select("id"), "id", "left_anti")
        # FW-only → sub-part 0, BW-only → 1, untouched → 2 (disjoint:
        # FW ∩ BW vertices just settled)
        branched = (
            remaining.join(fw.withColumn("_f", F.lit(1)), ["part", "id"], "left")
            .join(bw.withColumn("_b", F.lit(1)), ["part", "id"], "left")
            .select(
                "id",
                "part",
                F.when(F.col("_f") == 1, 0)
                .when(F.col("_b") == 1, 1)
                .otherwise(2)
                .alias("branch"),
            )
        )
        # re-densify partition ids each round: a part*3+branch encoding
        # grows 3^round and overflows BIGINT past ~40 rounds (ANSI
        # ArithmeticException, or silent collisions with ANSI off).
        # The distinct (part, branch) set is ≤ 3·|active parts| — tiny —
        # so a single-partition row_number + broadcast-back is cheap.
        pair_ids = (
            branched.select("part", "branch")
            .distinct()
            .coalesce(1)
            .select(
                "part",
                "branch",
                (F.row_number().over(Window.orderBy("part", "branch")) - 1)
                .cast("long")
                .alias("_newpart"),
            )
        )
        parts = (
            branched.join(F.broadcast(pair_ids), ["part", "branch"])
            .select("id", F.col("_newpart").alias("part"))
            .localCheckpoint(eager=True)
        )
        # prune settled vertices' edges so later BFS rounds shrink
        es = (
            es.join(parts.select(F.col("id").alias("s")), "s", "left_semi")
            .join(parts.select(F.col("id").alias("d")), "d", "left_semi")
            .localCheckpoint(eager=True)
        )
    else:
        if not parts.isEmpty():
            raise RuntimeError(f"FW-BW did not settle in {max_rounds} rounds")

    dec = vmap.select(F.col("ord").alias("id"), F.col("id").alias("_orig"))
    return (
        settled.join(dec, "id")
        .join(
            vmap.select(F.col("ord").alias("scc"), F.col("id").alias("scc_id")),
            "scc",
        )
        .select(F.col("_orig").alias("id"), "scc_id")
    )


def prerequisite_metrics(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame,
    default_difficulty: int = DEFAULT_DIFFICULTY,
    max_iter: int = 10_000,
) -> DataFrame:
    """→ (id, prerequisite_depth, learning_effort)."""
    # collapse parallel typed edges FIRST, then filter the survivors by
    # type — the reference builds the nx.DiGraph (last-writer-wins per
    # (src,dst), viz/graph2metrics.py:163-170) before taking the
    # PREREQUISITE subgraph, so a PREREQUISITE edge shadowed by a later
    # edge of another type must NOT appear here
    prereq = metrics_view(edges).filter(
        F.upper(F.col("edge_type")) == "PREREQUISITE"
    )
    diff_col = (
        F.coalesce(F.col("difficulty"), F.lit(default_difficulty))
        if "difficulty" in nodes.columns
        else F.lit(default_difficulty)
    )
    diff = nodes.select("id", diff_col.cast("double").alias("difficulty"))

    if prereq.isEmpty():
        return diff.select(
            "id",
            F.lit(0).alias("prerequisite_depth"),
            F.col("difficulty").alias("learning_effort"),
        )

    scc = strongly_connected_components(spark, prereq, nodes=nodes)
    scc = scc.persist(StorageLevel.MEMORY_AND_DISK)

    # per-SCC difficulty sum
    scc_diff = (
        diff.join(scc, "id")
        .groupBy("scc_id")
        .agg(F.sum("difficulty").alias("scc_difficulty"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # condensation edges (self-loops collapse away, metrics view first)
    pe = metrics_view(prereq).select("src_id", "dst_id")
    cond = (
        pe.join(scc.select(F.col("id").alias("src_id"), F.col("scc_id").alias("cs")), "src_id")
        .join(scc.select(F.col("id").alias("dst_id"), F.col("scc_id").alias("cd")), "dst_id")
        .select("cs", "cd")
        .filter(F.col("cs") != F.col("cd"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # 3. level-synchronous longest-path DP over the condensation
    assigned = (
        scc_diff.join(
            cond.select(F.col("cd").alias("scc_id")).distinct(), "scc_id", "left_anti"
        )
        .select(
            "scc_id",
            F.lit(0).alias("depth"),
            F.col("scc_difficulty").alias("effort"),
        )
        .localCheckpoint(eager=True)
    )
    total = scc_diff.count()
    done = assigned.count()
    it = 0
    while done < total and it < max_iter:
        it += 1
        # SCCs whose every predecessor is assigned
        pred_status = cond.join(
            assigned.select(F.col("scc_id").alias("cs"), "depth", "effort"),
            "cs",
            "left",
        )
        ready = (
            pred_status.groupBy(F.col("cd").alias("scc_id"))
            .agg(
                F.count(F.lit(1)).alias("n_pred"),
                F.count("depth").alias("n_done"),
                F.max("depth").alias("max_depth"),
                F.max("effort").alias("max_effort"),
            )
            .filter(F.col("n_pred") == F.col("n_done"))
            .join(assigned.select("scc_id"), "scc_id", "left_anti")
            .join(scc_diff, "scc_id")
            .select(
                "scc_id",
                (F.col("max_depth") + 1).alias("depth"),
                (F.col("max_effort") + F.col("scc_difficulty")).alias("effort"),
            )
        )
        assigned = assigned.unionByName(ready).localCheckpoint(eager=True)
        new_done = assigned.count()
        if new_done == done:
            raise RuntimeError("prerequisite DP stalled (cycle in condensation?)")
        done = new_done

    out = (
        scc.join(assigned, "scc_id")
        .select(
            "id",
            F.col("depth").cast("int").alias("prerequisite_depth"),
            F.col("effort").cast("double").alias("learning_effort"),
        )
    )
    scc.unpersist()
    scc_diff.unpersist()
    cond.unpersist()
    return out
