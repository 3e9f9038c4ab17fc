"""Distance centralities: weighted betweenness + out-closeness
(SURVEY.md G6/G7 — the reference's scaling wall).

Reference semantics (viz/graph2metrics.py:227-255):
- betweenness: ``nx.betweenness_centrality(G, weight="inverse_weight",
  normalized=True)`` — Brandes over Dijkstra distances; n<3 → all 0
- out-closeness: ``nx.closeness_centrality(G.reverse(),
  distance="inverse_weight", wf_improved=True)``. nx internally
  reverses again, so distances run FROM u on the original graph:
  ``C(u) = (reach-1)/Σd · (reach-1)/(n-1)``; n≤1 → 0.

Distributed realization: exact Brandes is O(V·E) with no cheap
distributed form, but it is *embarrassingly parallel over sources*.
We build a CSR adjacency on the driver, broadcast it, and fan the
source loop out with ``mapInPandas`` — each task runs
Dijkstra+dependency-accumulation for its source batch in pure Python
over the broadcast arrays and emits per-vertex partial deltas, which a
groupBy-sum reduces. ``sample_k`` switches to sampled-source
approximation (nx's k-sample semantics: deltas rescaled by n/k) — the
scale path the reference spec itself recommends
(docs/specs/viz_graph2metrics.md:767).

Ceiling: the broadcast CSR must fit in executor memory (~1e7 edges);
the reference caps at ~5e3 nodes, so exact fixture parity is well
inside the envelope.
"""

from __future__ import annotations

import heapq
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k2_18_spark.graph.adjacency import metrics_view, vertex_ids


def _collect_csr(
    edges: DataFrame, nodes: DataFrame | None, max_collect_edges: int
):
    """Driver-side numpy CSR over the metrics view with inverse weights.

    Arrow toPandas keeps the serial driver transfer fast, and numpy
    arrays make the broadcast cheap to deserialize per worker process
    (unpickling 10^6s of Python tuples was the hidden serial cost that
    killed source-parallel speedup — numpy unpickles as one memcpy).
    Returns (verts, indptr, indices, weights)."""
    import numpy as np

    mv = metrics_view(edges).select("src_id", "dst_id", "weight")
    # guard BEFORE collecting: the broadcast-CSR design has an explicit
    # edge ceiling; beyond it, trim the graph (T1) or raise sample_k on
    # a trimmed subgraph — don't let toPandas OOM the driver
    m = mv.count()
    if m > max_collect_edges:
        raise RuntimeError(
            f"betweenness/closeness uses a driver-broadcast CSR capped at "
            f"{max_collect_edges} edges (got {m}); trim the graph first "
            f"(the reference itself caps at ~5e3 nodes)"
        )
    verts = sorted(vertex_ids(edges, nodes).toPandas()["id"].tolist())
    index = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    pdf = mv.toPandas()
    srcs = pdf["src_id"].map(index).to_numpy(dtype=np.int64)
    dsts = pdf["dst_id"].map(index).to_numpy(dtype=np.int64)
    ws = pdf["weight"].to_numpy(dtype=np.float64)
    with np.errstate(divide="ignore"):
        inv = np.where(ws > 0, 1.0 / np.maximum(ws, 1e-300), np.inf)
    order = np.argsort(srcs, kind="stable")
    srcs, dsts, inv = srcs[order], dsts[order], inv[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, srcs + 1, 1)
    indptr = np.cumsum(indptr)
    return verts, indptr, dsts, inv


def _brandes_source(indptr, indices, weights, s: int, n: int):
    """Dijkstra + Brandes dependency accumulation from source s over a
    numpy CSR. → (delta array, dist sum, reach count).

    nx parity detail (networkx _dijkstra): an UNREACHED vertex is
    relaxed even at distance +inf (weight-0 edges get inverse_weight
    inf but are still traversed), so a node reachable only through an
    inf edge counts as reached with dist=inf — making the source's
    closeness 0.0 (totsp=inf), exactly like
    nx.closeness_centrality(..., distance=...)."""
    inf = float("inf")
    dist = [inf] * n
    reached = [False] * n
    sigma = [0.0] * n
    preds: list[list[int]] = [[] for _ in range(n)]
    dist[s] = 0.0
    reached[s] = True
    sigma[s] = 1.0
    seen: list[int] = []
    done = [False] * n
    heap = [(0.0, s)]
    while heap:
        d, v = heapq.heappop(heap)
        if done[v]:
            continue
        done[v] = True
        seen.append(v)
        for j in range(indptr[v], indptr[v + 1]):
            w = int(indices[j])
            nd = d + float(weights[j])
            # exact nx branch structure (_single_source_dijkstra_path_basic):
            # relax only non-finalized vertices; merge equal-distance
            # sigma WITHOUT a finalized guard (matters only for inf ties)
            if (not done[w]) and (not reached[w] or nd < dist[w]):
                dist[w] = nd
                reached[w] = True
                sigma[w] = sigma[v]
                preds[w] = [v]
                heapq.heappush(heap, (nd, w))
            elif reached[w] and nd == dist[w]:
                sigma[w] += sigma[v]
                preds[w].append(v)
    delta = [0.0] * n
    for w in reversed(seen):
        for v in preds[w]:
            delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
    delta[s] = 0.0
    totsp = sum(dist[i] for i in range(n) if reached[i])
    reach = sum(reached)
    return delta, totsp, reach


def betweenness_closeness(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    sample_k: int | None = None,
    num_slices: int | None = None,
    max_collect_edges: int = 10_000_000,
    method: str = "driver",
) -> DataFrame:
    """→ (id, betweenness_centrality, out_closeness).

    ``method``:
    - "driver" (default): broadcast-CSR source-parallel Brandes —
      exact nx semantics incl. weight≤0 inf-edges; ceiling
      ``max_collect_edges``.
    - "superstep": fully distributed (NO driver collect) — multi-source
      label-correcting SSSP + shortest-path-DAG sigma/delta
      accumulation as superstep joins; removes the CSR ceiling.
      Requires strictly positive weights (inf-distance edges would make
      the equal-distance DAG cyclic) and is intended with ``sample_k``.
    - "auto": driver when the edge count fits, else superstep.
    """
    if method == "superstep":
        return _superstep_centrality(spark, edges, nodes, sample_k)
    if method == "auto":
        mv_count = metrics_view(edges).count()
        if mv_count > max_collect_edges:
            return _superstep_centrality(spark, edges, nodes, sample_k)
    verts, indptr, indices, weights = _collect_csr(edges, nodes, max_collect_edges)
    n = len(verts)
    if n == 0:
        return spark.createDataFrame(
            [], "id string, betweenness_centrality double, out_closeness double"
        )

    if sample_k is not None and sample_k < n:
        # deterministic stride sample of sources
        stride = max(1, n // sample_k)
        sources = list(range(0, n, stride))[:sample_k]
    else:
        sources = list(range(n))
    k = len(sources)

    bc_csr = spark.sparkContext.broadcast((indptr, indices, weights))

    def run_sources(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        l_indptr, l_indices, l_weights = bc_csr.value
        for pdf in batches:
            out_idx: list[int] = []
            out_delta: list[float] = []
            out_clo: list[float] = []
            for s in pdf["s"]:
                delta, totsp, reach = _brandes_source(
                    l_indptr, l_indices, l_weights, int(s), n
                )
                for i, d in enumerate(delta):
                    if d != 0.0:
                        out_idx.append(i)
                        out_delta.append(d)
                        out_clo.append(0.0)
                # closeness row for the source itself
                if totsp > 0.0 and n > 1 and reach > 1:
                    clo = (reach - 1.0) / totsp * ((reach - 1.0) / (n - 1.0))
                else:
                    clo = 0.0
                out_idx.append(int(s))
                out_delta.append(0.0)
                out_clo.append(clo)
            yield pd.DataFrame(
                {"idx": out_idx, "delta": out_delta, "closeness": out_clo}
            )

    slices = num_slices or min(k, spark.sparkContext.defaultParallelism * 4)
    src_df = spark.createDataFrame([(s,) for s in sources], "s int").repartition(
        slices
    )
    partials = src_df.mapInPandas(run_sources, "idx int, delta double, closeness double")
    agg = partials.groupBy("idx").agg(
        F.sum("delta").alias("delta"), F.sum("closeness").alias("out_closeness")
    )

    # nx normalization: directed scale 1/((n-1)(n-2)); k-sample → ×(n/k)
    if n > 2:
        scale = 1.0 / ((n - 1.0) * (n - 2.0)) * (float(n) / k)
    else:
        scale = 0.0
    vert_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(verts)], "idx int, id string"
    )
    return (
        vert_df.join(agg, "idx", "left")
        .select(
            "id",
            (F.coalesce("delta", F.lit(0.0)) * F.lit(scale)).alias(
                "betweenness_centrality"
            ),
            F.coalesce("out_closeness", F.lit(0.0)).alias("out_closeness"),
        )
    )


def _superstep_centrality(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None,
    sample_k: int | None,
    max_rounds: int = 500,
) -> DataFrame:
    """Distributed sampled-source Brandes — NO driver collect anywhere.

    Three superstep phases over the dense-encoded adjacency:
    1. multi-source label-correcting SSSP (frontier joins; rounds =
       corrected-hop diameter),
    2. path counts σ: settle a vertex once ALL its shortest-path-DAG
       predecessors are settled (incremental indegree counting; rounds =
       DAG depth — acyclic because weights are strictly positive, so
       distance strictly increases along DAG edges),
    3. dependencies δ on the reverse DAG (same settling scheme).

    Source sampling uses the same stride-over-sorted-ids rule as the
    driver path, so both methods see identical sources and agree to
    float noise (tested at 1e-6). Weight ≤ 0 edges (inverse distance
    inf) would create equal-inf DAG cycles; they raise here — use
    method="driver" for that nx edge case.
    """
    from k2_18_spark.session import superstep_conf

    with superstep_conf(spark):
        return _superstep_centrality_loop(
            spark, edges, nodes, sample_k, max_rounds
        )


# populated by every _superstep_centrality_loop run: phase → (seconds,
# rounds) — benchmarking introspection, not API
LAST_SUPERSTEP_STATS: dict = {}

# sampled-source counts up to this use the columnar superstep state
# (per-source COLUMNS keyed by vertex); larger k falls back to the
# row-per-(source,vertex) loop. 64 sources × 3 state columns ≈ 200
# columns — comfortably inside whole-stage codegen limits.
SUPERSTEP_COLUMNAR_MAX_K = 64


def _superstep_centrality_loop(spark, edges, nodes, sample_k, max_rounds):
    import time as _time

    from pyspark.storagelevel import StorageLevel

    from k2_18_spark.graph.adjacency import dense_vertex_ids

    _t0 = _time.monotonic()
    LAST_SUPERSTEP_STATS.clear()

    def _mark(phase: str, rounds: int | None = None) -> None:
        nonlocal _t0
        now = _time.monotonic()
        LAST_SUPERSTEP_STATS[phase] = (round(now - _t0, 1), rounds)
        _t0 = now

    vmap = dense_vertex_ids(vertex_ids(edges, nodes))  # (id, ord) — id-sorted
    vmap = vmap.persist(StorageLevel.MEMORY_AND_DISK)
    n = vmap.count()
    if n == 0:
        return spark.createDataFrame(
            [], "id string, betweenness_centrality double, out_closeness double"
        )

    mv = metrics_view(edges)
    if mv.filter(F.col("weight") <= 0).limit(1).count() > 0:
        raise ValueError(
            "method='superstep' requires strictly positive weights "
            "(weight<=0 => infinite inverse distance; use method='driver')"
        )
    enc_u = vmap.select(F.col("id").alias("src_id"), F.col("ord").alias("_u"))
    enc_v = vmap.select(F.col("id").alias("dst_id"), F.col("ord").alias("_v"))
    e = (
        mv.join(enc_u.hint("shuffle_hash"), "src_id")
        .join(enc_v.hint("shuffle_hash"), "dst_id")
        .select(
            F.col("_u").alias("u"),
            F.col("_v").alias("v"),
            (F.lit(1.0) / F.col("weight")).alias("wt"),
        )
        .repartition("u")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e.count()

    # stride sample over ord = the driver path's stride over sorted ids
    if sample_k is not None and sample_k < n:
        stride = max(1, n // sample_k)
        srcs = vmap.filter(
            (F.pmod(F.col("ord"), F.lit(stride)) == 0)
            & (F.col("ord") < stride * sample_k)
        )
    else:
        srcs = vmap
    sources = srcs.select(F.col("ord").alias("s")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    k = sources.count()
    _mark("prep")

    if k <= SUPERSTEP_COLUMNAR_MAX_K:
        # k-wide columnar state: one row per VERTEX with per-source
        # columns instead of one row per (source, vertex) — k× fewer
        # state rows, the DAG holds one row per edge with a k-bit mask
        # instead of per-source copies, and every aggregate is a
        # codegen'd per-column min/sum. Semantically identical to the
        # row path below (parity-tested).
        return _superstep_columnar(
            spark, e, vmap, sources, n, k, max_rounds, _mark
        )

    # -- phase 1: multi-source SSSP ------------------------------------
    # Frontier label-correcting with a COGROUPED merge: ``improved``
    # comes out of its groupBy hash-partitioned on (s, v) and ``dist``
    # is checkpointed with the same partitioning, so the full-outer
    # merge joins partition-to-partition — no per-round re-aggregation
    # of the whole |sources|·|V| state (the r03 shape union+min-agg'd
    # it every round).
    dist = (
        sources.select("s", F.col("s").alias("v"), F.lit(0.0).alias("d"))
        .repartition("s", "v")
        .localCheckpoint(eager=True)
    )
    frontier = dist
    ckpt = dist  # the checkpointed frame backing the current state
    better = F.col("nd").isNotNull() & (
        F.col("od").isNull() | (F.col("nd") < F.col("od"))
    )
    for _round in range(max_rounds):
        fr = frontier.select("s", F.col("v").alias("u"), "d")
        cand = (
            fr.join(e.hint("shuffle_hash"), "u")
            .select("s", "v", (F.col("d") + F.col("wt")).alias("nd"))
            .groupBy("s", "v")
            .agg(F.min("nd").alias("nd"))
        )
        # hash joins only (AQE is off inside superstep_conf and an
        # unhinted join would SORT the |sources|·|V| dist state every
        # round); ONE materialization per round: the merged state
        # carries a changed flag, so the next frontier and the new dist
        # are both lazy reads of the same checkpoint
        merged = (
            dist.select("s", "v", F.col("d").alias("od"))
            .join(cand.hint("shuffle_hash"), ["s", "v"], "full_outer")
            .select(
                "s",
                "v",
                F.when(better, F.col("nd")).otherwise(F.col("od")).alias("d"),
                better.alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        dist = merged.select("s", "v", "d")
        frontier = merged.filter("chg").select("s", "v", "d")
        done = frontier.isEmpty()
        ckpt.unpersist()
        ckpt = merged
        if done:
            break
    else:
        raise RuntimeError(f"superstep SSSP did not settle in {max_rounds} rounds")
    dist = dist.persist(StorageLevel.MEMORY_AND_DISK)
    _mark("sssp", _round + 1)

    # -- shortest-path DAG: u→w where d(u) + wt == d(w) ----------------
    # Partitioned by the σ loop's join key (s, u) ONCE here: the σ
    # settling joins the full DAG every round, and without the explicit
    # repartition each round re-exchanged all |dag| rows (the build's
    # natural output partitioning is (s, w)).
    dag = (
        dist.select("s", F.col("v").alias("u"), F.col("d").alias("du"))
        .join(e.hint("shuffle_hash"), "u")
        .select("s", "u", "du", F.col("v").alias("w"), "wt")
        .join(
            dist.select("s", F.col("v").alias("w"), F.col("d").alias("dw")).hint(
                "shuffle_hash"
            ),
            ["s", "w"],
        )
        .filter(F.col("du") + F.col("wt") == F.col("dw"))
        .select("s", "u", "w")
        .repartition("s", "u")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dag.count()
    _mark("dag_build")

    # -- phase 2: σ by incremental indegree settling -------------------
    # Cogrouped accumulator (r03 VERDICT task 4): each round aggregates
    # ONLY the new contributions (from vertices settled last round) and
    # folds them into the (s, w)-partitioned accumulator with a
    # partition-aligned outer join — the r03 shape re-unioned and
    # re-aggregated the ENTIRE accumulator every round. A vertex hits
    # cnt == deg exactly once (each DAG predecessor settles once and
    # contributes the round after), so ``ready`` needs no anti-join
    # against settled state, and the full σ table is assembled ONCE
    # after the loop instead of growing via per-round unions.
    indeg = dag.groupBy("s", "w").agg(F.count(F.lit(1)).alias("deg")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigma_seed = sources.select(
        "s", F.col("s").alias("v"), F.lit(1.0).alias("sigma")
    ).localCheckpoint(eager=True)
    new_settled = sigma_seed
    # acc: (s, w, sig, cnt, deg) — deg carried from first touch so
    # ``ready`` is a lazy filter of the ONE per-round checkpoint
    acc = None
    settled_now = (F.col("ncnt").isNotNull()) & (
        F.col("cnt") == F.col("deg")
    )
    for _round in range(max_rounds):
        contrib_agg = (
            dag.join(
                new_settled.select(
                    "s", F.col("v").alias("u"), "sigma"
                ).hint("shuffle_hash"),
                ["s", "u"],
            )
            .groupBy("s", "w")
            .agg(
                F.sum("sigma").alias("nsig"),
                F.count(F.lit(1)).cast("int").alias("ncnt"),
            )
            .join(indeg.hint("shuffle_hash"), ["s", "w"])
        )
        if acc is None:
            acc_new = (
                contrib_agg.select(
                    "s",
                    "w",
                    F.col("nsig").alias("sig"),
                    F.col("ncnt").alias("cnt"),
                    "deg",
                    F.col("ncnt").alias("ncnt"),
                )
                .localCheckpoint(eager=True)
            )
        else:
            acc_new = (
                acc.select("s", "w", "sig", "cnt", "deg")
                .join(
                    contrib_agg.withColumnRenamed("deg", "ndeg").hint(
                        "shuffle_hash"
                    ),
                    ["s", "w"],
                    "full_outer",
                )
                .select(
                    "s",
                    "w",
                    (
                        F.coalesce("sig", F.lit(0.0)) + F.coalesce("nsig", F.lit(0.0))
                    ).alias("sig"),
                    (
                        F.coalesce("cnt", F.lit(0)) + F.coalesce("ncnt", F.lit(0))
                    ).cast("int").alias("cnt"),
                    F.coalesce("deg", "ndeg").alias("deg"),
                    "ncnt",
                )
                .localCheckpoint(eager=True)
            )
            acc.unpersist()
        acc = acc_new
        ready = acc.filter(settled_now).select(
            "s", F.col("w").alias("v"), F.col("sig").alias("sigma")
        )
        if ready.isEmpty():
            break
        new_settled = ready
    else:
        raise RuntimeError(f"σ settling exceeded {max_rounds} rounds")
    sigma = (
        sigma_seed.unionByName(
            acc.filter(F.col("cnt") == F.col("deg")).select(
                "s", F.col("w").alias("v"), F.col("sig").alias("sigma")
            )
        ).persist(StorageLevel.MEMORY_AND_DISK)
        if acc is not None
        else sigma_seed.persist(StorageLevel.MEMORY_AND_DISK)
    )
    _mark("sigma", _round + 1)

    # -- phase 3: δ on the reverse DAG ---------------------------------
    # ratio edges: u→w with σu/σw precomputed
    dag_r = (
        dag.join(
            sigma.select("s", F.col("v").alias("u"), F.col("sigma").alias("su")).hint(
                "shuffle_hash"
            ),
            ["s", "u"],
        )
        .join(
            sigma.select("s", F.col("v").alias("w"), F.col("sigma").alias("sw")).hint(
                "shuffle_hash"
            ),
            ["s", "w"],
        )
        .select("s", "u", "w", (F.col("su") / F.col("sw")).alias("ratio"))
        # (s, w) is the δ loop's per-round join key — pin it once
        .repartition("s", "w")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    outdeg = dag_r.groupBy("s", "u").agg(
        F.count(F.lit(1)).alias("deg")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # leaves: reached vertices with no DAG successors → δ = 0
    delta = (
        dist.select("s", "v")
        .join(
            outdeg.select("s", F.col("u").alias("v")), ["s", "v"], "left_anti"
        )
        .select("s", "v", F.lit(0.0).alias("delta"))
        .localCheckpoint(eager=True)
    )
    # same one-checkpoint-per-round cogrouped scheme as the σ phase
    leaves = delta
    new_settled = delta
    acc2 = None
    for _round in range(max_rounds):
        contrib_agg = (
            dag_r.join(
                new_settled.select("s", F.col("v").alias("w"), "delta").hint(
                    "shuffle_hash"
                ),
                ["s", "w"],
            )
            .groupBy("s", "u")
            .agg(
                F.sum(F.col("ratio") * (F.lit(1.0) + F.col("delta"))).alias("ndd"),
                F.count(F.lit(1)).cast("int").alias("ncnt"),
            )
            .join(outdeg.hint("shuffle_hash"), ["s", "u"])
        )
        if acc2 is None:
            acc2_new = (
                contrib_agg.select(
                    "s",
                    "u",
                    F.col("ndd").alias("dd"),
                    F.col("ncnt").alias("cnt"),
                    "deg",
                    F.col("ncnt").alias("ncnt"),
                )
                .localCheckpoint(eager=True)
            )
        else:
            acc2_new = (
                acc2.select("s", "u", "dd", "cnt", "deg")
                .join(
                    contrib_agg.withColumnRenamed("deg", "ndeg").hint(
                        "shuffle_hash"
                    ),
                    ["s", "u"],
                    "full_outer",
                )
                .select(
                    "s",
                    "u",
                    (
                        F.coalesce("dd", F.lit(0.0)) + F.coalesce("ndd", F.lit(0.0))
                    ).alias("dd"),
                    (
                        F.coalesce("cnt", F.lit(0)) + F.coalesce("ncnt", F.lit(0))
                    ).cast("int").alias("cnt"),
                    F.coalesce("deg", "ndeg").alias("deg"),
                    "ncnt",
                )
                .localCheckpoint(eager=True)
            )
            acc2.unpersist()
        acc2 = acc2_new
        ready = acc2.filter(settled_now).select(
            "s", F.col("u").alias("v"), F.col("dd").alias("delta")
        )
        if ready.isEmpty():
            break
        new_settled = ready
    else:
        raise RuntimeError(f"δ settling exceeded {max_rounds} rounds")
    delta = (
        leaves.unionByName(
            acc2.filter(F.col("cnt") == F.col("deg")).select(
                "s", F.col("u").alias("v"), F.col("dd").alias("delta")
            )
        )
        if acc2 is not None
        else leaves
    )
    _mark("delta", _round + 1)

    # -- assemble ------------------------------------------------------
    # betweenness: Σ_s δ_s(v) for v ≠ s, nx directed normalization
    # 1/((n-1)(n-2)) and k-sample rescale ×(n/k)
    scale = (1.0 / ((n - 1.0) * (n - 2.0)) * (float(n) / k)) if n > 2 else 0.0
    bc = (
        delta.filter(F.col("v") != F.col("s"))
        .groupBy("v")
        .agg((F.sum("delta") * F.lit(scale)).alias("betweenness_centrality"))
    )
    # out-closeness for the sampled sources (non-sources → 0, like the
    # driver sample path): C(s) = (reach-1)/Σd · (reach-1)/(n-1)
    clo = (
        dist.groupBy("s")
        .agg(F.sum("d").alias("totsp"), F.count(F.lit(1)).alias("reach"))
        .select(
            F.col("s").alias("v"),
            F.when(
                (F.col("totsp") > 0) & (F.col("reach") > 1) & (F.lit(n) > 1),
                (F.col("reach") - 1.0)
                / F.col("totsp")
                * ((F.col("reach") - 1.0) / F.lit(n - 1.0)),
            )
            .otherwise(0.0)
            .alias("out_closeness"),
        )
    )
    out = (
        vmap.select(F.col("ord").alias("v"), "id")
        .join(bc, "v", "left")
        .join(clo, "v", "left")
        .select(
            "id",
            F.coalesce("betweenness_centrality", F.lit(0.0)).alias(
                "betweenness_centrality"
            ),
            F.coalesce("out_closeness", F.lit(0.0)).alias("out_closeness"),
        )
    )
    return out


def _superstep_columnar(spark, e, vmap, sources, n, k, max_rounds, _mark):
    """Columnar multi-source Brandes (k ≤ SUPERSTEP_COLUMNAR_MAX_K).

    Same three phases and settling semantics as the row loop, but the
    state is keyed by VERTEX with k per-source columns:

    - dist:  (v, d0..d{k-1})                      ≤ |V| rows
    - dag:   (u, w, m0..m{k-1} boolean mask)      ≤ |E| rows
    - σ acc: (w, sig_i, cnt_i, deg_i, new_i)      ≤ |V| rows
    - δ acc: (u, dd_i, cnt_i, deg_i, new_i)       ≤ |V| rows

    The only driver-side materialization is the k sampled source ids
    (scalars, k ≤ 64) — needed to build the per-source column
    expressions; bulk data never leaves the executors.
    """
    from functools import reduce
    from operator import or_

    from pyspark.sql import types as T
    from pyspark.storagelevel import StorageLevel

    s_list = [r["s"] for r in sources.orderBy("s").collect()]
    R = range(k)

    def cols(prefix):
        return [f"{prefix}{i}" for i in R]

    def ckpt_swap(old, new):
        if old is not None:
            old.unpersist()
        return new

    # -- phase 1: SSSP --------------------------------------------------
    seed_rows = [
        tuple([sv] + [0.0 if i == j else None for i in R])
        for j, sv in enumerate(s_list)
    ]
    d_schema = T.StructType(
        [T.StructField("v", T.LongType())]
        + [T.StructField(f"d{i}", T.DoubleType()) for i in R]
    )
    dist = (
        spark.createDataFrame(seed_rows, d_schema)
        .repartition("v")
        .localCheckpoint(eager=True)
    )
    frontier = dist
    ckpt = dist
    for _round in range(max_rounds):
        fr = frontier.select(
            F.col("v").alias("u"),
            *[F.col(f"d{i}").alias(f"fd{i}") for i in R],
        )
        cand = (
            fr.join(e.hint("shuffle_hash"), "u")
            .groupBy("v")
            .agg(
                *[
                    F.min(F.col(f"fd{i}") + F.col("wt")).alias(f"nd{i}")
                    for i in R
                ]
            )
        )
        better = [
            F.col(f"nd{i}").isNotNull()
            & (F.col(f"od{i}").isNull() | (F.col(f"nd{i}") < F.col(f"od{i}")))
            for i in R
        ]
        merged = (
            dist.select("v", *[F.col(f"d{i}").alias(f"od{i}") for i in R])
            .join(cand.hint("shuffle_hash"), ["v"], "full_outer")
            .select(
                "v",
                *[
                    F.when(better[i], F.col(f"nd{i}"))
                    .otherwise(F.col(f"od{i}"))
                    .alias(f"d{i}")
                    for i in R
                ],
                *[better[i].alias(f"chg{i}") for i in R],
            )
            .localCheckpoint(eager=True)
        )
        dist = merged.select("v", *cols("d"))
        # propagate ONLY the components that improved (others null)
        frontier = merged.filter(
            reduce(or_, [F.col(f"chg{i}") for i in R])
        ).select(
            "v",
            *[
                F.when(F.col(f"chg{i}"), F.col(f"d{i}")).alias(f"d{i}")
                for i in R
            ],
        )
        done = frontier.isEmpty()
        ckpt = ckpt_swap(ckpt, merged)
        if done:
            break
    else:
        raise RuntimeError(f"superstep SSSP did not settle in {max_rounds} rounds")
    dist = dist.persist(StorageLevel.MEMORY_AND_DISK)
    dist.count()
    _mark("sssp", _round + 1)

    # -- shortest-path DAG mask ----------------------------------------
    du = dist.select(
        F.col("v").alias("u"), *[F.col(f"d{i}").alias(f"du{i}") for i in R]
    )
    dw = dist.select(
        F.col("v").alias("w"), *[F.col(f"d{i}").alias(f"dw{i}") for i in R]
    )
    masks = [
        F.coalesce(
            F.col(f"du{i}") + F.col("wt") == F.col(f"dw{i}"), F.lit(False)
        )
        for i in R
    ]
    dag = (
        e.select("u", F.col("v").alias("w"), "wt")
        .join(du.hint("shuffle_hash"), "u")
        .join(dw.hint("shuffle_hash"), "w")
        .select("u", "w", *[masks[i].alias(f"m{i}") for i in R])
        .filter(reduce(or_, [F.col(f"m{i}") for i in R]))
        .repartition("u")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dag.count()
    _mark("dag_build")

    # -- phase 2: σ settling -------------------------------------------
    # acc seeded from the per-source indegrees; contributions LEFT-join
    # into it (every contribution target has a DAG in-edge, so the key
    # set never grows)
    acc = (
        dag.groupBy("w")
        .agg(
            *[
                F.sum(F.col(f"m{i}").cast("int")).cast("int").alias(f"deg{i}")
                for i in R
            ]
        )
        .select(
            "w",
            *[F.lit(0.0).alias(f"sig{i}") for i in R],
            *[F.lit(0).alias(f"cnt{i}") for i in R],
            *cols("deg"),
        )
        .repartition("w")
        .localCheckpoint(eager=True)
    )
    # newly-settled frame: (u, ns_i = σ_i if source i newly settled at u)
    ns_schema = T.StructType(
        [T.StructField("u", T.LongType())]
        + [T.StructField(f"ns{i}", T.DoubleType()) for i in R]
    )
    new_settled = spark.createDataFrame(
        [
            tuple([sv] + [1.0 if i == j else None for i in R])
            for j, sv in enumerate(s_list)
        ],
        ns_schema,
    )
    for _round in range(max_rounds):
        contrib = (
            dag.join(new_settled.hint("shuffle_hash"), "u")
            .groupBy("w")
            .agg(
                *[
                    F.sum(F.when(F.col(f"m{i}"), F.col(f"ns{i}"))).alias(
                        f"nsig{i}"
                    )
                    for i in R
                ],
                *[
                    F.count(
                        F.when(
                            F.col(f"m{i}") & F.col(f"ns{i}").isNotNull(),
                            F.lit(1),
                        )
                    )
                    .cast("int")
                    .alias(f"ncnt{i}")
                    for i in R
                ],
            )
        )
        acc_new = (
            acc.join(contrib.hint("shuffle_hash"), "w", "left")
            .select(
                "w",
                *[
                    (
                        F.col(f"sig{i}")
                        + F.coalesce(F.col(f"nsig{i}"), F.lit(0.0))
                    ).alias(f"sig{i}")
                    for i in R
                ],
                *[
                    (
                        F.col(f"cnt{i}")
                        + F.coalesce(F.col(f"ncnt{i}"), F.lit(0))
                    ).alias(f"cnt{i}")
                    for i in R
                ],
                *cols("deg"),
                *[
                    (
                        (F.coalesce(F.col(f"ncnt{i}"), F.lit(0)) > 0)
                        & (
                            F.col(f"cnt{i}")
                            + F.coalesce(F.col(f"ncnt{i}"), F.lit(0))
                            == F.col(f"deg{i}")
                        )
                    ).alias(f"new{i}")
                    for i in R
                ],
            )
            .localCheckpoint(eager=True)
        )
        acc = ckpt_swap(acc, acc_new)
        new_settled = acc.filter(
            reduce(or_, [F.col(f"new{i}") for i in R])
        ).select(
            F.col("w").alias("u"),
            *[
                F.when(F.col(f"new{i}"), F.col(f"sig{i}")).alias(f"ns{i}")
                for i in R
            ],
        )
        if new_settled.isEmpty():
            break
    else:
        raise RuntimeError(f"σ settling exceeded {max_rounds} rounds")
    _mark("sigma", _round + 1)

    # final σ per vertex: sources pin σ=1 for their own component (they
    # have no DAG in-edges for it, so acc never accumulates them)
    seed_v = spark.createDataFrame(
        [(sv,) for sv in s_list], "v long"
    )
    sig_v = (
        acc.select(F.col("w").alias("v"), *cols("sig"))
        .join(seed_v, "v", "full_outer")
        .select(
            "v",
            *[
                F.when(F.col("v") == F.lit(s_list[i]), F.lit(1.0))
                .otherwise(F.col(f"sig{i}"))
                .alias(f"sig{i}")
                for i in R
            ],
        )
    )

    # -- phase 3: δ settling on the reverse DAG ------------------------
    sig_u = sig_v.select(
        F.col("v").alias("u"), *[F.col(f"sig{i}").alias(f"su{i}") for i in R]
    )
    sig_w = sig_v.select(
        F.col("v").alias("w"), *[F.col(f"sig{i}").alias(f"sw{i}") for i in R]
    )
    dag_r = (
        dag.join(sig_u.hint("shuffle_hash"), "u")
        .join(sig_w.hint("shuffle_hash"), "w")
        .select(
            "u",
            "w",
            *[
                F.when(
                    F.col(f"m{i}"), F.col(f"su{i}") / F.col(f"sw{i}")
                ).alias(f"r{i}")
                for i in R
            ],
        )
        .repartition("w")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    acc2 = (
        dag.groupBy("u")
        .agg(
            *[
                F.sum(F.col(f"m{i}").cast("int")).cast("int").alias(f"deg{i}")
                for i in R
            ]
        )
        .select(
            "u",
            *[F.lit(0.0).alias(f"dd{i}") for i in R],
            *[F.lit(0).alias(f"cnt{i}") for i in R],
            *cols("deg"),
        )
        .repartition("u")
        .localCheckpoint(eager=True)
    )
    # leaves per component: reached with no outgoing DAG edge for it
    outdeg_v = acc2.select(
        F.col("u").alias("v"), *[F.col(f"deg{i}").alias(f"odg{i}") for i in R]
    )
    leaf_flags = [
        F.col(f"d{i}").isNotNull()
        & (F.coalesce(F.col(f"odg{i}"), F.lit(0)) == 0)
        for i in R
    ]
    new_settled = (
        dist.join(outdeg_v, "v", "left")
        .select(
            F.col("v").alias("w"),
            *[
                F.when(leaf_flags[i], F.lit(0.0)).alias(f"nd{i}")
                for i in R
            ],
        )
        .filter(
            reduce(or_, [F.col(f"nd{i}").isNotNull() for i in R])
        )
    )
    for _round in range(max_rounds):
        contrib = (
            dag_r.join(new_settled.hint("shuffle_hash"), "w")
            .groupBy("u")
            .agg(
                *[
                    F.sum(
                        F.col(f"r{i}") * (F.lit(1.0) + F.col(f"nd{i}"))
                    ).alias(f"ndd{i}")
                    for i in R
                ],
                *[
                    F.count(
                        F.when(
                            F.col(f"r{i}").isNotNull()
                            & F.col(f"nd{i}").isNotNull(),
                            F.lit(1),
                        )
                    )
                    .cast("int")
                    .alias(f"ncnt{i}")
                    for i in R
                ],
            )
        )
        acc2_new = (
            acc2.join(contrib.hint("shuffle_hash"), "u", "left")
            .select(
                "u",
                *[
                    (
                        F.col(f"dd{i}")
                        + F.coalesce(F.col(f"ndd{i}"), F.lit(0.0))
                    ).alias(f"dd{i}")
                    for i in R
                ],
                *[
                    (
                        F.col(f"cnt{i}")
                        + F.coalesce(F.col(f"ncnt{i}"), F.lit(0))
                    ).alias(f"cnt{i}")
                    for i in R
                ],
                *cols("deg"),
                *[
                    (
                        (F.coalesce(F.col(f"ncnt{i}"), F.lit(0)) > 0)
                        & (
                            F.col(f"cnt{i}")
                            + F.coalesce(F.col(f"ncnt{i}"), F.lit(0))
                            == F.col(f"deg{i}")
                        )
                    ).alias(f"new{i}")
                    for i in R
                ],
            )
            .localCheckpoint(eager=True)
        )
        acc2 = ckpt_swap(acc2, acc2_new)
        new_settled = acc2.filter(
            reduce(or_, [F.col(f"new{i}") for i in R])
        ).select(
            F.col("u").alias("w"),
            *[
                F.when(F.col(f"new{i}"), F.col(f"dd{i}")).alias(f"nd{i}")
                for i in R
            ],
        )
        if new_settled.isEmpty():
            break
    else:
        raise RuntimeError(f"δ settling exceeded {max_rounds} rounds")
    _mark("delta", _round + 1)

    # -- assemble ------------------------------------------------------
    scale = (1.0 / ((n - 1.0) * (n - 2.0)) * (float(n) / k)) if n > 2 else 0.0
    bc_terms = [
        F.when(F.col("u") == F.lit(s_list[i]), F.lit(0.0)).otherwise(
            F.col(f"dd{i}")
        )
        for i in R
    ]
    bc = acc2.select(
        F.col("u").alias("v"),
        (sum(bc_terms[1:], bc_terms[0]) * F.lit(scale)).alias(
            "betweenness_centrality"
        ),
    )
    # out-closeness per source: reach/Σd from the dist columns (k
    # scalar pairs — same driver-side formula as the row path)
    reach_row = dist.agg(
        *[F.count(F.col(f"d{i}")).alias(f"c{i}") for i in R],
        *[F.sum(F.col(f"d{i}")).alias(f"t{i}") for i in R],
    ).collect()[0]
    clo_rows = []
    for i in R:
        reach, totsp = reach_row[f"c{i}"], reach_row[f"t{i}"] or 0.0
        if totsp > 0.0 and n > 1 and reach > 1:
            clo = (reach - 1.0) / totsp * ((reach - 1.0) / (n - 1.0))
        else:
            clo = 0.0
        clo_rows.append((s_list[i], clo))
    clo = spark.createDataFrame(clo_rows, "v long, out_closeness double")
    out = (
        vmap.select(F.col("ord").alias("v"), "id")
        .join(bc, "v", "left")
        .join(F.broadcast(clo), "v", "left")
        .select(
            "id",
            F.coalesce("betweenness_centrality", F.lit(0.0)).alias(
                "betweenness_centrality"
            ),
            F.coalesce("out_closeness", F.lit(0.0)).alias("out_closeness"),
        )
    )
    return out


def _dijkstra_dists(indptr, indices, weights, s: int, n: int):
    """Distances from source s over the numpy CSR — the σ/δ-free core
    of :func:`_brandes_source` (same inf-edge relaxation semantics, so
    harmonic matches nx.shortest_path_length with the same distance)."""
    inf = float("inf")
    dist = [inf] * n
    reached = [False] * n
    dist[s] = 0.0
    reached[s] = True
    done = [False] * n
    heap = [(0.0, s)]
    while heap:
        d, v = heapq.heappop(heap)
        if done[v]:
            continue
        done[v] = True
        for j in range(indptr[v], indptr[v + 1]):
            w = int(indices[j])
            nd = d + float(weights[j])
            if (not done[w]) and (not reached[w] or nd < dist[w]):
                dist[w] = nd
                reached[w] = True
                heapq.heappush(heap, (nd, w))
    return dist


def harmonic_centrality(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    sample_k: int | None = None,
    num_slices: int | None = None,
    max_collect_edges: int = 10_000_000,
) -> DataFrame:
    """→ (id, harmonic_centrality): H(u) = Σ_{v≠u} 1/d(v, u).

    nx.harmonic_centrality(G, distance="inverse_weight") semantics —
    incoming distances, no normalization, unreachable pairs contribute
    nothing (Boldi/Vigna "Axioms for centrality", the measure Common
    Crawl publishes for its host-level webgraph). Same source-parallel
    broadcast-CSR plan as :func:`betweenness_closeness`: each task runs
    plain Dijkstra for its source batch and emits per-target 1/d
    contributions; one groupBy-sum reduces. ``sample_k`` sources →
    estimate rescaled by n/k. Above the CSR ceiling use
    :func:`k2_18_spark.graph.anf.harmonic_anf` (HyperBall).
    """
    verts, indptr, indices, weights = _collect_csr(edges, nodes, max_collect_edges)
    n = len(verts)
    if n == 0:
        return spark.createDataFrame([], "id string, harmonic_centrality double")

    if sample_k is not None and sample_k < n:
        stride = max(1, n // sample_k)
        sources = list(range(0, n, stride))[:sample_k]
    else:
        sources = list(range(n))
    k = len(sources)
    scale = float(n) / k

    bc_csr = spark.sparkContext.broadcast((indptr, indices, weights))

    def run_sources(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        l_indptr, l_indices, l_weights = bc_csr.value
        for pdf in batches:
            out_idx: list[int] = []
            out_h: list[float] = []
            for s in pdf["s"]:
                dist = _dijkstra_dists(l_indptr, l_indices, l_weights, int(s), n)
                for i, d in enumerate(dist):
                    if 0.0 < d < float("inf"):
                        out_idx.append(i)
                        out_h.append(1.0 / d)
            yield pd.DataFrame({"idx": out_idx, "h": out_h})

    slices = num_slices or min(k, spark.sparkContext.defaultParallelism * 4)
    src_df = spark.createDataFrame([(s,) for s in sources], "s int").repartition(
        slices
    )
    partials = src_df.mapInPandas(run_sources, "idx int, h double")
    agg = partials.groupBy("idx").agg(F.sum("h").alias("h"))
    vert_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(verts)], "idx int, id string"
    )
    return vert_df.join(agg, "idx", "left").select(
        "id",
        (F.coalesce("h", F.lit(0.0)) * F.lit(scale)).alias("harmonic_centrality"),
    )
