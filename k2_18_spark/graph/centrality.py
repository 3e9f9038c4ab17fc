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
) -> DataFrame:
    """→ (id, betweenness_centrality, out_closeness)."""
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
