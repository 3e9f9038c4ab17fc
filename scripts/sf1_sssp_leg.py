#!/usr/bin/env python
"""sf1 spot-check leg for weighted SSSP (graph/sssp.py, G40): the
engine at 1M vertices / 15M edges vs TWO independent oracles over the
SAME exported edge table.

Primary (bit-exact required): a numpy full-vector lexicographic
(dist, hops) Bellman-Ford that replays the engine's recurrence — full
relaxation per round is provably round-for-round identical to the
engine's frontier pruning (a vertex unimproved since round t re-sends
candidates already absorbed by the min at round t), every candidate
``dist[src] + w`` has the same double operands, and min-folds are
order-independent — so distances AND hops must match exactly.

Secondary (distances + reached set bit-exact; hops may differ at
documented float-tie collisions): a pure-Python settled-pair Dijkstra
with lexicographic (dist, hops) priority. Dijkstra relaxes only
per-vertex SETTLED lex-min pairs, so when two DIFFERENT paths have
bit-identical IEEE754 sums (6-decimal weights collide routinely at
15M edges) it can miss the fewest-hops witness among bit-equal-
distance paths; the engine's round-replay keeps it. The engine
lex-dominates Dijkstra pointwise (engine pair <= Dijkstra pair at
every vertex: each engine state is a real path value, and every
settled-pair relaxation Dijkstra performs is eventually re-applied by
the engine with identical operand bits). The leg asserts exactly that
and reports the collision count — measured rate ~1 vertex per million
(tests/test_sssp.py has the 6-vertex deterministic fixture).

The result row ``sssp_sf1`` is MERGED into
CORRECTNESS_sf1_spotcheck.json (same record shape as the other legs).
"""

from __future__ import annotations

import heapq
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from k2_18_spark.io.synth import powerlaw_edges, vertex_table
from k2_18_spark.session import get_spark

NUM_V = int(os.environ.get("SF1_V", 1_000_000))
NUM_E = int(os.environ.get("SF1_E", 15_000_000))
OUT = os.environ.get(
    "SF1_OUT",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "CORRECTNESS_sf1_spotcheck.json"),
)
SCRATCH = os.environ.get("SF1_SCRATCH", "/tmp/sf1_sssp_edges.parquet")
SOURCES = ["v0", "v1"]


def _load_csr():
    import duckdb

    con = duckdb.connect()
    ep = con.sql(
        f"SELECT CAST(substr(src_id, 2, 10) AS BIGINT) s,"
        f"       CAST(substr(dst_id, 2, 10) AS BIGINT) d, MIN(weight) w "
        f"FROM '{SCRATCH}/*.parquet' WHERE src_id <> dst_id GROUP BY 1, 2"
    ).df()
    s = ep["s"].to_numpy(np.int64)
    d = ep["d"].to_numpy(np.int64)
    w = ep["w"].to_numpy(np.float64)
    return s, d, w


def _bellman_ford_lex(s, d, w):
    """Full-vector lex (dist, hops) Bellman-Ford — the engine recurrence."""
    INF = float("inf")
    dist = np.full(NUM_V, INF, dtype=np.float64)
    hops = np.full(NUM_V, -1, dtype=np.int64)
    frontier = np.zeros(NUM_V, dtype=bool)
    for src in SOURCES:
        v = int(src[1:])
        dist[v] = 0.0
        hops[v] = 0
        frontier[v] = True
    rounds = 0
    while frontier.any():
        rounds += 1
        m = frontier[s]
        ss, dd = s[m], d[m]
        cd = dist[ss] + w[m]
        ch = hops[ss] + 1
        # per-dst lexicographic (dist, hops) min: sort by (dst, dist, hops),
        # keep the first row of each dst run
        order = np.lexsort((ch, cd, dd))
        dd, cd, ch = dd[order], cd[order], ch[order]
        first = np.ones(len(dd), dtype=bool)
        first[1:] = dd[1:] != dd[:-1]
        dd, cd, ch = dd[first], cd[first], ch[first]
        imp = (cd < dist[dd]) | ((cd == dist[dd]) & (ch < hops[dd]))
        frontier = np.zeros(NUM_V, dtype=bool)
        dist[dd[imp]] = cd[imp]
        hops[dd[imp]] = ch[imp]
        frontier[dd[imp]] = True
    return dist, hops, rounds


def _dijkstra_lex(s, d, w):
    """Settled-pair lexicographic Dijkstra (independent algorithm)."""
    order = np.argsort(s, kind="stable")
    s, d, w = s[order], d[order], w[order]
    indptr = np.zeros(NUM_V + 1, dtype=np.int64)
    np.add.at(indptr, s + 1, 1)
    np.cumsum(indptr, out=indptr)
    INF = float("inf")
    dist = np.full(NUM_V, INF, dtype=np.float64)
    hops = np.full(NUM_V, -1, dtype=np.int64)
    heap = []
    for src in SOURCES:
        v = int(src[1:])
        dist[v] = 0.0
        hops[v] = 0
        heap.append((0.0, 0, v))
    heapq.heapify(heap)
    while heap:
        dv, hv, v = heapq.heappop(heap)
        if (dv, hv) != (dist[v], hops[v]):
            continue  # stale entry
        for k in range(indptr[v], indptr[v + 1]):
            u = d[k]
            nd, nh = dv + w[k], hv + 1
            if nd < dist[u] or (nd == dist[u] and nh < hops[u]):
                dist[u] = nd
                hops[u] = nh
                heapq.heappush(heap, (nd, nh, u))
    return dist, hops


def main() -> None:
    spark = get_spark(
        app_name="sf1_sssp",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = powerlaw_edges(spark, NUM_V, NUM_E).persist()
    nodes = vertex_table(spark, NUM_V).persist()
    m = edges.count()
    nodes.count()
    edges.write.mode("overwrite").parquet(SCRATCH)

    from k2_18_spark.graph import sssp as sssp_mod
    from k2_18_spark.graph.sssp import sssp

    t0 = time.monotonic()
    got = sssp(
        spark, edges, SOURCES, nodes=nodes, weight_mode="weight"
    ).toPandas()
    engine_wall = time.monotonic() - t0
    supersteps = sssp_mod.LAST_RUN_ITERATIONS
    spark.stop()

    t1 = time.monotonic()
    s, d, w = _load_csr()
    bf_dist, bf_hops, bf_rounds = _bellman_ford_lex(s, d, w)
    dj_dist, dj_hops = _dijkstra_lex(s, d, w)
    oracle_wall = time.monotonic() - t1

    INF = float("inf")
    want_ids = np.flatnonzero(bf_dist < INF)
    got_idx = got["id"].str.slice(1).astype(np.int64).to_numpy()
    got_dist = got["distance"].to_numpy(np.float64)
    got_hops = got["hops"].to_numpy(np.int64)
    reach_ok = set(got_idx.tolist()) == set(want_ids.tolist())
    o = np.argsort(got_idx)
    got_idx, got_dist, got_hops = got_idx[o], got_dist[o], got_hops[o]

    # primary: the recurrence replay must be bit-exact on BOTH columns
    bf_dist_ok = reach_ok and bool(np.array_equal(got_dist, bf_dist[got_idx]))
    bf_hops_ok = reach_ok and bool(np.array_equal(got_hops, bf_hops[got_idx]))

    # secondary: Dijkstra distances bit-exact + same reached set; hops
    # engine <= Dijkstra everywhere (lex dominance), collisions counted
    dj_reach_ok = set(want_ids.tolist()) == set(
        np.flatnonzero(dj_dist < INF).tolist()
    )
    dj_dist_ok = reach_ok and bool(np.array_equal(got_dist, dj_dist[got_idx]))
    hop_delta = got_hops - dj_hops[got_idx] if reach_ok else np.array([1])
    dj_dominated = bool((hop_delta <= 0).all())
    collisions = int((hop_delta != 0).sum()) if reach_ok else -1

    ok = (
        reach_ok and bf_dist_ok and bf_hops_ok
        and dj_reach_ok and dj_dist_ok and dj_dominated
    )

    detail = (
        f"{m} edges, {len(want_ids)} reached from {SOURCES}, "
        f"{supersteps} engine supersteps / {bf_rounds} oracle rounds; "
        f"BF replay: dist bit-exact={bf_dist_ok}, hops exact={bf_hops_ok}; "
        f"Dijkstra: dist bit-exact={dj_dist_ok}, engine lex-dominates="
        f"{dj_dominated}, float-tie hop collisions={collisions}"
    )
    print(f"[sf1_sssp] ok={ok} engine={engine_wall:.1f}s "
          f"oracle={oracle_wall:.1f}s {detail}", flush=True)

    data = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            data = json.load(fh)
    data.setdefault("checks", {})["sssp_sf1"] = {
        "ok": bool(ok),
        "wall_sec": round(engine_wall + oracle_wall, 1),
        "engine_wall_sec": round(engine_wall, 1),
        "oracle_wall_sec": round(oracle_wall, 1),
        "detail": detail,
    }
    with open(OUT, "w") as fh:
        json.dump(data, fh, indent=1)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
