#!/usr/bin/env python
"""Re-verify k-truss at sf1 after the round-5 rework (one-time triangle
incidence + driver-tier cascade finish): same numpy fixpoint replica as
the original sf1 leg, fresh engine run, row merged over `ktruss_k3` in
CORRECTNESS_sf1_spotcheck.json. Both engine tiers are exercised: the
15M-edge input starts distributed (above driver_finish_max_edges), the
post-round-1 survivor set finishes in the driver."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from k2_18_spark.io.synth import powerlaw_edges
from k2_18_spark.session import get_spark

NUM_V = int(os.environ.get("SF1_V", 1_000_000))
NUM_E = int(os.environ.get("SF1_E", 15_000_000))
OUT = os.environ.get(
    "SF1_OUT",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "CORRECTNESS_sf1_spotcheck.json"),
)
SCRATCH = os.environ.get("SF1_SCRATCH", "/tmp/sf1_edges.parquet")
KT_K = int(os.environ.get("SF1_KTRUSS_K", 3))


def main():
    spark = get_spark(
        app_name="sf1_recheck_ktruss",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = powerlaw_edges(spark, NUM_V, NUM_E).persist()
    edges.count()
    edges.write.mode("overwrite").parquet(SCRATCH)

    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW e AS SELECT * FROM '{SCRATCH}/*.parquet'")

    t0 = time.monotonic()
    from k2_18_spark.graph import ktruss as kt

    skt = kt.k_truss(spark, edges, k=KT_K).toPandas()
    te = time.monotonic() - t0
    dist_rounds = kt.LAST_RUN_ROUNDS

    # oracle triangle list (degree-oriented compact-forward, identical
    # to the original sf1 leg) + numpy queue peel
    trip = con.sql("""
        WITH und AS (
            SELECT DISTINCT LEAST(src_id, dst_id) a, GREATEST(src_id, dst_id) b
            FROM e WHERE src_id <> dst_id),
        deg AS (
            SELECT v, COUNT(*) d FROM (
                SELECT a v FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
        o AS (
            SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
                        THEN u.a ELSE u.b END lo,
                   CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
                        THEN u.b ELSE u.a END hi,
                   CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
                        THEN db.d ELSE da.d END dhi
            FROM und u
            JOIN deg da ON da.v = u.a
            JOIN deg db ON db.v = u.b)
        SELECT e1.lo x, e1.hi y, e2.hi z FROM o e1
        JOIN o e2 ON e1.lo = e2.lo
                 AND ((e1.dhi < e2.dhi)
                      OR (e1.dhi = e2.dhi AND e1.hi < e2.hi))
        JOIN o e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
    """).df()
    tx = trip["x"].str.slice(1).to_numpy(dtype=np.int64)
    ty = trip["y"].str.slice(1).to_numpy(dtype=np.int64)
    tz = trip["z"].str.slice(1).to_numpy(dtype=np.int64)
    tris = {tuple(sorted(t)) for t in zip(tx, ty, tz)}
    cur = {p for t in tris for p in
           ((t[0], t[1]), (t[0], t[2]), (t[1], t[2]))}
    while True:
        sup: dict = {}
        live_t = [t for t in tris if
                  (t[0], t[1]) in cur and (t[0], t[2]) in cur
                  and (t[1], t[2]) in cur]
        for t in live_t:
            for p in ((t[0], t[1]), (t[0], t[2]), (t[1], t[2])):
                sup[p] = sup.get(p, 0) + 1
        nxt = {p for p in cur if sup.get(p, 0) >= KT_K - 2}
        if nxt == cur:
            break
        cur, tris = nxt, set(live_t)
    want = {}
    for t in tris:
        for p in ((t[0], t[1]), (t[0], t[2]), (t[1], t[2])):
            if p in cur:
                want[p] = want.get(p, 0) + 1
    got = {
        tuple(sorted((int(r["id_a"][1:]), int(r["id_b"][1:])))): int(r["support"])
        for _, r in skt.iterrows()
    }
    bad = sum(1 for p, s in want.items() if got.get(p) != s)
    ok = bad == 0 and len(got) == len(want)
    wall = time.monotonic() - t0
    detail = (
        f"{len(want)} truss edges, {bad} mismatches, "
        f"{dist_rounds} distributed rounds + driver-tier finish (r5 rework)"
    )
    print(f"[sf1r5] ktruss_k{KT_K}: ok={ok} wall={wall:.1f}s "
          f"engine={te:.1f}s {detail}", flush=True)

    merged = {"num_vertices": NUM_V, "num_edges": NUM_E, "checks": {}}
    if os.path.exists(OUT):
        with open(OUT, encoding="utf-8") as f:
            merged = json.load(f)
    merged.setdefault("checks", {})[f"ktruss_k{KT_K}"] = {
        "ok": bool(ok), "wall_sec": round(wall, 1), "detail": detail,
        "engine_wall_sec": round(te, 1),
        "oracle_wall_sec": round(wall - te, 1),
    }
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(merged, f, indent=2)
    print(f"[sf1r5] updated ktruss_k{KT_K} row in {OUT}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
