#!/usr/bin/env python
"""sf1 spot-check leg for DOULION sampled triangle counting
(graph/triangles.py doulion_triangles, G8 scale tier) at 1M vertices /
15M edges — the same seeded power-law graph whose EXACT triangle count
is already pinned at 10,551 by the round-4 `triangle_count` sf1 row.

Two assertions:
  1. Register parity: a DuckDB replay of the deterministic md5-coin
     sample (the sf0.01 `graph_doulion` oracle transplanted to the
     exported edge table, p=0.25) must match the engine bit-for-bit on
     all four output columns (n_edges, n_kept, tri_sampled, estimate).
  2. Estimator accuracy: estimate/8³... i.e. tri_sampled/p³ must land
     within 30% of the exact 10,551 (Tsourakakis KDD'09 concentration:
     relative std ≈ sqrt((1/p³−1)/T) ≈ 7.7% here; the coin is
     deterministic, so this is a fixed, reproducible number).

Result row ``doulion_sf1`` merges into CORRECTNESS_sf1_spotcheck.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_V = int(os.environ.get("SF1_V", 1_000_000))
NUM_E = int(os.environ.get("SF1_E", 15_000_000))
P = 0.25
OUT = os.environ.get(
    "SF1_OUT",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "CORRECTNESS_sf1_spotcheck.json"),
)
SCRATCH = os.environ.get("SF1_SCRATCH", "/tmp/sf1_doulion_edges.parquet")
EXACT_TRIANGLES = 10_551  # round-4 sf1 `triangle_count` row, both engines


def main() -> None:
    from k2_18_spark.graph.triangles import doulion_triangles
    from k2_18_spark.io.synth import powerlaw_edges
    from k2_18_spark.session import get_spark

    spark = get_spark(
        app_name="sf1_doulion",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = powerlaw_edges(spark, NUM_V, NUM_E).persist()
    edges.count()
    edges.write.mode("overwrite").parquet(SCRATCH)

    t0 = time.monotonic()
    got = doulion_triangles(spark, edges, p=P).collect()[0].asDict()
    engine_wall = time.monotonic() - t0
    spark.stop()

    thr = format(int(P * (16 ** 15)), "015x")
    scale = 1.0 / (P ** 3)
    t1 = time.monotonic()
    import duckdb

    want = duckdb.connect().sql(
        f"""
        WITH und AS (
            SELECT DISTINCT LEAST(src_id, dst_id) AS a,
                   GREATEST(src_id, dst_id) AS b
            FROM '{SCRATCH}/*.parquet' WHERE src_id <> dst_id
        ),
        kept AS (
            SELECT a, b FROM und
            WHERE substr(md5('doulion|' || a || '|' || b), 1, 15) < '{thr}'
        ),
        deg AS (
            SELECT v, COUNT(*) AS deg FROM (
                SELECT a AS v FROM kept UNION ALL SELECT b FROM kept
            ) GROUP BY 1
        ),
        orient AS (
            SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND u.a < u.b)
                        THEN u.a ELSE u.b END AS lo,
                   CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND u.a < u.b)
                        THEN u.b ELSE u.a END AS hi
            FROM kept u
            JOIN deg da ON u.a = da.v
            JOIN deg db ON u.b = db.v
        ),
        tri AS (
            SELECT COUNT(*) AS c
            FROM orient e1
            JOIN orient e2 ON e1.lo = e2.lo AND e1.hi < e2.hi
            WHERE EXISTS (
                SELECT 1 FROM kept u
                WHERE u.a = LEAST(e1.hi, e2.hi) AND u.b = GREATEST(e1.hi, e2.hi)
            )
        )
        SELECT CAST((SELECT COUNT(*) FROM und) AS BIGINT) AS n_edges,
               CAST((SELECT COUNT(*) FROM kept) AS BIGINT) AS n_kept,
               CAST(tri.c AS BIGINT) AS tri_sampled,
               ROUND(CAST(tri.c AS DOUBLE) * {scale!r}, 6) AS estimate
        FROM tri
        """
    ).df().iloc[0].to_dict()
    oracle_wall = time.monotonic() - t1

    cols = ["n_edges", "n_kept", "tri_sampled", "estimate"]
    mism = [c for c in cols if got[c] != want[c]]
    rel_err = abs(got["estimate"] - EXACT_TRIANGLES) / EXACT_TRIANGLES
    ok = not mism and rel_err <= 0.30

    detail = (
        f"p={P}: engine {dict((c, got[c]) for c in cols)}, "
        f"register mismatches={mism or 'none'}, exact={EXACT_TRIANGLES}, "
        f"relative err={rel_err:.4f}"
    )
    print(f"[sf1_doulion] ok={ok} engine={engine_wall:.1f}s "
          f"oracle={oracle_wall:.1f}s {detail}", flush=True)

    data = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            data = json.load(fh)
    data.setdefault("checks", {})["doulion_sf1"] = {
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
