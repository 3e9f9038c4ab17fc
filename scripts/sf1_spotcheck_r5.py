#!/usr/bin/env python
"""Round-5 additions to the sf1 spot-check: the four flagships that had
no at-scale evidence row yet (VERDICT r4 task 7 + task 6).

- seeded_lpa@4   engine directed seeded label propagation at 1M/15M vs
                 a pandas/numpy replica of the documented synchronous
                 trajectory (vote_round=9 on both sides)
- spam_mass      engine TrustRank + spam mass to tol=1e-6 convergence
                 vs a numpy power-iteration replica of the same
                 stopping rule (uniform-dangling PR, seed-dangling TR)
- winnow_100k    engine winnowing fingerprints over 100k synthetic
                 docs with planted shared blocks vs the verbatim
                 sf0.01 driver oracle (__spark_entry__ doc_winnow)
                 replayed on the exported corpus
- louvain_sf1    distributed Louvain (level/round budgets + the new
                 ΔQ plateau exit) on the 1M/15M graph: wall + Q
                 recorded, ok = Q beats LPA@10 on the same projection

Results are MERGED into CORRECTNESS_sf1_spotcheck.json (the r4 rows
stay; same record shape)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from k2_18_spark.io.synth import powerlaw_edges, vertex_table
from k2_18_spark.session import get_spark

NUM_V = int(os.environ.get("SF1_V", 1_000_000))
NUM_E = int(os.environ.get("SF1_E", 15_000_000))
OUT = os.environ.get(
    "SF1_OUT",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "CORRECTNESS_sf1_spotcheck.json"),
)
SCRATCH = os.environ.get("SF1_SCRATCH", "/tmp/sf1_edges.parquet")

results: dict[str, dict] = {}


def record(name, ok, wall, detail, engine_wall=None, oracle_wall=None):
    results[name] = {"ok": bool(ok), "wall_sec": round(wall, 1),
                     "detail": detail}
    if engine_wall is not None:
        results[name]["engine_wall_sec"] = round(engine_wall, 1)
    if oracle_wall is not None:
        results[name]["oracle_wall_sec"] = round(oracle_wall, 1)
    print(f"[sf1r5] {name}: ok={ok} wall={wall:.1f}s {detail}", flush=True)


def main():
    spark = get_spark(
        app_name="sf1_spotcheck_r5",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")

    edges = powerlaw_edges(spark, NUM_V, NUM_E).persist()
    nodes = vertex_table(spark, NUM_V).persist()
    m_edges = edges.count()
    nodes.count()
    edges.write.mode("overwrite").parquet(SCRATCH)

    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW e AS SELECT * FROM '{SCRATCH}/*.parquet'")

    # -- seeded label propagation, 4 synchronous rounds, directed ------------
    t0 = time.monotonic()
    from k2_18_spark.graph.seeded_lpa import seeded_label_propagation

    seed_rows = sorted({(i * 9973) % NUM_V for i in range(100)})
    seeds_df = spark.createDataFrame(
        [(f"v{s}", f"L{j % 10}") for j, s in enumerate(seed_rows)],
        "id string, label string",
    )
    ssl = seeded_label_propagation(
        spark, edges, seeds_df, max_iter=4, directed=True, vote_round=9
    ).toPandas()
    te = time.monotonic() - t0

    # replica: msg = groupBy(src→nbr, dst→v) Σw on self-loop-free edges;
    # every vertex (non-seed) adopts argmax (Σw desc, label asc) over
    # labeled neighbors each round; seeds frozen; labels stay NULL until
    # reached. Same vote_round=9 rounding before the argmax.
    epw = con.sql(
        "SELECT CAST(substr(src_id, 2, 10) AS BIGINT) s,"
        "       CAST(substr(dst_id, 2, 10) AS BIGINT) d, SUM(weight) w "
        "FROM e WHERE src_id <> dst_id GROUP BY 1, 2"
    ).df()
    es = epw["s"].to_numpy(np.int64)
    ed = epw["d"].to_numpy(np.int64)
    ew = epw["w"].to_numpy(np.float64)
    lab = np.full(NUM_V, -1, dtype=np.int64)
    is_seed = np.zeros(NUM_V, dtype=bool)
    for j, s in enumerate(seed_rows):
        lab[s] = j % 10
        is_seed[s] = True
    for _ in range(4):
        mask = lab[es] >= 0
        votes = (
            pd.DataFrame({"v": ed[mask], "lab": lab[es[mask]],
                          "w": ew[mask]})
            .groupby(["v", "lab"], as_index=False)["w"].sum()
        )
        votes["w"] = votes["w"].round(9)
        votes = votes.sort_values(["v", "w", "lab"],
                                  ascending=[True, False, True])
        best = votes.groupby("v", as_index=False).first()
        upd = best["v"].to_numpy()
        keep = ~is_seed[upd]
        lab[upd[keep]] = best["lab"].to_numpy()[keep]
    # vertex universe = edge endpoints ∪ seeds (the engine takes no
    # nodes table)
    verts = np.zeros(NUM_V, dtype=bool)
    verts[es] = True
    verts[ed] = True
    verts[np.array(seed_rows)] = True
    want = {
        f"v{i}": (None if lab[i] < 0 else f"L{lab[i]}", bool(is_seed[i]))
        for i in np.flatnonzero(verts)
    }
    got = {
        r["id"]: (r["label"], bool(r["is_seed"])) for _, r in ssl.iterrows()
    }
    bad = sum(1 for k, v in want.items() if got.get(k, "MISSING") != v)
    wall = time.monotonic() - t0
    record("seeded_lpa_iter4", bad == 0 and len(got) == len(want), wall,
           f"{len(want)} vertices, {len(seed_rows)} seeds, {bad} mismatches",
           engine_wall=te, oracle_wall=wall - te)

    # -- TrustRank + spam mass to convergence --------------------------------
    t0 = time.monotonic()
    from k2_18_spark.graph.trustrank import spam_mass

    trusted = [f"v{i}" for i in (0, NUM_V // 4, NUM_V // 2, NUM_V - 1)]
    ssm = spam_mass(
        spark, edges, trusted, nodes=nodes, max_iter=100, tol=1e-6
    ).toPandas()
    te = time.monotonic() - t0
    mvw = con.sql(
        "SELECT src_id, dst_id, MAX(weight) w FROM e GROUP BY 1, 2"
    ).df()
    ms = mvw["src_id"].str.slice(1).to_numpy(np.int64)
    md = mvw["dst_id"].str.slice(1).to_numpy(np.int64)
    mw = mvw["w"].to_numpy(np.float64)
    outw = np.zeros(NUM_V)
    np.add.at(outw, ms, mw)
    frac = mw / outw[ms]
    dang = outw == 0.0

    def power_iter(p_vec):
        """engine superstep replica: alpha*contrib + (alpha*dangling
        mass + (1-alpha)) * teleport; stop at L1 delta < n*tol."""
        r = np.full(NUM_V, 1.0 / NUM_V)
        for _ in range(100):
            contrib = np.zeros(NUM_V)
            np.add.at(contrib, md, r[ms] * frac)
            nr = 0.85 * contrib + (0.85 * r[dang].sum() + 0.15) * p_vec
            err = np.abs(nr - r).sum()
            r = nr
            if err < NUM_V * 1e-6:
                break
        return r

    pr_np = power_iter(np.full(NUM_V, 1.0 / NUM_V))
    pvec = np.zeros(NUM_V)
    pvec[[int(s[1:]) for s in trusted]] = 1.0 / len(trusted)
    tr_np = power_iter(pvec)
    gids = ssm["id"].str.slice(1).to_numpy(np.int64)
    bad = int((np.abs(ssm["rank"].to_numpy() - pr_np[gids]) > 1e-9).sum())
    bad += int((np.abs(ssm["trust"].to_numpy() - tr_np[gids]) > 1e-9).sum())
    bad += int(
        (np.abs(ssm["spam_mass"].to_numpy()
                - (pr_np[gids] - tr_np[gids])) > 1e-9).sum()
    )
    bad += int(
        (np.abs(ssm["rel_spam_mass"].to_numpy()
                - (1.0 - tr_np[gids] / pr_np[gids])) > 1e-6).sum()
    )
    wall = time.monotonic() - t0
    record("trustrank_spam_mass", bad == 0 and len(ssm) == NUM_V, wall,
           f"{NUM_V} vertices, {len(trusted)} trust seeds, {bad} mismatches",
           engine_wall=te, oracle_wall=wall - te)

    # -- winnowing fingerprints at 100k docs ---------------------------------
    n_docs = int(os.environ.get("SF1_WINNOW_DOCS", 100_000))
    t0 = time.monotonic()
    from __spark_entry__ import oracle_sql
    from k2_18_spark.operators.winnow import winnow_fingerprints

    # planted structure: every doc shares a corpus-wide block (heavy
    # fingerprint collapse) plus a unique tail; ~190 chars/doc
    wdocs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox jumps over the lazy dog "),
            F.repeat(F.lit("alpha beta gamma delta "), 4),
            F.lit("tail "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    wd_scratch = os.environ.get("SF1_WINNOW_SCRATCH", "/tmp/sf1_windocs.parquet")
    wdocs.write.mode("overwrite").parquet(wd_scratch)
    wdocs_pq = spark.read.parquet(wd_scratch)
    swn = (
        winnow_fingerprints(wdocs_pq.select("doc_id", "text"), k=5, w=4)
        .toPandas()
        .sort_values(["doc_id", "pos", "fp"])
        .reset_index(drop=True)
    )
    te = time.monotonic() - t0
    con.sql(
        f"CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM '{wd_scratch}/*.parquet'"
    )
    own = (
        con.sql(oracle_sql()["doc_winnow"])
        .df()
        .sort_values(["doc_id", "pos", "fp"])
        .reset_index(drop=True)
    )
    ok = (
        len(swn) == len(own)
        and (swn["doc_id"].to_numpy() == own["doc_id"].to_numpy()).all()
        and (swn["pos"].to_numpy() == own["pos"].astype("int64").to_numpy()).all()
        and (swn["fp"].to_numpy() == own["fp"].to_numpy()).all()
    )
    wall = time.monotonic() - t0
    record("winnow_100k", ok, wall,
           f"{n_docs} docs, spark={len(swn)} duckdb={len(own)} fingerprints",
           engine_wall=te, oracle_wall=wall - te)

    # -- distributed Louvain at 1M/15M: wall + Q vs LPA ----------------------
    t0 = time.monotonic()
    from k2_18_spark.graph import louvain_dist
    from k2_18_spark.graph.louvain_dist import louvain_superstep
    from k2_18_spark.graph.lpa import label_propagation
    from k2_18_spark.graph.stats import modularity

    lv = louvain_superstep(
        spark, edges, nodes=nodes, max_levels=3, max_rounds_per_level=6,
        min_round_dq=1e-4,
    )
    lv_cl = lv.select("id", F.col("cluster_id").cast("int").alias("cluster_id"))
    lv_cl = lv_cl.persist()
    lv_cl.count()
    lv_wall = time.monotonic() - t0
    q_louvain = modularity(spark, edges, lv_cl, directed=False)
    lv_levels = list(louvain_dist.LAST_RUN_LEVEL_ROUNDS)
    lv_dq = [round(x, 5) for x in louvain_dist.LAST_RUN_LEVEL_DQ]

    t1 = time.monotonic()
    lp = label_propagation(spark, edges, nodes=nodes, max_iter=10)
    lp_cl = lp.select("id", F.col("cluster_id").cast("int").alias("cluster_id"))
    lp_cl = lp_cl.persist()
    lp_cl.count()
    lp_wall = time.monotonic() - t1
    q_lpa = modularity(spark, edges, lp_cl, directed=False)
    wall = time.monotonic() - t0
    record(
        "louvain_sf1_quality", q_louvain > q_lpa, wall,
        f"louvain Q={q_louvain:.4f} wall={lv_wall:.1f}s "
        f"(levels={lv_levels}, dq={lv_dq}) vs LPA@10 Q={q_lpa:.4f} "
        f"wall={lp_wall:.1f}s",
        engine_wall=lv_wall, oracle_wall=lp_wall,
    )
    lv_cl.unpersist(), lp_cl.unpersist()

    # merge into the existing spot-check artifact
    merged = {"num_vertices": NUM_V, "num_edges": m_edges, "checks": {}}
    if os.path.exists(OUT):
        with open(OUT, encoding="utf-8") as f:
            merged = json.load(f)
    merged.setdefault("checks", {}).update(results)
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(merged, f, indent=2)
    print(f"[sf1r5] merged {len(results)} rows into {OUT}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
