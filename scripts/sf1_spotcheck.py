#!/usr/bin/env python
"""Scale-up correctness evidence at sf1.0 (1M vertices / 15M edges).

The driver's CORRECTNESS harness runs at sf0.01; this script re-runs
the same engine-vs-independent-oracle pattern at 100× that scale on
the seeded synthetic power-law graph (no external data):

- degrees        vs DuckDB SQL over the exported edge parquet
- pagerank@5     vs a 5-iteration DuckDB power-iteration CTE
                 (fixed iteration count so the recursive CTE is bounded;
                 values compared rounded to 6 decimals, the engine runs
                 tol=0 to force exactly 5 supersteps)
- components     vs a numpy union-find over the full edge list
                 (exact partition + renumbering equality — DuckDB's
                 transitive-closure oracle would explode at this size)
- triangles      vs DuckDB's oriented two-hop join (global count)
- lpa@10         vs a numpy/pandas replica of the documented
                 semi-synchronous trajectory (vote_round=9 on both
                 sides bridges float summation order)
- minhash_lsh    vs the same DuckDB md5-60 banded-LSH replica the
                 sf0.01 driver oracle uses, on SF1_DOCS synthetic
                 documents with planted near-duplicates (the text is
                 generated once in Spark and exported to parquet, so
                 both sides read identical bytes)

Engine-side and oracle-side walls are recorded separately per check.
Writes CORRECTNESS_sf1_spotcheck.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from k2_18_spark.io.synth import powerlaw_edges, vertex_table
from k2_18_spark.session import get_spark

NUM_V = int(os.environ.get("SF1_V", 1_000_000))
NUM_E = int(os.environ.get("SF1_E", 15_000_000))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "CORRECTNESS_sf1_spotcheck.json")
SCRATCH = os.environ.get("SF1_SCRATCH", "/tmp/sf1_edges.parquet")

results: dict[str, dict] = {}


def record(name, ok, wall, detail, engine_wall=None, oracle_wall=None):
    results[name] = {"ok": bool(ok), "wall_sec": round(wall, 1), "detail": detail}
    if engine_wall is not None:
        results[name]["engine_wall_sec"] = round(engine_wall, 1)
    if oracle_wall is not None:
        results[name]["oracle_wall_sec"] = round(oracle_wall, 1)
    extra = (
        f" engine={engine_wall:.1f}s oracle={oracle_wall:.1f}s"
        if engine_wall is not None and oracle_wall is not None
        else ""
    )
    print(f"[sf1] {name}: ok={ok} wall={wall:.1f}s{extra} {detail}", flush=True)


def main():
    spark = get_spark(app_name="sf1_spotcheck",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    edges = powerlaw_edges(spark, NUM_V, NUM_E).persist()
    nodes = vertex_table(spark, NUM_V).persist()
    m = edges.count()
    nodes.count()
    edges.write.mode("overwrite").parquet(SCRATCH)

    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW e AS SELECT * FROM '{SCRATCH}/*.parquet'")

    # -- degrees ------------------------------------------------------------
    t0 = time.monotonic()
    from k2_18_spark.operators.degrees import degrees

    sdeg = degrees(edges, nodes).select(
        "id", "degree_in", "degree_out"
    ).toPandas().sort_values("id").reset_index(drop=True)
    te = time.monotonic() - t0
    odeg = con.sql("""
        WITH mv AS (
            SELECT src_id, dst_id FROM (
                SELECT src_id, dst_id,
                       ROW_NUMBER() OVER (PARTITION BY src_id, dst_id
                                          ORDER BY weight DESC) rn
                FROM e) WHERE rn = 1
        ),
        verts AS (SELECT UNNEST(RANGE({n})) AS i)
        SELECT 'v' || verts.i AS id,
               CAST(COALESCE(ind.c, 0) AS INT) AS degree_in,
               CAST(COALESCE(outd.c, 0) AS INT) AS degree_out
        FROM verts
        LEFT JOIN (SELECT dst_id, COUNT(*) c FROM mv GROUP BY 1) ind
               ON ind.dst_id = 'v' || verts.i
        LEFT JOIN (SELECT src_id, COUNT(*) c FROM mv GROUP BY 1) outd
               ON outd.src_id = 'v' || verts.i
    """.format(n=NUM_V)).df().sort_values("id").reset_index(drop=True)
    ok = (sdeg["id"].tolist() == odeg["id"].tolist()
          and (sdeg["degree_in"].to_numpy() == odeg["degree_in"].to_numpy()).all()
          and (sdeg["degree_out"].to_numpy() == odeg["degree_out"].to_numpy()).all())
    wall = time.monotonic() - t0
    record("degrees", ok, wall, f"{len(sdeg)} vertices",
           engine_wall=te, oracle_wall=wall - te)

    # -- pagerank, exactly 5 supersteps -------------------------------------
    t0 = time.monotonic()
    from k2_18_spark.graph.pagerank import pagerank

    spr = pagerank(spark, edges, nodes=nodes, max_iter=5, tol=0.0, strict=False)
    spd = spr.select("id", F.round("rank", 6).alias("r")).toPandas()
    te = time.monotonic() - t0
    opr = con.sql("""
        WITH RECURSIVE
        mv AS MATERIALIZED (
            SELECT src_id, dst_id, weight FROM (
                SELECT src_id, dst_id, weight,
                       ROW_NUMBER() OVER (PARTITION BY src_id, dst_id
                                          ORDER BY weight DESC) rn
                FROM e) WHERE rn = 1
        ),
        outw AS MATERIALIZED (
            SELECT src_id, SUM(weight) ow FROM mv GROUP BY 1),
        frac AS MATERIALIZED (
            SELECT mv.src_id, mv.dst_id, mv.weight / outw.ow AS f
            FROM mv JOIN outw USING (src_id)),
        verts AS MATERIALIZED (
            SELECT 'v' || UNNEST(RANGE({n})) AS id),
        dang AS MATERIALIZED (
            SELECT v.id FROM verts v
            LEFT JOIN (SELECT DISTINCT src_id FROM mv) s ON v.id = s.src_id
            WHERE s.src_id IS NULL),
        pr(iter, id, rank) AS (
            SELECT 0, id, CAST(1.0 AS DOUBLE) / {n} FROM verts
            UNION ALL
            SELECT p.iter + 1, p.id,
                   0.85 * COALESCE(c.contrib, CAST(0 AS DOUBLE))
                   + (0.85 * dm.mass / {n} + 0.15 / {n})
            FROM pr p
            LEFT JOIN (
                SELECT p2.iter, f.dst_id AS id, SUM(p2.rank * f.f) contrib
                FROM pr p2 JOIN frac f ON p2.id = f.src_id
                GROUP BY 1, 2) c ON c.id = p.id AND c.iter = p.iter
            JOIN (SELECT p3.iter,
                         COALESCE(SUM(CASE WHEN d.id IS NOT NULL
                                           THEN p3.rank END), 0) mass
                  FROM pr p3 LEFT JOIN dang d ON p3.id = d.id
                  GROUP BY 1) dm ON dm.iter = p.iter
            WHERE p.iter < 5
        )
        SELECT id, ROUND(rank, 6) r FROM pr WHERE iter = 5
    """.format(n=NUM_V)).df()
    sm = dict(zip(spd["id"], spd["r"]))
    om = dict(zip(opr["id"], opr["r"]))
    bad = sum(1 for k in om if abs(sm.get(k, -1) - om[k]) > 1e-9)
    wall = time.monotonic() - t0
    record("pagerank_iter5", bad == 0 and len(sm) == len(om),
           wall, f"{len(om)} vertices, {bad} mismatches",
           engine_wall=te, oracle_wall=wall - te)

    # -- components vs numpy union-find -------------------------------------
    t0 = time.monotonic()
    from k2_18_spark.graph.components import connected_components

    scomp = connected_components(spark, edges, nodes=nodes).toPandas()
    te = time.monotonic() - t0
    ep = edges.select("src_id", "dst_id").toPandas()
    su = ep["src_id"].str.slice(1).to_numpy(dtype=np.int64)
    dv = ep["dst_id"].str.slice(1).to_numpy(dtype=np.int64)
    parent = np.arange(NUM_V, dtype=np.int64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(su.tolist(), dv.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(NUM_V)])
    # renumbering: component id = dense rank of min member index, and
    # min member == root under union-by-min — order of first appearance
    uniq = np.unique(roots)  # sorted ascending = min-member order
    rank_of = {r: i for i, r in enumerate(uniq.tolist())}
    want = {f"v{i}": rank_of[roots[i]] for i in range(NUM_V)}
    got = dict(zip(scomp["id"], scomp["component_id"]))
    bad = sum(1 for k, v in want.items() if got.get(k) != v)
    wall = time.monotonic() - t0
    record("components_unionfind", bad == 0 and len(got) == NUM_V,
           wall, f"{len(np.unique(roots))} components, {bad} mismatches",
           engine_wall=te, oracle_wall=wall - te)

    # -- triangles (global count) -------------------------------------------
    t0 = time.monotonic()
    from k2_18_spark.graph.triangles import triangle_count

    st = triangle_count(spark, edges)
    te = time.monotonic() - t0
    # degree-oriented compact-forward (same skew guard as the engine —
    # a naive two-hop join would blow up on power-law hubs)
    ot = con.sql("""
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
        -- wedge endpoints ordered by the SAME (deg, id) key as the
        -- orientation, so the closing edge is oriented e1.hi -> e2.hi
        SELECT COUNT(*) FROM o e1
        JOIN o e2 ON e1.lo = e2.lo
                 AND ((e1.dhi < e2.dhi)
                      OR (e1.dhi = e2.dhi AND e1.hi < e2.hi))
        JOIN o e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
    """).fetchone()[0]
    wall = time.monotonic() - t0
    record("triangle_count", int(st) == int(ot), wall,
           f"spark={int(st)} duckdb={int(ot)}",
           engine_wall=te, oracle_wall=wall - te)

    # -- LPA, 10 rounds, numpy trajectory replica ---------------------------
    lpa_rounds = int(os.environ.get("SF1_LPA_ROUNDS", 10))
    t0 = time.monotonic()
    from k2_18_spark.graph.lpa import label_propagation

    slpa = label_propagation(
        spark, edges, nodes=nodes, max_iter=lpa_rounds, vote_round=9
    ).toPandas()
    te = time.monotonic() - t0
    # replica: same undirected projection / parity / argmax semantics
    mvp = con.sql("""
        SELECT LEAST(src_id, dst_id) a, GREATEST(src_id, dst_id) b,
               SUM(weight) w
        FROM (SELECT src_id, dst_id, weight, ROW_NUMBER() OVER (
                  PARTITION BY src_id, dst_id ORDER BY weight DESC) rn
              FROM e)
        WHERE rn = 1 AND src_id <> dst_id
        GROUP BY 1, 2
    """).df()
    av = mvp["a"].str.slice(1).to_numpy(dtype=np.int64)
    bv = mvp["b"].str.slice(1).to_numpy(dtype=np.int64)
    wv = mvp["w"].to_numpy(dtype=np.float64)
    V = np.concatenate([av, bv]); Nb = np.concatenate([bv, av])
    W = np.concatenate([wv, wv])
    labels = np.arange(NUM_V, dtype=np.int64)
    for it in range(lpa_rounds):
        par = it % 2
        mask = (V % 2) == par
        v_, nb_, w_ = V[mask], Nb[mask], W[mask]
        lab = labels[nb_]
        import pandas as pd

        votes = pd.DataFrame({"v": v_, "lab": lab, "w": w_}).groupby(
            ["v", "lab"], as_index=False)["w"].sum()
        votes["w"] = votes["w"].round(9)
        votes = votes.sort_values(
            ["v", "w", "lab"], ascending=[True, False, True])
        best = votes.groupby("v", as_index=False).first()
        labels[best["v"].to_numpy()] = best["lab"].to_numpy()
    # renumber: cluster id = dense rank of min member ord == dense rank
    # of label value (labels ARE min-ord under argmax trajectory? no —
    # renumber by min member ord, replicating _renumber)
    import pandas as pd

    lab_df = pd.DataFrame({"ord": np.arange(NUM_V), "label": labels})
    min_ord = lab_df.groupby("label", as_index=False)["ord"].min().rename(
        columns={"ord": "mo"})
    min_ord = min_ord.sort_values("mo").reset_index(drop=True)
    min_ord["cid"] = range(len(min_ord))
    lab_df = lab_df.merge(min_ord[["label", "cid"]], on="label")
    want = dict(zip("v" + lab_df["ord"].astype(str), lab_df["cid"]))
    got = dict(zip(slpa["id"], slpa["cluster_id"]))
    bad = sum(1 for k, v in want.items() if got.get(k) != v)
    wall = time.monotonic() - t0
    record(f"lpa_iter{lpa_rounds}_trajectory", bad == 0 and len(got) == NUM_V,
           wall, f"{bad} mismatches",
           engine_wall=te, oracle_wall=wall - te)

    # -- MinHash-LSH pairs vs the md5-60 DuckDB replica ---------------------
    # Synthetic documents with planted near-duplicates (doc_id % 10 == 1
    # repeats doc_id-1's words except the trailing token): text is
    # generated ONCE in Spark and exported to parquet so engine and
    # oracle read identical bytes. The oracle SQL is the very string the
    # sf0.01 driver row uses (__spark_entry__._minhash_oracle).
    n_docs = int(os.environ.get("SF1_DOCS", 100_000))
    t0 = time.monotonic()
    from __spark_entry__ import _minhash_oracle
    from k2_18_spark.operators.dedup import minhash_lsh_pairs

    base = F.when(
        F.pmod(F.col("doc_id"), F.lit(10)) == 1, F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(28)),
        lambda j: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(base, j), F.lit(50_000))
        ),
    )
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.array_join(words, " "),
                F.concat(F.lit("t"), F.col("doc_id")),
            ).alias("text"),
        )
    )
    doc_scratch = os.environ.get("SF1_DOC_SCRATCH", "/tmp/sf1_docs.parquet")
    docs.write.mode("overwrite").parquet(doc_scratch)
    docs_pq = spark.read.parquet(doc_scratch)
    smh = (
        minhash_lsh_pairs(docs_pq, threshold=0.5, token_hash="md5_60")
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    te = time.monotonic() - t0
    con.sql(
        f"CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM '{doc_scratch}/*.parquet'"
    )
    omh = (
        con.sql(_minhash_oracle())
        .df()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    ok = (
        len(smh) == len(omh)
        and smh["doc_a"].tolist() == omh["doc_a"].tolist()
        and smh["doc_b"].tolist() == omh["doc_b"].tolist()
        and (smh["jaccard"].to_numpy() == omh["jaccard"].to_numpy()).all()
    )
    wall = time.monotonic() - t0
    record("minhash_lsh_pairs", ok, wall,
           f"{n_docs} docs, spark={len(smh)} duckdb={len(omh)} pairs",
           engine_wall=te, oracle_wall=wall - te)

    # -- planted near-dup recall (independent of the replica) ---------------
    t0 = time.monotonic()
    got_pairs = set(zip(smh["doc_a"].tolist(), smh["doc_b"].tolist()))
    planted = {(i - 1, i) for i in range(1, n_docs, 10)}
    missing = len(planted - got_pairs)
    record("minhash_planted_recall", missing == 0, time.monotonic() - t0,
           f"{len(planted)} planted near-dup pairs, {missing} missed")

    # -- north-rule pages pipeline at 1M urls -------------------------------
    # Synthesize → pandas-UDF extraction → href mining at SF1_PAGES
    # documents, then replay the EXACT sf0.01 driver oracle (__spark_
    # entry__.oracle_sql()["pages_linkgraph"]) against the exported
    # corpus: the oracle reconstructs the post-extraction text and the
    # link rules independently, so text_md5 equality is a byte-level
    # check of the extractor on every one of the million urls.
    n_pages = int(os.environ.get("SF1_PAGES", 1_000_000))
    t0 = time.monotonic()
    import pandas as pd
    from __spark_entry__ import oracle_sql, queries

    pwords = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda j: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("doc_id"), j), F.lit(50_000))
        ),
    )
    pdocs = spark.range(n_pages).select(
        F.col("id").alias("doc_id"),
        F.array_join(pwords, " ").alias("text"),
        F.lit("en").alias("lang"),
    )
    pages_dir = os.environ.get("SF1_PAGES_SCRATCH", "/tmp/sf1_pages_sfdir")
    pdocs.write.mode("overwrite").parquet(
        os.path.join(pages_dir, "documents.parquet")
    )
    spg = (
        queries()["pages_linkgraph"](spark, pages_dir)
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    te = time.monotonic() - t0
    con.sql(
        f"CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(pages_dir, 'documents.parquet')}/*.parquet'"
    )
    opg = (
        con.sql(oracle_sql()["pages_linkgraph"])
        .df()
        .sort_values("url")
        .reset_index(drop=True)
    )
    bad = 0
    for c in ("url", "text_md5", "text_len", "out_deg", "in_deg"):
        bad += int(
            (spg[c].to_numpy() != opg[c].astype(spg[c].dtype).to_numpy()).sum()
        )
    wall = time.monotonic() - t0
    record("pages_extract_mine", bad == 0 and len(spg) == n_pages, wall,
           f"{n_pages} urls, {bad} field mismatches",
           engine_wall=te, oracle_wall=wall - te)

    # -- ANF sketches, exactly 3 rounds, bit-exact at 15M edges --------------
    # Every Flajolet-Martin register of every vertex after exactly 3
    # OR-propagation rounds, engine vs the same SQL unrolling the
    # sf0.01 driver oracle uses (__spark_entry__._anf_oracle), here
    # pointed at the exported 15M-edge parquet. Integer equality on
    # 8 registers + nf_bits per vertex — no tolerance anywhere.
    t0 = time.monotonic()
    from __spark_entry__ import _ANF_R, _anf_bits_sql, _anf_oracle
    from k2_18_spark.graph.anf import anf

    sanf = (
        anf(spark, edges, registers=_ANF_R, fixed_rounds=3)
        .sketches.drop("nf_estimate")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    te = time.monotonic() - t0
    anf_sql = _anf_oracle(
        3,
        "SELECT id, "
        + ", ".join(f"s{r}" for r in range(_ANF_R))
        + f", CAST({_anf_bits_sql()} AS BIGINT) AS nf_bits FROM s3",
        edges_sql=(
            "SELECT DISTINCT src_id, dst_id FROM e WHERE src_id <> dst_id"
        ),
    )
    oanf = con.sql(anf_sql).df().sort_values("id").reset_index(drop=True)
    bad = int((sanf["id"].to_numpy() != oanf["id"].to_numpy()).sum())
    for c in [f"s{r}" for r in range(_ANF_R)] + ["nf_bits"]:
        bad += int(
            (sanf[c].to_numpy() != oanf[c].astype("int64").to_numpy()).sum()
        )
    wall = time.monotonic() - t0
    record("anf_3round_sketches", bad == 0 and len(sanf) == len(oanf), wall,
           f"{len(sanf)} vertices x {_ANF_R} registers, {bad} mismatches",
           engine_wall=te, oracle_wall=wall - te)

    # -- k-core decomposition at 15M edges -----------------------------------
    # Engine peeling loop vs a numpy replica of the same fixpoint
    # (vectorized whole-round peel over the mirrored edge array —
    # independent code path, exact integer (id, degree) equality).
    # k=10 on the power-law graph keeps a dense hub core and peels the
    # long tail through a multi-round cascade.
    kc_k = int(os.environ.get("SF1_KCORE_K", 10))
    t0 = time.monotonic()
    from k2_18_spark.graph.kcore import k_core

    skc = k_core(spark, edges, k=kc_k).toPandas()
    te = time.monotonic() - t0
    # numpy replica on the simple undirected projection
    a0 = np.minimum(su, dv)
    b0 = np.maximum(su, dv)
    keep_e = a0 != b0
    pair = np.unique(a0[keep_e].astype(np.int64) * NUM_V + b0[keep_e])
    ea, eb = pair // NUM_V, pair % NUM_V
    alive = np.ones(NUM_V, dtype=bool)
    e_alive = np.ones(len(ea), dtype=bool)
    rounds = 0
    while True:
        deg = np.bincount(ea[e_alive], minlength=NUM_V) + np.bincount(
            eb[e_alive], minlength=NUM_V
        )
        peel = alive & (deg < kc_k)
        if not peel.any():
            break
        alive &= ~peel
        e_alive &= alive[ea] & alive[eb]
        rounds += 1
    deg = np.bincount(ea[e_alive], minlength=NUM_V) + np.bincount(
        eb[e_alive], minlength=NUM_V
    )
    want_kc = {f"v{i}": int(deg[i]) for i in np.flatnonzero(deg >= kc_k)}
    got_kc = dict(zip(skc["id"], skc["degree"].astype(int)))
    bad = sum(1 for kk, vv in want_kc.items() if got_kc.get(kk) != vv)
    wall = time.monotonic() - t0
    record(f"kcore_k{kc_k}", bad == 0 and len(got_kc) == len(want_kc), wall,
           f"{len(want_kc)} core vertices, {rounds} peel rounds, "
           f"{bad} mismatches",
           engine_wall=te, oracle_wall=wall - te)

    # -- personalized PageRank, exactly 5 supersteps --------------------------
    # Engine superstep loop vs a numpy replica of the same fixpoint
    # (vectorized contribution scatter per iteration; identical dedup —
    # max weight per (src, dst) — via DuckDB on the scratch parquet).
    ppr_seeds = [f"v{i}" for i in (0, NUM_V // 8, NUM_V - 1)]
    t0 = time.monotonic()
    from k2_18_spark.graph.pagerank import personalized_pagerank

    sppr = personalized_pagerank(
        spark, edges, ppr_seeds, nodes=nodes, max_iter=5, tol=0.0, strict=False
    ).toPandas()
    te = time.monotonic() - t0
    mvw = con.sql(
        "SELECT src_id, dst_id, MAX(weight) w FROM e GROUP BY 1, 2"
    ).df()
    ms = mvw["src_id"].str.slice(1).to_numpy(dtype=np.int64)
    md = mvw["dst_id"].str.slice(1).to_numpy(dtype=np.int64)
    mw = mvw["w"].to_numpy(dtype=np.float64)
    outw = np.zeros(NUM_V)
    np.add.at(outw, ms, mw)
    frac = mw / outw[ms]
    dang = outw == 0.0
    p = np.zeros(NUM_V)
    p[[int(s[1:]) for s in ppr_seeds]] = 1.0 / len(ppr_seeds)
    r = np.full(NUM_V, 1.0 / NUM_V)
    for _ in range(5):
        contrib = np.zeros(NUM_V)
        np.add.at(contrib, md, r[ms] * frac)
        r = 0.85 * contrib + (0.85 * r[dang].sum() + 0.15) * p
    got_ppr = dict(zip(sppr["id"], sppr["rank"]))
    bad = sum(
        1 for i in range(NUM_V) if abs(got_ppr.get(f"v{i}", -1.0) - r[i]) > 1e-9
    )
    wall = time.monotonic() - t0
    record("ppr_iter5", bad == 0 and len(got_ppr) == NUM_V, wall,
           f"{NUM_V} vertices, seeds {ppr_seeds}, {bad} mismatches",
           engine_wall=te, oracle_wall=wall - te)

    # -- clustering coefficient + k-truss (share one oracle triangle list) ----
    # The 15M-edge graph has only ~10k triangles, so the DuckDB side
    # materializes the full triangle LIST once (same degree-oriented
    # compact-forward as the count check) and numpy derives both
    # per-vertex clustering and per-edge truss support from it.
    t_all = time.monotonic()
    con.sql("""
        CREATE TABLE tri AS
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
    """)
    trip = con.sql("SELECT x, y, z FROM tri").df()
    tri_oracle_wall = time.monotonic() - t_all
    tx = trip["x"].str.slice(1).to_numpy(dtype=np.int64)
    ty = trip["y"].str.slice(1).to_numpy(dtype=np.int64)
    tz = trip["z"].str.slice(1).to_numpy(dtype=np.int64)
    # simple-projection degrees (reuse the deduped mvw pull from the
    # ppr leg: max-weight collapse keeps the same (src,dst) pair set)
    pa = np.minimum(ms, md); pb = np.maximum(ms, md)
    keep = pa != pb
    upair = np.unique(pa[keep] * NUM_V + pb[keep])
    ua, ub = upair // NUM_V, upair % NUM_V
    udeg = np.bincount(ua, minlength=NUM_V) + np.bincount(ub, minlength=NUM_V)

    # clustering: engine vs numpy 2T/(d(d-1))
    t0 = time.monotonic()
    from k2_18_spark.graph.triangles import clustering_coefficient

    scl = clustering_coefficient(spark, edges, nodes).toPandas()
    te = time.monotonic() - t0
    tcount = np.zeros(NUM_V, dtype=np.int64)
    for arr in (tx, ty, tz):
        tcount += np.bincount(arr, minlength=NUM_V)
    with np.errstate(divide="ignore", invalid="ignore"):
        want_c = np.where(
            udeg >= 2, 2.0 * tcount / (udeg * (udeg - 1.0)), 0.0
        )
    got_ids = scl["id"].str.slice(1).to_numpy(dtype=np.int64)
    bad = int(
        (np.abs(scl["clustering"].to_numpy() - want_c[got_ids]) > 1e-12).sum()
    ) + int((scl["degree"].to_numpy() != udeg[got_ids]).sum())
    wall = time.monotonic() - t0 + tri_oracle_wall
    record("clustering_coefficient", bad == 0 and len(scl) == NUM_V, wall,
           f"{NUM_V} vertices, {int(tcount.sum()) // 3} triangles, "
           f"{bad} mismatches",
           engine_wall=te, oracle_wall=wall - te)

    # k-truss k=3: numpy peel on the (tiny) triangle-supported edge set
    kt_k = int(os.environ.get("SF1_KTRUSS_K", 3))
    t0 = time.monotonic()
    from k2_18_spark.graph.ktruss import k_truss

    skt = k_truss(spark, edges, k=kt_k).toPandas()
    te = time.monotonic() - t0
    tris = {tuple(sorted(t)) for t in zip(tx, ty, tz)}
    cur = {p for t in tris for p in
           ((t[0], t[1]), (t[0], t[2]), (t[1], t[2]))}
    # edges outside any triangle have support 0 — they survive only
    # at k=2; at k>=3 the peel starts from the triangle-supported set,
    # but the full edge set feeds round 1's support (superset: edges
    # with no triangles can't gain support later)
    while True:
        sup: dict = {}
        live_t = [t for t in tris if
                  (t[0], t[1]) in cur and (t[0], t[2]) in cur
                  and (t[1], t[2]) in cur]
        for t in live_t:
            for p in ((t[0], t[1]), (t[0], t[2]), (t[1], t[2])):
                sup[p] = sup.get(p, 0) + 1
        nxt = {p for p in cur if sup.get(p, 0) >= kt_k - 2}
        if nxt == cur:
            break
        cur, tris = nxt, set(live_t)
    want_kt = {}
    for t in tris:
        for p in ((t[0], t[1]), (t[0], t[2]), (t[1], t[2])):
            if p in cur:
                want_kt[p] = want_kt.get(p, 0) + 1
    # engine canonicalizes by STRING id order ('v10' < 'v2'); renormalize
    # to numeric order to match the replica's keys
    got_kt = {
        tuple(sorted((int(r["id_a"][1:]), int(r["id_b"][1:])))): int(r["support"])
        for _, r in skt.iterrows()
    }
    bad = sum(1 for p, s in want_kt.items() if got_kt.get(p) != s)
    wall = time.monotonic() - t0
    record(f"ktruss_k{kt_k}", bad == 0 and len(got_kt) == len(want_kt), wall,
           f"{len(want_kt)} truss edges, {bad} mismatches",
           engine_wall=te, oracle_wall=wall - te)

    # -- host-graph rollup over the SAME 1M-url corpus ------------------------
    # Re-synthesize across 16 hosts, mine with the any-host regexp and
    # roll up to host pairs; replay the sf0.01 driver oracle
    # (host_linkgraph: arithmetic link rules grouped by host) against
    # the documents view the pages leg already registered.
    t0 = time.monotonic()
    shl = (
        queries()["host_linkgraph"](spark, pages_dir)
        .toPandas()
        .sort_values(["src_host", "dst_host"])
        .reset_index(drop=True)
    )
    te = time.monotonic() - t0
    ohl = (
        con.sql(oracle_sql()["host_linkgraph"])
        .df()
        .sort_values(["src_host", "dst_host"])
        .reset_index(drop=True)
    )
    bad = 0 if len(shl) == len(ohl) else 1
    if bad == 0:
        for c in ("src_host", "dst_host", "n_links", "weight"):
            bad += int(
                (shl[c].to_numpy() != ohl[c].astype(shl[c].dtype).to_numpy()).sum()
            )
    wall = time.monotonic() - t0
    record("host_rollup", bad == 0, wall,
           f"{n_pages} urls -> {len(shl)} host pairs, "
           f"{int(shl['n_links'].sum())} links, {bad} mismatches",
           engine_wall=te, oracle_wall=wall - te)

    # -- eigenvector centrality, exactly 5 rounds, at 15M edges --------------
    # Engine (A^T + I) power iteration vs a numpy scatter replica on
    # the weight-summed collapsed pair list (the engine's groupBy-sum
    # adjacency semantics), compared at 1e-6 after L2 normalization.
    t0 = time.monotonic()
    from k2_18_spark.graph.eigenvector import eigenvector_centrality

    sev = (
        eigenvector_centrality(spark, edges, nodes, fixed_iter=5)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    te = time.monotonic() - t0
    evw = con.sql(
        "SELECT src_id, dst_id, SUM(weight) w FROM e GROUP BY 1, 2"
    ).df()
    es = evw["src_id"].str.slice(1).to_numpy(dtype=np.int64)
    ed = evw["dst_id"].str.slice(1).to_numpy(dtype=np.int64)
    ew = evw["w"].to_numpy(dtype=np.float64)
    x = np.full(NUM_V, 1.0 / NUM_V)
    for _ in range(5):
        xr = x.copy()
        np.add.at(xr, ed, x[es] * ew)
        x = xr / np.sqrt((xr * xr).sum())
    got_ids = sev["id"].str.slice(1).to_numpy(dtype=np.int64)
    bad = int(
        (np.abs(sev["eigenvector_centrality"].to_numpy() - x[got_ids]) > 1e-6).sum()
    )
    wall = time.monotonic() - t0
    record("eigenvector_iter5", bad == 0 and len(sev) == NUM_V, wall,
           f"{NUM_V} vertices, {bad} mismatches",
           engine_wall=te, oracle_wall=wall - te)

    # -- bow-tie decomposition on the 15M-edge power-law graph ---------------
    # Independent numpy-BFS replica: reachability closures are frontier
    # BFS over the int-encoded edge arrays; the giant-SCC candidate is
    # F(seed) ∩ B(seed) for the max-out-degree seed. The check is sound,
    # not assumed: if the engine's largest SCC differed from the
    # replica's candidate (seed outside the giant SCC, or a tie broken
    # differently), the per-vertex label comparison below goes red.
    t0 = time.monotonic()
    from k2_18_spark.graph.bowtie import bowtie_decomposition

    sbt = (
        bowtie_decomposition(spark, edges, nodes=nodes)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    te = time.monotonic() - t0
    epairs = con.sql(
        "SELECT DISTINCT src_id, dst_id FROM e WHERE src_id <> dst_id"
    ).df()
    bs = epairs["src_id"].str.slice(1).to_numpy(dtype=np.int64)
    bd = epairs["dst_id"].str.slice(1).to_numpy(dtype=np.int64)

    def np_reach(seed_mask, srcs, dsts, blocked=None):
        visited = seed_mask.copy()
        if blocked is not None:
            frontier = seed_mask & ~blocked
        else:
            frontier = seed_mask.copy()
        while frontier.any():
            hits = dsts[frontier[srcs]]
            nxt = np.zeros(NUM_V, dtype=bool)
            nxt[hits] = True
            nxt &= ~visited
            if blocked is not None:
                nxt &= ~blocked
            if not nxt.any():
                break
            visited |= nxt
            frontier = nxt
        return visited

    outdeg = np.bincount(bs, minlength=NUM_V)
    seed = int(outdeg.argmax())
    sm = np.zeros(NUM_V, dtype=bool)
    sm[seed] = True
    f_seed = np_reach(sm, bs, bd)
    b_seed = np_reach(sm, bd, bs)
    core = f_seed & b_seed
    fwd = np_reach(core, bs, bd)
    bwd = np_reach(core, bd, bs)
    in_set = bwd & ~fwd
    out_set = fwd & ~bwd
    f_or_b = fwd | bwd
    fin = np_reach(in_set, bs, bd, blocked=f_or_b) & ~f_or_b & ~in_set
    bout = np_reach(out_set, bd, bs, blocked=f_or_b) & ~f_or_b & ~out_set
    sym_s, sym_d = np.concatenate([bs, bd]), np.concatenate([bd, bs])
    weak = np_reach(f_or_b | fin | bout, sym_s, sym_d)
    region = np.full(NUM_V, "DISCONNECTED", dtype=object)
    region[weak] = "TENDRIL_OTHER"
    region[fin & bout] = "TUBE"
    region[fin & ~bout] = "TENDRIL_IN"
    region[bout & ~fin] = "TENDRIL_OUT"
    region[in_set] = "IN"
    region[out_set] = "OUT"
    region[core] = "CORE"
    got_ids = sbt["id"].str.slice(1).to_numpy(dtype=np.int64)
    bad = int((sbt["region"].to_numpy() != region[got_ids]).sum())
    from collections import Counter

    sizes = Counter(region.tolist())
    wall = time.monotonic() - t0
    record("bowtie", bad == 0 and len(sbt) == NUM_V, wall,
           f"{NUM_V} vertices, core={sizes['CORE']}, "
           f"in={sizes['IN']}, out={sizes['OUT']}, {bad} mismatches",
           engine_wall=te, oracle_wall=wall - te)

    # -- redirect resolution at 1M urls (pointer doubling) -------------------
    # Deterministic map over u0..u{NUM_V-1}: within blocks of 64,
    # m=1..48 chain down to the m=0 terminal (chains up to 48 hops —
    # straddling max_hops=40), m=49/50/51 form a 3-cycle, the rest
    # don't redirect. Engine resolves in ⌈log2(40)⌉+1 = 7 doubling
    # supersteps; the replica follows pointers one hop at a time,
    # vectorized over all sources simultaneously (41 numpy steps).
    t0 = time.monotonic()
    import pandas as pd

    from k2_18_spark.pipeline.redirects import resolve_redirects

    MAXH = 40
    rid = F.col("id")
    rm = F.pmod(rid, F.lit(64))
    rdst = (
        F.when(rm.between(1, 48), rid - 1)
        .when(rm.isin(49, 50), rid + 1)
        .when(rm == 51, rid - 2)
    )
    red_df = (
        spark.range(NUM_V)
        .select(
            F.concat(F.lit("u"), rid.cast("string")).alias("src_url"),
            F.concat(F.lit("u"), rdst.cast("string")).alias("dst_url"),
        )
        .filter(F.col("dst_url").isNotNull())
    )
    sres = (
        resolve_redirects(spark, red_df, max_hops=MAXH)
        .toPandas()
        .sort_values("src_url")
        .reset_index(drop=True)
    )
    te = time.monotonic() - t0

    ids = np.arange(NUM_V, dtype=np.int64)
    mm = ids % 64
    nxt = np.full(NUM_V, -1, dtype=np.int64)
    nxt[(mm >= 1) & (mm <= 48)] = ids[(mm >= 1) & (mm <= 48)] - 1
    nxt[(mm == 49) | (mm == 50)] = ids[(mm == 49) | (mm == 50)] + 1
    nxt[mm == 51] = ids[mm == 51] - 2
    nxt[nxt >= NUM_V] = -1  # partial tail blocks drop the same rows
    src_ids = ids[nxt >= 0]
    ptr = nxt[src_ids].copy()
    hops = np.ones(len(src_ids), dtype=np.int64)
    for _ in range(MAXH + 1):
        live = (ptr >= 0) & (nxt[ptr] >= 0) & (hops <= MAXH)
        if not live.any():
            break
        ptr[live] = nxt[ptr[live]]
        hops[live] += 1
    resolved = (nxt[ptr] < 0) & (hops <= MAXH)
    exp = pd.DataFrame(
        {
            "src_url": ["u" + str(i) for i in src_ids],
            "final_url": np.where(resolved, [f"u{p}" for p in ptr], None),
            "hops": np.where(resolved, hops, np.nan),
            "resolved": resolved,
        }
    ).sort_values("src_url").reset_index(drop=True)
    bad = int((sres["resolved"].to_numpy() != exp["resolved"].to_numpy()).sum())
    bad += int(
        (
            sres["final_url"].fillna("").to_numpy()
            != exp["final_url"].fillna("").to_numpy()
        ).sum()
    )
    bad += int(
        (sres["hops"].fillna(-1).to_numpy() != exp["hops"].fillna(-1).to_numpy()).sum()
    )
    wall = time.monotonic() - t0
    record(
        "redirects_1m", bad == 0 and len(sres) == len(exp), wall,
        f"{len(sres)} redirect srcs, max_hops={MAXH}, "
        f"{int(exp['resolved'].sum())} resolved, {bad} mismatches",
        engine_wall=te, oracle_wall=wall - te,
    )

    # -- random-walk corpus at 1M starts -----------------------------------
    # engine: one 5-step walk from every vertex with an out-edge (1M
    # walks, 5 frontier supersteps); oracle: an exact pure-Python
    # follower of the md5-argmin rule on a numpy CSR, replayed for a
    # deterministic 1-in-500 sample of starts (2k walks, every hop
    # byte-compared) + global corpus invariants (walk count = start
    # count, length bounds).
    t0 = time.monotonic()
    from k2_18_spark.graph.walks import random_walks

    g_edges = spark.read.parquet(SCRATCH)
    corpus = random_walks(
        spark, g_edges, walk_length=5, num_walks=1, seed="sf1"
    )
    n_walks, max_len = corpus.agg(
        F.count(F.lit(1)), F.max("length")
    ).collect()[0]
    sample = (
        corpus.filter(
            F.pmod(F.substring("start_id", 2, 10).cast("long"), F.lit(500))
            == 0
        )
        .toPandas()
        .sort_values("walk_id")
        .reset_index(drop=True)
    )
    te = time.monotonic() - t0

    el = con.sql(
        "SELECT DISTINCT CAST(substr(src_id, 2, 10) AS BIGINT) s,"
        "       CAST(substr(dst_id, 2, 10) AS BIGINT) d "
        "FROM e WHERE src_id <> dst_id"
    ).df()
    s_arr = el["s"].to_numpy()
    d_arr = el["d"].to_numpy()
    order = np.lexsort((d_arr, s_arr))
    s_arr, d_arr = s_arr[order], d_arr[order]
    n_starts = len(np.unique(s_arr))

    import hashlib

    def follow(start: int) -> list[str]:
        wid = f"v{start}#0"
        cur, seq = start, [f"v{start}"]
        for t in range(1, 6):
            lo = np.searchsorted(s_arr, cur, "left")
            hi = np.searchsorted(s_arr, cur, "right")
            if lo == hi:
                break
            best = None
            for d in d_arr[lo:hi]:
                dst = f"v{d}"
                h = hashlib.md5(f"sf1|{wid}|{t}|{dst}".encode()).hexdigest()
                if best is None or (h, dst) < best[0]:
                    best = ((h, dst), d)
            cur = best[1]
            seq.append(f"v{cur}")
        return seq

    want = {}
    for i in range(0, NUM_V, 500):
        lo = np.searchsorted(s_arr, i, "left")
        if lo < len(s_arr) and s_arr[lo] == i:
            want[f"v{i}#0"] = ">".join(follow(i))
    got = {
        r["walk_id"]: ">".join(r["seq"]) for _, r in sample.iterrows()
    }
    bad = sum(1 for k, v in want.items() if got.get(k) != v)
    bad += sum(1 for k in got if k not in want)
    wall = time.monotonic() - t0
    record(
        "walks_1m",
        bad == 0 and n_walks == n_starts and max_len <= 6,
        wall,
        f"{n_walks} walks from {n_starts} starts, {len(want)} sampled "
        f"walks hop-compared, max_len={max_len}, {bad} mismatches",
        engine_wall=te, oracle_wall=wall - te,
    )

    with open(OUT, "w", encoding="utf-8") as f:
        json.dump({"num_vertices": NUM_V, "num_edges": m, "checks": results},
                  f, indent=2)
    print(f"[sf1] wrote {OUT}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
