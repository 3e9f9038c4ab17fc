#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline jobs (north_rule): weighted PageRank to convergence, connected
components, label propagation, triangle count — on a seeded power-law
link graph sized by the scale factor — plus the driver-contract data
queries (MinHash LSH dedup, embedding top-k) on the sf parquet tables.

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  BENCH_CHECKPOINT     "1" → checkpoint supersteps to parquet (resume
                       path measured); default localCheckpoint only
  BENCH_REPEATS        runs per query (default 3); "queries" carries
                       the per-query MEDIAN, "queries_min" the min,
                       and "value" the sum of medians — the box's
                       shared virtual disk swings single-shot walls
                       2-10× under co-tenant load (r03 postmortem),
                       medians survive a noisy run

Scaling evidence (no real cluster in this sandbox): run this script at
SPARK_GRAFT_CPUS=8 and =32 on the same input; efficiency =
(throughput@32 / throughput@8) / 4. See bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from k2_18_spark.io.synth import powerlaw_edges, vertex_table  # noqa: E402
from k2_18_spark.session import get_spark  # noqa: E402


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_from_dir(sf_dir)
    use_ckpt = os.environ.get("BENCH_CHECKPOINT", "0") == "1"

    # graph size: sf0.1 → 100k vertices / 1.5M edges (avg degree 15);
    # BENCH_GRAPH_V/E override for scaling runs (bigger graph → compute
    # dominates fixed per-superstep scheduling overhead)
    num_v = int(os.environ.get("BENCH_GRAPH_V", max(1000, int(1_000_000 * sf))))
    num_e = int(os.environ.get("BENCH_GRAPH_E", num_v * 15))

    # BENCH_SHUFFLE_PARTITIONS pins the partition count across scaling
    # runs: partitions are sized by DATA, not by core count — otherwise
    # a low-core run with few, huge partitions spills and the scaling
    # ratio measures partition sizing, not compute scaling.
    shuffle_parts = int(
        os.environ.get("BENCH_SHUFFLE_PARTITIONS", max(cpus, 8))
    )
    spark = get_spark(
        app_name="k2_18_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle_parts,
        # the per-query shuffle-MB metric sums shuffleWriteBytes over
        # the status store's stage list; the default retainedStages
        # (1000) EVICTS old stages once the iterative workloads pass
        # ~3000 stages, making the cumulative counter go backwards
        # (observed as negative per-query deltas). Retain enough for
        # the whole bench run.
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "3")))
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    extras: dict[str, float] = {}
    shuffle_mb: dict[str, float] = {}

    def shuffle_written() -> int:
        """Total shuffle bytes written so far (AppStatusStore; the
        same counters the Spark UI stage table shows)."""
        sc = spark.sparkContext
        try:
            store = sc._jsc.sc().statusStore()
            jvm, gw = sc._jvm, sc._gateway
            stages = store.stageList(
                jvm.java.util.ArrayList(), False, False,
                gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
            )
            total, it = 0, stages.iterator()
            while it.hasNext():
                total += it.next().shuffleWriteBytes()
            return total
        except Exception:
            return 0

    def timed(name: str, fn, n_runs: int | None = None):
        """Run ``fn`` ``n_runs`` times (default BENCH_REPEATS); record
        the median wall (noise-robust headline), the min (quiet-box
        capability), and per-run shuffle bytes (identical across runs
        when the plan is — the invariant the r03 adjudication leaned
        on)."""
        import statistics

        r = n_runs or repeats
        walls, out = [], None
        s0 = shuffle_written()
        for _ in range(r):
            t0 = time.monotonic()
            out = fn()
            walls.append(time.monotonic() - t0)
        timings[name] = round(statistics.median(walls), 3)
        timings_min[name] = round(min(walls), 3)
        shuffle_mb[name] = round((shuffle_written() - s0) / 1e6 / r, 1)
        return out

    # -- build + persist the graph once (generation excluded from algo times)
    edges = powerlaw_edges(spark, num_v, num_e).persist()
    nodes = vertex_table(spark, num_v).persist()
    edge_count = edges.count()
    nodes.count()

    from k2_18_spark.graph.adjacency import build_adjacency
    from k2_18_spark.graph.components import connected_components
    from k2_18_spark.graph.lpa import label_propagation
    from k2_18_spark.graph.pagerank import pagerank
    from k2_18_spark.graph.triangles import triangle_count

    # JIT warmup (excluded from timings): one tiny end-to-end pass so the
    # timed queries measure steady-state codegen'd execution, not
    # first-call class-loading/JIT — the state a long-running cluster's
    # executors are in. BENCH_WARMUP=0 disables; the JSON records it.
    warmup = os.environ.get("BENCH_WARMUP", "1") == "1"
    if warmup:
        w_edges = powerlaw_edges(spark, 2000, 20_000).persist()
        w_nodes = vertex_table(spark, 2000).persist()
        pagerank(spark, w_edges, nodes=w_nodes).count()
        connected_components(spark, w_edges, nodes=w_nodes).count()
        label_propagation(spark, w_edges, nodes=w_nodes, max_iter=2).count()
        triangle_count(spark, w_edges)
        from k2_18_spark.graph.anf import anf as _anf_w
        from k2_18_spark.graph.hits import hits as _hits_w

        _anf_w(spark, w_edges, nodes=w_nodes, registers=4).sketches.count()
        _hits_w(spark, w_edges, nodes=w_nodes, fixed_iter=2).count()
        w_edges.unpersist(), w_nodes.unpersist()

    ckpt_dir = tempfile.mkdtemp(prefix="bench_ckpt_") if use_ckpt else None

    # adjacency prep measured separately (one-time cost, reused per
    # loop; n_runs=1 — repeats would stack persisted adjacency copies)
    adj = timed(
        "adjacency_prep",
        lambda: build_adjacency(edges, nodes, hub_top_k=256),
        n_runs=1,
    )

    def run_pagerank():
        # tol=1e-9: nx's criterion is err < n·tol, which at bench |V|
        # converges in ~2 supersteps — too few for a sustained
        # throughput number. 1e-9 runs ~12 supersteps of identical
        # per-iteration work (parity tests use the nx tol).
        ranks = pagerank(
            spark,
            edges,
            nodes=nodes,
            adj=adj,
            checkpoint_dir=ckpt_dir,
            tol=1e-9,
            max_iter=100,
        )
        n = ranks.count()
        return n

    timed("pagerank", run_pagerank)
    from k2_18_spark.graph import pagerank as pr_mod

    pr_iterations = pr_mod.LAST_RUN_ITERATIONS

    # incremental-crawl re-rank (pagerank init_ranks=): yesterday's
    # graph = all but ~1% of edges (deterministic hash filter); its
    # converged vector seeds today's full-graph iteration. This is the
    # daily-delta path a web-scale crawl runs — the warm loop
    # re-converges in a fraction of the cold superstep count because
    # the seed is already O(delta) from the new fixpoint. The cold
    # "yesterday" solve is off the clock (it is yesterday's job).
    prev_ranks = pagerank(
        spark,
        edges.filter(F.pmod(F.xxhash64("src_id", "dst_id"), F.lit(100)) < 99),
        tol=1e-9,
        max_iter=100,
    ).localCheckpoint(eager=True)
    timed(
        "pagerank_warm_delta1pct",
        lambda: pagerank(
            spark, edges, nodes=nodes, adj=adj, tol=1e-9, max_iter=100,
            init_ranks=prev_ranks,
        ).count(),
    )
    pr_warm_iterations = pr_mod.LAST_RUN_ITERATIONS
    prev_ranks.unpersist()

    timed("components", lambda: connected_components(spark, edges, nodes=nodes).count())
    timed("lpa", lambda: label_propagation(spark, edges, nodes=nodes, max_iter=10).count())

    # distributed Louvain, fixed budget (2 levels × 4 move rounds =
    # 8 gain supersteps + 1 coarsening) — measures the per-round
    # machinery; the bench power-law graph has no community structure
    # to converge on, like LPA above
    from k2_18_spark.graph.louvain_dist import louvain_superstep

    timed(
        "louvain",
        lambda: louvain_superstep(
            spark, edges, nodes=nodes, max_levels=2, max_rounds_per_level=4
        ).count(),
    )

    timed("triangles", lambda: float(triangle_count(spark, edges)))

    # DOULION p=0.25 sampled estimate — the G8 100-TB tier: wedge work
    # drops ~p^2; at p=0.25 the sampled leg should run well under the
    # exact one while landing near the true count
    from k2_18_spark.graph.triangles import doulion_triangles

    timed(
        "triangles_doulion_p25",
        lambda: float(
            doulion_triangles(spark, edges, p=0.25).collect()[0]["estimate"]
        ),
    )

    # CPU-bound sampled-source Brandes (pure-Python work per source over a
    # broadcast CSR — the workload where core-count scaling is visible on
    # a single box; run on a capped subgraph so the CSR collect stays small)
    from k2_18_spark.graph.centrality import betweenness_closeness

    if num_e <= 2_000_000:
        timed(
            "betweenness_s64",
            lambda: betweenness_closeness(
                spark, edges, nodes=nodes, sample_k=64
            ).count(),
        )
    elif os.environ.get("BENCH_SUPERSTEP_BETWEENNESS", "0") == "1":
        # above the CSR ceiling: the fully distributed superstep Brandes
        # (multi-source SSSP + DAG settling, NO driver collect).
        # Opt-in: 8 sources at 15M edges measured 174-206 s after the
        # round-4 columnar rewrite (BASELINE.md) — still too heavy for
        # the default per-round scaling bench.
        timed(
            "betweenness_superstep_s8",
            lambda: betweenness_closeness(
                spark, edges, nodes=nodes, sample_k=8, method="superstep"
            ).count(),
            n_runs=1,
        )

    # ANF neighborhood sketches (16 FM registers, codegen'd bit_or
    # supersteps, runs to saturation = graph diameter) and HITS
    # (7 fixed Kleinberg rounds — comparable superstep count to the
    # pagerank-to-convergence run above)
    from k2_18_spark.graph.anf import anf
    from k2_18_spark.graph.hits import hits

    timed(
        "anf_r16",
        lambda: anf(
            spark, edges, nodes=nodes, registers=16, max_rounds=64
        ).sketches.count(),
    )
    timed(
        "hits_i7",
        lambda: hits(spark, edges, nodes=nodes, fixed_iter=7).count(),
    )

    # neighborhood link prediction (CN/Jaccard/Adamic-Adar wedge join);
    # cap 256 bounds hub wedge fan-out on the power-law graph — ~0.5M
    # scored pairs at sf0.1 (drops logged by the operator)
    from k2_18_spark.graph.linkpred import link_prediction

    timed(
        "linkpred_cap256",
        lambda: link_prediction(
            spark, edges, max_center_degree=256, min_common=2
        ).count(),
    )

    # DeepWalk corpus → skip-gram pairs end-to-end (graph/walks.py):
    # one walk of 10 steps from every vertex (10 frontier supersteps,
    # hash-argmin next-hop, finished walks leave the frontier), then
    # the windowed co-occurrence aggregation an embedding trainer
    # consumes. The walk corpus is |V|-sized state per superstep —
    # same scaling shape as the rank vector.
    from k2_18_spark.graph.walks import random_walks, skipgram_pairs

    def run_walks():
        corpus = random_walks(spark, edges, walk_length=10, num_walks=1)
        return skipgram_pairs(corpus, window=2).count()

    extras["skipgram_pairs"] = timed("walks_skipgrams", run_walks)

    # node2vec: the same frontier loop plus the second-order price —
    # one (prev, dst) existence probe per step against the persisted
    # pair set. The leg isolates that extra join's cost vs the
    # first-order walk above (same length, same starts).
    from k2_18_spark.graph.walks import node2vec_walks

    timed(
        "node2vec_walks",
        lambda: node2vec_walks(
            spark, edges, walk_length=10, num_walks=1, p=4.0, q=0.25
        ).count(),
    )

    # weighted SSSP (graph/sssp.py): frontier Bellman-Ford from 4 seed
    # vertices, lengths = edge weight. State is the sparse reached set;
    # each superstep shuffles only the frontier vector against the
    # persisted src-partitioned edge relation — the cheapest loop in
    # the graph section and the purest fixed-cost-per-round probe.
    from k2_18_spark.graph.sssp import sssp

    timed(
        "sssp_4src",
        lambda: sssp(
            spark, edges, ["v0", "v1", "v2", "v3"], nodes=nodes,
            weight_mode="weight",
        ).count(),
    )

    # Borůvka minimum spanning forest (graph/msf.py): per-component
    # min-edge bids + pointer-doubling contraction — ≤ log2(V) outer
    # rounds over the once-persisted canonical pair table.
    from k2_18_spark.graph.msf import minimum_spanning_forest

    timed(
        "msf",
        lambda: minimum_spanning_forest(spark, edges, nodes=nodes).count(),
    )

    # graph section done — release its caches so the data-pipeline
    # queries below aren't fighting them for executor memory
    adj.unpersist()
    edges.unpersist()
    nodes.unpersist()

    # -- data-pipeline queries on the sf parquet tables
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    timed("minhash_lsh", lambda: q["doc_minhash_pairs"](spark, sf_dir).count())
    timed("emb_topk", lambda: q["emb_topk"](spark, sf_dir).count())
    timed("pricing_summary", lambda: q["pricing_summary"](spark, sf_dir).count())
    timed("co_supplier_pagerank", lambda: q["graph_pagerank"](spark, sf_dir).count())

    # -- north-rule pages pipeline: distributed synthesis of the
    # (url, warc_ts, html binary, text, lang) table → Arrow-batched
    # pandas-UDF extraction → JVM-side href mining → edge count
    # (pipeline/linkgraph.py). Extraction is CPU-bound Python-worker
    # work: the one workload class whose core-count scaling a single
    # box demonstrates cleanly (no shuffle, no memory-bus superstep).
    from k2_18_spark.pipeline.linkgraph import pages_link_pipeline

    pages_n = int(os.environ.get("BENCH_PAGES_N", max(2000, int(1_000_000 * sf))))
    if pages_n > 0:
        pdocs = (
            spark.range(pages_n)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.lit("web page body words "),
                    F.col("id").cast("string"),
                    F.lit(" "),
                    F.repeat(F.lit("alpha beta gamma delta epsilon zeta "), 8),
                ).alias("text"),
                F.lit("en").alias("lang"),
            )
            .repartition(shuffle_parts)
            .persist()
        )
        pdocs.count()

        def run_pages():
            _, p_edges = pages_link_pipeline(spark, pdocs, pages_n)
            return p_edges.count()

        extras["pages_edges"] = timed("pages_linkgraph", run_pages)
        extras["pages_n"] = pages_n
        extras["pages_per_sec"] = round(
            pages_n / timings["pages_linkgraph"], 1
        )

        # -- host-graph rollup (pipeline/hostgraph.py): the Common-Crawl
        # host artifact — same synthesis spread over 1024 hosts, any-host
        # mining, then ONE map-side-combinable groupBy to host pairs.
        from k2_18_spark.pipeline.hostgraph import host_edges

        def run_hosts():
            _, p_edges = pages_link_pipeline(
                spark, pdocs, pages_n, n_hosts=1024
            )
            return host_edges(p_edges).count()

        extras["host_pairs"] = timed("host_rollup", run_hosts)

        # -- WARC container round-trip (io/warc.py): serialize every
        # synthesized page into an ISO-28500 response record (pure
        # codegen), pack into .warc blobs, parse back with the Arrow-
        # batched byte-walker — the fetch-side throughput number next
        # to the extract-side pages_linkgraph above.
        from k2_18_spark.io.warc import parse_warc, to_warc_records, warc_files
        from k2_18_spark.pipeline.linkgraph import synth_pages

        def run_warc():
            pages = synth_pages(pdocs, pages_n)
            files = warc_files(to_warc_records(pages), num_files=shuffle_parts)
            return parse_warc(files).count()

        extras["warc_records"] = timed("warc_roundtrip", run_warc)
        extras["warc_pages_per_sec"] = round(
            pages_n / timings["warc_roundtrip"], 1
        )

        # -- paragraph-level corpus cleaning (operators/parclean.py):
        # C4-style line dedup over multi-line docs built from the same
        # page corpus — per-doc nav/copyright boilerplate + unique
        # bodies, ~6 lines/doc. One explode + one line-key groupBy
        # (map-side combine collapses the repeats) + per-doc rebuild.
        from k2_18_spark.operators.parclean import dedup_paragraphs

        def run_parclean():
            host = F.pmod(F.col("doc_id"), F.lit(1024)).cast("string")
            mdocs = pdocs.select(
                "doc_id",
                F.concat_ws(
                    "\n",
                    F.concat(F.lit("nav h"), host),
                    F.col("text"),
                    F.concat(F.lit("body "), F.col("doc_id").cast("string")),
                    F.lit("copyright example.org"),
                ).alias("text"),
            )
            return dedup_paragraphs(mdocs, min_repeat=5).count()

        extras["parclean_docs"] = timed("par_dedup", run_parclean)

        # -- corpus gates (operators/gopher.py + lmscore.py): the full
        # Gopher quality+repetition pass (one explode of all 9 n-gram
        # sizes + one map-side-combinable (doc,n,gram) groupBy — the
        # repeated page body plants real duplicate-n-gram mass) and the
        # CCNet-style unigram LM train+score pass over the same docs.
        from k2_18_spark.operators.gopher import gopher_filter
        from k2_18_spark.operators.lmscore import lm_score, train_unigram

        timed(
            "gopher_gates",
            lambda: gopher_filter(pdocs).filter("keep").count(),
        )
        timed(
            "lm_score",
            lambda: lm_score(pdocs, train_unigram(pdocs)).count(),
        )

        # -- DSIR data selection (operators/dsir.py): hashed-bigram
        # featurization of the whole pool, two broadcast LM joins, the
        # per-doc importance rollup and the Gumbel-top-k window — the
        # end-to-end pretraining-data selection pass.
        from k2_18_spark.operators.dsir import dsir_sample, dsir_scores

        timed(
            "dsir_select",
            lambda: dsir_sample(
                dsir_scores(
                    pdocs,
                    pdocs.filter(F.pmod(F.col("doc_id"), F.lit(7)) == 0),
                    n=2,
                    buckets=4096,
                ),
                k=1000,
            ).count(),
        )

        # -- winnowing fingerprints (operators/winnow.py): one row per
        # char 5-gram (~330/doc) + the sliding-frame doc_id window —
        # the MOSS sampling pass at corpus scale.
        from k2_18_spark.operators.winnow import winnow_fingerprints

        timed(
            "winnow",
            lambda: winnow_fingerprints(pdocs, k=5, w=4).count(),
        )

        # -- cross-doc substring dedup (operators/substring_dedup.py):
        # the synthetic page body repeats a 48-word block corpus-wide,
        # so the 20-token windows collapse massively in the map-side
        # combine — the realistic shape (duplication is common).
        from k2_18_spark.operators.substring_dedup import dedup_substrings

        timed(
            "substr_dedup",
            lambda: dedup_substrings(pdocs, window_tokens=20).count(),
        )
        pdocs.unpersist()

    # -- sessionization (operators/sessions.py): gap-rule sessions over
    # a synthetic clickstream (20 events per user, deterministic jitter
    # so ~half the per-user gaps break sessions) — one user_id Exchange
    # serves lag + counter + rollup.
    from k2_18_spark.operators.sessions import session_stats, sessionize

    sess_n = int(os.environ.get("BENCH_SESS_N", max(20_000, int(20_000_000 * sf))))
    if sess_n > 0:
        sev = (
            spark.range(sess_n)
            .select(
                F.col("id").alias("event_id"),
                F.timestamp_seconds(
                    F.lit(1700000000)
                    + (F.col("id") % 20) * 3600
                    + F.pmod(F.xxhash64("id"), F.lit(5400))
                ).alias("ts"),
                (F.col("id") / 20).cast("long").alias("user_id"),
                F.lit("view").alias("event_type"),
                (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)) / 100.0
                 ).alias("value"),
            )
            .persist()
        )
        sev.count()
        extras["sessions"] = timed(
            "sessionize",
            lambda: session_stats(sessionize(sev, gap_seconds=4800)).count(),
        )
        sev.unpersist()

    # -- embedding-dedup end-to-end on planted near-dup clusters
    # (synth.embedding_table: the sf embeddings have no cosine>0.6 pairs,
    # so dedup at a realistic 0.85 threshold needs planted structure).
    # The per-round entry uses the bucketed LSH candidate path;
    # BENCH_DEDUP_EXACT=1 additionally times the O(n²) crossJoin path on
    # the SAME input (one-time comparison recorded in BASELINE.md).
    from k2_18_spark.io.synth import embedding_table
    from k2_18_spark.pipeline.dedup_pipeline import (
        dedup_graph,
        lsh_candidates,
    )

    dedup_n = int(os.environ.get("BENCH_DEDUP_N", max(2000, int(200_000 * sf))))
    # BENCH_DEDUP_N=0 skips the dedup section (scaling runs time only
    # the graph workloads)
    if dedup_n > 0:
        demb = embedding_table(spark, dedup_n, dim=64, cluster_size=10).persist()
        dnodes = demb.select(
            F.col("node_id").alias("id"),
            F.lit("Chunk").alias("type"),
            F.lit("synthetic document body for the dedup benchmark").alias("text"),
        ).persist()
        dedges = spark.createDataFrame(
            [], "src_id string, dst_id string, edge_type string, weight double"
        )
        demb.count(), dnodes.count()

        def run_dedup(candidate_fn):
            _, _, dmap, _ = dedup_graph(
                spark, dnodes, dedges, demb, sim_threshold=0.85,
                candidate_fn=candidate_fn,
            )
            return dmap.count()

        # planes=12/tables=4: 17999/18000 of the exact path's map rows at
        # 20k docs in 18.8s vs the crossJoin's 450s (planes=10/tables=6
        # recovers all 18000 at 24.3s) — see BASELINE.md
        extras["dedup_lsh_map_rows"] = timed(
            "dedup_lsh",
            lambda: run_dedup(lsh_candidates(dim=64, n_planes=12, n_tables=4)),
        )
        extras["dedup_n_docs"] = dedup_n
        if os.environ.get("BENCH_DEDUP_EXACT", "0") == "1":
            extras["dedup_exact_map_rows"] = timed(
                "dedup_exact", lambda: run_dedup(None), n_runs=1
            )
        demb.unpersist()
        dnodes.unpersist()

    total = round(sum(timings.values()), 3)
    # PageRank throughput = iterations × |E| / seconds
    if pr_iterations:
        eps = edge_count * pr_iterations / timings["pagerank"]
        extras["pagerank_iterations"] = pr_iterations
        extras["pagerank_edges_per_sec"] = round(eps, 1)
        extras["pagerank_edges_per_sec_per_core"] = round(eps / cpus, 1)
        # per-superstep shuffle traffic — the scaling-story evidence:
        # the rank vector (|V| longs+doubles), not the edge table,
        # crosses the wire each round
        extras["pagerank_shuffle_mb_per_superstep"] = round(
            shuffle_mb.get("pagerank", 0.0) / pr_iterations, 2
        )
        # warm-start superstep count: the incremental-crawl savings
        extras["pagerank_warm_iterations"] = pr_warm_iterations

    detail = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "graph_vertices": num_v,
        "graph_edges": edge_count,
        "checkpointing": bool(ckpt_dir),
        "jit_warmup": warmup,
        "repeats": repeats,
        "queries_min": timings_min,
        "shuffle_mb": shuffle_mb,
        **extras,
    }
    # Full detail (minima, shuffle, counters) goes to a file; stdout's
    # LAST line is a SHORT summary the driver's tail capture can never
    # truncate (the r04 artifact lost its numbers to a very long line).
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        detail_path = None
    summary = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "detail": detail_path,
    }
    print(json.dumps(summary, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
