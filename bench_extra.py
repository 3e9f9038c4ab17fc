#!/usr/bin/env python
"""Per-leg isolation harness for the optimization round (guide §1.4).

NOT the driver bench — bench.py is frozen. This file exists so the
round's before/after numbers can be reproduced leg by leg: it builds
the identical sf-scaled inputs bench.py builds, runs ONE named leg
with `setJobDescription` labels, INFO logging from the operator
modules (per-round walls), and reports wall seconds + shuffle bytes.

Usage: python bench_extra.py <leg> [<leg> ...]
Legs: louvain lpa gopher node2vec walks msf dsir triangles linkpred
      hits anf sssp components pagerank winnow adjacency dedup_lsh
Env: same as bench.py (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from k2_18_spark.io.synth import powerlaw_edges, vertex_table  # noqa: E402
from k2_18_spark.session import get_spark  # noqa: E402

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
for noisy in ("py4j", "pyspark"):
    logging.getLogger(noisy).setLevel(logging.WARNING)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = 0.1
    legs = sys.argv[1:] or ["louvain"]

    shuffle_parts = int(os.environ.get("BENCH_SHUFFLE_PARTITIONS", max(cpus, 8)))
    spark = get_spark(
        app_name="k2_18_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle_parts,
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    num_v = int(os.environ.get("BENCH_GRAPH_V", max(1000, int(1_000_000 * sf))))
    num_e = int(os.environ.get("BENCH_GRAPH_E", num_v * 15))
    edges = powerlaw_edges(spark, num_v, num_e).persist()
    nodes = vertex_table(spark, num_v).persist()
    edges.count(), nodes.count()

    pages_n = int(os.environ.get("BENCH_PAGES_N", max(2000, int(1_000_000 * sf))))
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

    def shuffle_written() -> int:
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

    results: dict[str, dict] = {}

    def timed(name: str, fn):
        spark.sparkContext.setJobDescription(name)
        s0 = shuffle_written()
        t0 = time.monotonic()
        out = fn()
        wall = time.monotonic() - t0
        results[name] = {
            "sec": round(wall, 3),
            "shuffle_mb": round((shuffle_written() - s0) / 1e6, 1),
            "result": out,
        }
        print(f"== {name}: {wall:.2f}s shuffle={(results[name]['shuffle_mb'])}MB "
              f"result={out}", flush=True)
        spark.sparkContext.setJobDescription(None)

    for leg in legs:
        if leg == "louvain":
            from k2_18_spark.graph.louvain_dist import louvain_superstep

            timed("louvain", lambda: louvain_superstep(
                spark, edges, nodes=nodes, max_levels=2, max_rounds_per_level=4
            ).count())
        elif leg == "lpa":
            from k2_18_spark.graph.lpa import label_propagation

            timed("lpa", lambda: label_propagation(
                spark, edges, nodes=nodes, max_iter=10
            ).count())
        elif leg == "gopher":
            from k2_18_spark.operators.gopher import gopher_filter

            timed("gopher_gates",
                  lambda: gopher_filter(pdocs).filter("keep").count())
        elif leg == "node2vec":
            from k2_18_spark.graph.walks import node2vec_walks

            timed("node2vec_walks", lambda: node2vec_walks(
                spark, edges, walk_length=10, num_walks=1, p=4.0, q=0.25
            ).count())
        elif leg == "walks":
            from k2_18_spark.graph.walks import random_walks, skipgram_pairs

            timed("walks_skipgrams", lambda: skipgram_pairs(
                random_walks(spark, edges, walk_length=10, num_walks=1),
                window=2,
            ).count())
        elif leg == "msf":
            from k2_18_spark.graph.msf import minimum_spanning_forest

            timed("msf", lambda: minimum_spanning_forest(
                spark, edges, nodes=nodes
            ).count())
        elif leg == "dsir":
            from k2_18_spark.operators.dsir import dsir_sample, dsir_scores

            timed("dsir_select", lambda: dsir_sample(
                dsir_scores(
                    pdocs,
                    pdocs.filter(F.pmod(F.col("doc_id"), F.lit(7)) == 0),
                    n=2,
                    buckets=4096,
                ),
                k=1000,
            ).count())
        elif leg == "triangles":
            from k2_18_spark.graph.triangles import triangle_count

            timed("triangles", lambda: float(triangle_count(spark, edges)))
        elif leg == "linkpred":
            from k2_18_spark.graph.linkpred import link_prediction

            timed("linkpred_cap256", lambda: link_prediction(
                spark, edges, max_center_degree=256, min_common=2
            ).count())
        elif leg == "hits":
            from k2_18_spark.graph.hits import hits

            timed("hits_i7", lambda: hits(
                spark, edges, nodes=nodes, fixed_iter=7
            ).count())
        elif leg == "anf":
            from k2_18_spark.graph.anf import anf

            timed("anf_r16", lambda: anf(
                spark, edges, nodes=nodes, registers=16, max_rounds=64
            ).sketches.count())
        elif leg == "sssp":
            from k2_18_spark.graph.sssp import sssp

            timed("sssp_4src", lambda: sssp(
                spark, edges, ["v0", "v1", "v2", "v3"], nodes=nodes,
                weight_mode="weight",
            ).count())
        elif leg == "components":
            from k2_18_spark.graph.components import connected_components

            timed("components", lambda: connected_components(
                spark, edges, nodes=nodes
            ).count())
        elif leg == "pagerank":
            from k2_18_spark.graph.pagerank import pagerank

            timed("pagerank", lambda: pagerank(
                spark, edges, nodes=nodes, tol=1e-9, max_iter=100
            ).count())
        elif leg == "winnow":
            from k2_18_spark.operators.winnow import winnow_fingerprints

            timed("winnow", lambda: winnow_fingerprints(pdocs, k=5, w=4).count())
        elif leg == "adjacency":
            from k2_18_spark.graph.adjacency import build_adjacency

            def run_adj():
                a = build_adjacency(edges, nodes, hub_top_k=256)
                n = a.n
                a.unpersist()
                return n

            timed("adjacency_prep", run_adj)
        elif leg == "dedup_lsh":
            from k2_18_spark.io.synth import embedding_table
            from k2_18_spark.pipeline.dedup_pipeline import (
                dedup_graph,
                lsh_candidates,
            )

            dedup_n = int(os.environ.get("BENCH_DEDUP_N",
                                         max(2000, int(200_000 * sf))))
            demb = embedding_table(spark, dedup_n, dim=64, cluster_size=10).persist()
            dnodes = demb.select(
                F.col("node_id").alias("id"),
                F.lit("Chunk").alias("type"),
                F.lit("synthetic document body for the dedup benchmark").alias(
                    "text"),
            ).persist()
            dedges = spark.createDataFrame(
                [], "src_id string, dst_id string, edge_type string, weight double"
            )
            demb.count(), dnodes.count()

            def run_dedup():
                _, _, dmap, _ = dedup_graph(
                    spark, dnodes, dedges, demb, sim_threshold=0.85,
                    candidate_fn=lsh_candidates(dim=64, n_planes=12, n_tables=4),
                )
                return dmap.count()

            timed("dedup_lsh", run_dedup)
        else:
            print(f"unknown leg: {leg}", file=sys.stderr)

    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "result"}
                      for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
