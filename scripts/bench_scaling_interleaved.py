#!/usr/bin/env python
"""Interleaved two-parallelism scaling harness (north-rule evidence).

`bench_scaling.py` runs one full bench at local[8] then one at
local[32]; on this box a single co-tenant noise burst lands entirely
inside one leg and poisons the ratio (r03/r04 postmortems: same-binary
legs swing 2.5-3x minutes apart, and a burst-hit 8-core leg can even
read >1.0 "efficiency"). This harness instead ALTERNATES short legs —
8, 32, 8, 32, ... — with one run of each headline workload per leg,
and reports the per-workload MINIMUM across legs at each parallelism:
minima converge to quiet-box capability because noise only ever adds
wall time, and interleaving gives both parallelism levels equal
exposure to the same noise environment.

Workloads: the four north-rule superstep loops (PageRank to
convergence, connected components, LPA@10, triangle count) on the
seeded 1M-vertex / 15M-edge power-law graph with shuffle partitions
PINNED across parallelism (identical plans, byte-identical shuffles),
plus the pages pipeline (synthesis → pandas-UDF extraction → href
mining) whose Python-worker extraction is the cleanly CPU-bound
workload class on a single box.

Env: SCALE_LEGS (default 3 per parallelism), SCALE_V / SCALE_E,
SCALE_PAGES_N, SCALE_CPUS_LOW/HIGH (default 8/32).

Prints one JSON line; BASELINE.md records the interpretation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOW = int(os.environ.get("SCALE_CPUS_LOW", "8"))
HIGH = int(os.environ.get("SCALE_CPUS_HIGH", "32"))
LEGS = int(os.environ.get("SCALE_LEGS", "3"))
NUM_V = int(os.environ.get("SCALE_V", "1000000"))
NUM_E = int(os.environ.get("SCALE_E", str(NUM_V * 15)))
PAGES_N = int(os.environ.get("SCALE_PAGES_N", "400000"))
#: words-block repeats per synthetic page (~36 bytes each). 8 ≈ 300 B
#: pages stress per-row overheads; 256 ≈ 9 KB approximates a real
#: crawl page and makes extraction CPU dominate scheduling floors.
PAGE_REPEAT = int(os.environ.get("SCALE_PAGE_REPEAT", "8"))
SHUFFLE_PARTS = int(os.environ.get("BENCH_SHUFFLE_PARTITIONS", "64"))

ALL_WORKLOADS = ["pagerank", "components", "lpa", "triangles", "pages", "warc"]
#: SCALE_WORKLOADS="pages" (comma list) restricts a run — short
#: single-workload legs land many more samples in quiet windows, which
#: is how the minima converge on a bursty shared box.
WORKLOADS = [
    w
    for w in os.environ.get("SCALE_WORKLOADS", ",".join(ALL_WORKLOADS)).split(",")
    if w in ALL_WORKLOADS
]


def run_leg(cpus: int) -> dict[str, float]:
    """One leg: fresh session at local[cpus], one timed run of each
    workload on freshly built (seeded, deterministic) inputs."""
    from pyspark.sql import functions as F

    from k2_18_spark.graph.adjacency import build_adjacency
    from k2_18_spark.graph.components import connected_components
    from k2_18_spark.graph.lpa import label_propagation
    from k2_18_spark.graph.pagerank import pagerank
    from k2_18_spark.graph.triangles import triangle_count
    from k2_18_spark.io.synth import powerlaw_edges, vertex_table
    from k2_18_spark.pipeline.linkgraph import pages_link_pipeline
    from k2_18_spark.session import get_spark

    spark = get_spark(
        app_name=f"scale_leg_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=SHUFFLE_PARTS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    walls: dict[str, float] = {}
    graph_wanted = any(w in WORKLOADS for w in ALL_WORKLOADS[:4])
    try:
        if graph_wanted:
            edges = powerlaw_edges(spark, NUM_V, NUM_E).persist()
            nodes = vertex_table(spark, NUM_V).persist()
            edges.count(), nodes.count()

            # small warmup so leg 1 isn't a JIT outlier
            w_e = powerlaw_edges(spark, 2000, 20000).persist()
            w_n = vertex_table(spark, 2000).persist()
            pagerank(spark, w_e, nodes=w_n).count()
            triangle_count(spark, w_e)
            w_e.unpersist(), w_n.unpersist()

            adj = build_adjacency(edges, nodes, hub_top_k=256)

            if "pagerank" in WORKLOADS:
                t0 = time.monotonic()
                pagerank(
                    spark, edges, nodes=nodes, adj=adj, tol=1e-9, max_iter=100
                ).count()
                walls["pagerank"] = time.monotonic() - t0

            if "components" in WORKLOADS:
                t0 = time.monotonic()
                connected_components(spark, edges, nodes=nodes).count()
                walls["components"] = time.monotonic() - t0

            if "lpa" in WORKLOADS:
                t0 = time.monotonic()
                label_propagation(
                    spark, edges, nodes=nodes, max_iter=10
                ).count()
                walls["lpa"] = time.monotonic() - t0

            if "triangles" in WORKLOADS:
                t0 = time.monotonic()
                triangle_count(spark, edges)
                walls["triangles"] = time.monotonic() - t0

            adj.unpersist(), edges.unpersist(), nodes.unpersist()

        if "pages" not in WORKLOADS and "warc" not in WORKLOADS:
            return {k: round(v, 2) for k, v in walls.items()}
        pdocs = (
            spark.range(PAGES_N)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.lit("web page body words "),
                    F.col("id").cast("string"),
                    F.lit(" "),
                    F.repeat(
                        F.lit("alpha beta gamma delta epsilon zeta "),
                        PAGE_REPEAT,
                    ),
                ).alias("text"),
                F.lit("en").alias("lang"),
            )
            .repartition(SHUFFLE_PARTS)
            .persist()
        )
        pdocs.count()
        # warmup: spawn the Python workers / Arrow path before timing
        _, w_edges = pages_link_pipeline(spark, pdocs.limit(2000), 2000)
        w_edges.count()
        if "pages" in WORKLOADS:
            t0 = time.monotonic()
            _, p_edges = pages_link_pipeline(spark, pdocs, PAGES_N)
            p_edges.count()
            walls["pages"] = time.monotonic() - t0
        if "warc" in WORKLOADS:
            # fetch-side container round-trip: codegen serialize +
            # Python-worker byte-walking parse — the second cleanly
            # CPU-bound workload class (io/warc.py)
            from k2_18_spark.io.warc import (
                parse_warc,
                to_warc_records,
                warc_files,
            )
            from k2_18_spark.pipeline.linkgraph import synth_pages

            t0 = time.monotonic()
            wpages = synth_pages(pdocs, PAGES_N)
            parse_warc(
                warc_files(to_warc_records(wpages), num_files=SHUFFLE_PARTS)
            ).count()
            walls["warc"] = time.monotonic() - t0
        pdocs.unpersist()
    finally:
        spark.stop()
    return {k: round(v, 2) for k, v in walls.items()}


def main() -> None:
    legs: dict[int, list[dict[str, float]]] = {LOW: [], HIGH: []}
    for i in range(LEGS):
        for cpus in (LOW, HIGH):
            w = run_leg(cpus)
            legs[cpus].append(w)
            print(
                f"[leg {i + 1}/{LEGS} local[{cpus}]] "
                + " ".join(f"{k}={v}" for k, v in w.items()),
                file=sys.stderr,
                flush=True,
            )

    best = {
        cpus: {w: min(leg[w] for leg in legs[cpus]) for w in WORKLOADS}
        for cpus in (LOW, HIGH)
    }
    ratio = HIGH / LOW
    eff = {
        w: round((best[LOW][w] / best[HIGH][w]) / ratio, 3) for w in WORKLOADS
    }
    graph_ws = [w for w in WORKLOADS if w != "pages"] or WORKLOADS
    graph_low = sum(best[LOW][w] for w in graph_ws)
    graph_high = sum(best[HIGH][w] for w in graph_ws)
    result = {
        "metric": f"scaling_efficiency_{LOW}_to_{HIGH}_interleaved_min",
        "value": round((graph_low / graph_high) / ratio, 3),
        "unit": "ratio",
        "legs_per_parallelism": LEGS,
        "graph_vertices": NUM_V,
        "graph_edges": NUM_E,
        "pages_n": PAGES_N,
        "shuffle_partitions": SHUFFLE_PARTS,
        "efficiency": eff,
        "pages_per_sec": (
            {
                str(c): round(PAGES_N / best[c]["pages"], 1)
                for c in (LOW, HIGH)
            }
            if "pages" in WORKLOADS
            else None
        ),
        "best_walls": {str(c): best[c] for c in (LOW, HIGH)},
        "all_legs": {str(c): legs[c] for c in (LOW, HIGH)},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
