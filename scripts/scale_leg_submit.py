#!/usr/bin/env python
"""One scaling leg, designed to be launched via spark-submit:

    spark-submit --master local-cluster[N,C,M] \
        --py-files k2_18_spark.zip scripts/scale_leg_submit.py \
        --v 2000000 --e 30000000 --workloads pagerank,components

Inherits the master from the launcher (``get_spark(master=None)``
under ``SPARK_ENV_LOADED``), synthesizes the seeded power-law graph,
warms up, runs each workload once, and prints one line
``LEGRESULT {json}`` with per-workload walls. Driven interleaved by
``bench_scaling_submit.py`` — see that file for the methodology.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--v", type=int, default=2_000_000)
    p.add_argument("--e", type=int, default=30_000_000)
    p.add_argument("--workloads", default="pagerank,components")
    p.add_argument("--shuffle-partitions", type=int, default=64)
    args = p.parse_args()
    workloads = args.workloads.split(",")

    from k2_18_spark.graph.adjacency import build_adjacency
    from k2_18_spark.graph.components import connected_components
    from k2_18_spark.graph.lpa import label_propagation
    from k2_18_spark.graph.pagerank import pagerank
    from k2_18_spark.graph.triangles import triangle_count
    from k2_18_spark.io.synth import powerlaw_edges, vertex_table
    from k2_18_spark.session import get_spark

    spark = get_spark(
        app_name="scale_leg_submit",
        master=None,  # injected by spark-submit
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")
    walls: dict[str, float] = {}
    try:
        edges = powerlaw_edges(spark, args.v, args.e).persist()
        nodes = vertex_table(spark, args.v).persist()
        edges.count(), nodes.count()

        # warmup: JIT + executor Python/codegen spin-up off the clock
        w_e = powerlaw_edges(spark, 2000, 20000).persist()
        w_n = vertex_table(spark, 2000).persist()
        pagerank(spark, w_e, nodes=w_n).count()
        triangle_count(spark, w_e)
        w_e.unpersist(), w_n.unpersist()

        adj = build_adjacency(edges, nodes, hub_top_k=256)
        if "pagerank" in workloads:
            t0 = time.monotonic()
            pagerank(
                spark, edges, nodes=nodes, adj=adj, tol=1e-9, max_iter=100
            ).count()
            walls["pagerank"] = time.monotonic() - t0
        if "components" in workloads:
            t0 = time.monotonic()
            connected_components(spark, edges, nodes=nodes).count()
            walls["components"] = time.monotonic() - t0
        if "lpa" in workloads:
            t0 = time.monotonic()
            label_propagation(spark, edges, nodes=nodes, max_iter=10).count()
            walls["lpa"] = time.monotonic() - t0
        if "triangles" in workloads:
            t0 = time.monotonic()
            triangle_count(spark, edges)
            walls["triangles"] = time.monotonic() - t0
        adj.unpersist(), edges.unpersist(), nodes.unpersist()
    finally:
        spark.stop()
    print(
        "LEGRESULT " + json.dumps({k: round(v, 2) for k, v in walls.items()}),
        flush=True,
    )


if __name__ == "__main__":
    main()
