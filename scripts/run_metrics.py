#!/usr/bin/env python
"""spark-submit entry point: full metrics pipeline over an edge table.

Usage (cluster):
    zip -r k2_18_spark.zip k2_18_spark
    spark-submit --py-files k2_18_spark.zip scripts/run_metrics.py \
        --edges s3://bucket/edges --nodes s3://bucket/nodes \
        --out s3://bucket/metrics --checkpoint s3://bucket/ckpt

Local smoke:
    python scripts/run_metrics.py --synthetic 10000 --out /tmp/metrics_out

The job is resumable: rerunning with the same --checkpoint continues
any interrupted superstep loop from its last complete iteration
(north_rule).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--edges", help="parquet path of the edge table")
    p.add_argument("--nodes", help="parquet path of the node table (optional)")
    p.add_argument("--synthetic", type=int, default=0, help="use a seeded power-law graph with N vertices instead of --edges")
    p.add_argument("--out", required=True, help="output dir (parquet)")
    p.add_argument("--checkpoint", default=None, help="checkpoint/lineage dir (enables resume)")
    p.add_argument("--betweenness-sample", type=int, default=None, help="sampled-source mode for betweenness (default exact)")
    args = p.parse_args()

    from k2_18_spark.session import get_spark

    # under spark-submit the master comes from the launcher
    master = None if "SPARK_ENV_LOADED" in os.environ else os.environ.get(
        "SPARK_MASTER"
    )
    spark = get_spark(app_name="k2_18_metrics", master=master)

    if args.synthetic:
        from k2_18_spark.io.synth import powerlaw_edges, vertex_table

        edges = powerlaw_edges(spark, args.synthetic, args.synthetic * 15)
        nodes = vertex_table(spark, args.synthetic)
    else:
        edges = spark.read.parquet(args.edges)
        nodes = spark.read.parquet(args.nodes) if args.nodes else None
        if nodes is None:
            from k2_18_spark.graph.adjacency import vertex_ids

            nodes = vertex_ids(edges, None)

    from k2_18_spark.pipeline.metrics import compute_all_metrics

    nodes_out, edges_out, summary = compute_all_metrics(
        spark,
        nodes,
        edges,
        checkpoint_dir=args.checkpoint,
        betweenness_sample_k=args.betweenness_sample,
    )
    nodes_out.write.mode("overwrite").parquet(os.path.join(args.out, "node_metrics"))
    edges_out.write.mode("overwrite").parquet(os.path.join(args.out, "edge_metrics"))
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
