#!/usr/bin/env python
"""spark-submit entry point: the full north-rule link-graph job.

Common-Crawl-style pages table ``(url string, warc_ts timestamp,
html binary, text string, lang string)`` → vectorized pandas-UDF text
extraction → JVM-side hyperlink mining → edge table ``(src_id, dst_id,
edge_type, weight)`` → PageRank / connected components / LPA /
triangle count, all checkpointed with per-partition lineage so a
killed job resumes mid-iteration.

Usage (cluster):
    zip -r k2_18_spark.zip k2_18_spark
    spark-submit --py-files k2_18_spark.zip scripts/run_linkgraph.py \
        --pages s3://bucket/pages --out s3://bucket/linkgraph \
        --checkpoint s3://bucket/ckpt

Local smoke:
    python scripts/run_linkgraph.py --synthetic 20000 --out /tmp/lg_out

``--synthetic N`` builds the deterministic N-page corpus
(pipeline/linkgraph.synth_pages over a seeded word table) instead of
reading ``--pages``; no external data is touched either way.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", help="parquet path of the pages table")
    p.add_argument(
        "--synthetic", type=int, default=0,
        help="synthesize a deterministic N-page corpus instead of --pages",
    )
    p.add_argument("--out", required=True, help="output dir (parquet)")
    p.add_argument(
        "--checkpoint", default=None,
        help="checkpoint/lineage dir (enables mid-iteration resume)",
    )
    p.add_argument(
        "--lpa-rounds", type=int, default=10, help="LPA iteration cap"
    )
    args = p.parse_args()

    from pyspark.sql import functions as F

    from k2_18_spark.session import get_spark

    master = None if "SPARK_ENV_LOADED" in os.environ else os.environ.get(
        "SPARK_MASTER"
    )
    spark = get_spark(app_name="k2_18_linkgraph", master=master)

    from k2_18_spark.pipeline.linkgraph import (
        extract_text,
        mine_links,
        synth_pages,
    )

    walls: dict[str, float] = {}
    t0 = time.monotonic()
    if args.synthetic:
        docs = spark.range(args.synthetic).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(39)),
                    lambda j: F.concat(
                        F.lit("w"),
                        F.pmod(F.xxhash64(F.col("id"), j), F.lit(50_000)),
                    ),
                ),
            ).alias("text"),
            F.lit("en").alias("lang"),
        )
        pages = synth_pages(docs, args.synthetic)
    else:
        pages = spark.read.parquet(args.pages)

    # Extraction fills `text` from the binary html; pages that arrive
    # pre-extracted (text already non-null) pass through untouched.
    extracted = extract_text(pages.filter(F.col("text").isNull()))
    ready = pages.filter(F.col("text").isNotNull())
    pages = extracted.unionByName(ready).persist()
    n_pages = pages.count()
    walls["extract"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    edges = mine_links(pages).persist()
    n_edges = edges.count()
    edges.write.mode("overwrite").parquet(os.path.join(args.out, "edges"))
    walls["mine"] = round(time.monotonic() - t0, 2)
    pages.unpersist()

    from k2_18_spark.graph.adjacency import vertex_ids
    from k2_18_spark.graph.components import connected_components
    from k2_18_spark.graph.lpa import label_propagation
    from k2_18_spark.graph.pagerank import pagerank
    from k2_18_spark.graph.triangles import triangle_count

    nodes = vertex_ids(edges, None).persist()

    t0 = time.monotonic()
    pr = pagerank(
        spark, edges, nodes=nodes, checkpoint_dir=args.checkpoint
    )
    pr.write.mode("overwrite").parquet(os.path.join(args.out, "pagerank"))
    walls["pagerank"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    comp = connected_components(
        spark, edges, nodes=nodes, checkpoint_dir=args.checkpoint
    )
    comp.write.mode("overwrite").parquet(os.path.join(args.out, "components"))
    walls["components"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    lpa = label_propagation(
        spark, edges, nodes=nodes, max_iter=args.lpa_rounds,
        checkpoint_dir=args.checkpoint,
    )
    lpa.write.mode("overwrite").parquet(os.path.join(args.out, "lpa"))
    walls["lpa"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    tri = triangle_count(spark, edges)
    walls["triangles"] = round(time.monotonic() - t0, 2)

    summary = {
        "pages": n_pages,
        "edges": n_edges,
        "triangles": int(tri),
        "walls_sec": walls,
        "pages_per_sec_extract": (
            round(n_pages / walls["extract"], 1) if walls["extract"] else None
        ),
        "out": args.out,
        "checkpoint": args.checkpoint,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
