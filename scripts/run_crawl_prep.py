#!/usr/bin/env python
"""spark-submit entry point: the crawl-preparation job — everything
between URL discovery and the link-graph job (`run_linkgraph.py`).

Stages (all deterministic, no external data):

1. synthesize an N-page crawl (pipeline/linkgraph.synth_pages) across
   H hosts, serialize it into .warc blobs, and PARSE the blobs back
   (io/warc.py) — the fetch-side round trip
2. canonicalize every discovered URL (functions/urls.py) and compute
   SURT keys + registered domains
3. parse per-host robots.txt (functions/robots.py) and verdict every
   URL; disallowed URLs leave the frontier
4. resolve a redirect map (pipeline/redirects.py pointer doubling)
   and rewrite frontier URLs through it
5. schedule the surviving frontier into per-host politeness batches
   (pipeline/frontier.py)

Writes each stage's parquet under --out and prints ONE JSON line with
stage row counts + walls.

Usage (cluster):
    zip -r k2_18_spark.zip k2_18_spark
    spark-submit --py-files k2_18_spark.zip scripts/run_crawl_prep.py \
        --synthetic 1000000 --hosts 1024 --out s3://bucket/crawlprep

Local smoke:
    python scripts/run_crawl_prep.py --synthetic 20000 --out /tmp/cp
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic", type=int, default=100_000)
    p.add_argument("--hosts", type=int, default=64)
    p.add_argument("--out", required=True)
    p.add_argument("--per-host-limit", type=int, default=1000)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    args = p.parse_args()

    from k2_18_spark.functions.robots import match_allowed, parse_robots
    from k2_18_spark.functions.urls import (
        canonical_url,
        registered_domain,
        surt_key,
    )
    from k2_18_spark.io.warc import parse_warc, to_warc_records, warc_files
    from k2_18_spark.pipeline.frontier import frontier_schedule
    from k2_18_spark.pipeline.linkgraph import synth_pages
    from k2_18_spark.pipeline.redirects import apply_redirects, resolve_redirects
    from k2_18_spark.session import get_spark

    spark = get_spark(
        app_name="crawl_prep", shuffle_partitions=args.shuffle_partitions
    )
    spark.sparkContext.setLogLevel("WARN")
    stats: dict = {"n_pages": args.synthetic, "n_hosts": args.hosts}
    t_all = time.monotonic()

    # 1. fetch side: synthesize -> WARC -> parse back
    t0 = time.monotonic()
    docs = spark.range(args.synthetic).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("page body "), F.col("id").cast("string")).alias("text"),
        F.lit("en").alias("lang"),
    )
    pages = synth_pages(docs, args.synthetic, n_hosts=args.hosts)
    parsed = parse_warc(
        warc_files(
            to_warc_records(pages),
            num_files=int(spark.conf.get("spark.sql.shuffle.partitions")),
        )
    )
    parsed.write.mode("overwrite").parquet(os.path.join(args.out, "fetched"))
    fetched = spark.read.parquet(os.path.join(args.out, "fetched"))
    stats["warc_records"] = fetched.count()
    stats["wall_fetch"] = round(time.monotonic() - t0, 1)

    # 2. URL normalization over the fetched URLs
    t0 = time.monotonic()
    urls = fetched.select("url").distinct().select(
        "url",
        canonical_url("url").alias("canonical_url"),
        surt_key("url").alias("surt"),
        registered_domain("url").alias("domain"),
    )
    urls.write.mode("overwrite").parquet(os.path.join(args.out, "urls"))
    urls = spark.read.parquet(os.path.join(args.out, "urls"))
    stats["n_urls"] = urls.count()
    stats["wall_canonical"] = round(time.monotonic() - t0, 1)

    # 3. robots gate: every 4th host disallows /page/ below id 100
    t0 = time.monotonic()
    robots = (
        spark.range(args.hosts)
        .select(
            F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".example.org"))
            .alias("host"),
            F.when(
                F.pmod("id", F.lit(4)) == 0,
                F.lit("User-agent: *\nDisallow: /page/1\n"),
            )
            .otherwise(F.lit("User-agent: *\nDisallow:\n"))
            .alias("robots_txt"),
        )
    )
    rules = parse_robots(robots)
    vetted = match_allowed(urls, rules, url_col="canonical_url")
    frontier = vetted.filter("allowed").drop("allowed")
    stats["n_allowed"] = frontier.count()
    stats["wall_robots"] = round(time.monotonic() - t0, 1)

    # 4. redirect resolution (every 16th page 301s to its successor)
    t0 = time.monotonic()
    redirects = (
        spark.range(0, args.synthetic, 16)
        .select(
            F.col("id").alias("a"),
            ((F.col("id") + 1) % args.synthetic).alias("b"),
        )
        .join(
            urls.select(
                F.col("canonical_url").alias("src_url"),
                F.regexp_extract("canonical_url", r"/page/(\d+)$", 1)
                .cast("long")
                .alias("a"),
            ),
            "a",
        )
        .join(
            urls.select(
                F.col("canonical_url").alias("dst_url"),
                F.regexp_extract("canonical_url", r"/page/(\d+)$", 1)
                .cast("long")
                .alias("b"),
            ),
            "b",
        )
        .select("src_url", "dst_url")
    )
    resolved = resolve_redirects(spark, redirects, max_hops=8)
    edges_like = frontier.select(
        F.col("canonical_url").alias("src_id"),
        F.col("canonical_url").alias("dst_id"),
    )
    rewritten = apply_redirects(edges_like, resolved, url_col="src_url")
    stats["n_redirects"] = resolved.count()
    stats["wall_redirects"] = round(time.monotonic() - t0, 1)
    _ = rewritten.count()

    # 5. politeness batches
    t0 = time.monotonic()
    sched = frontier_schedule(
        frontier,
        per_host_limit=args.per_host_limit,
        url_col="canonical_url",
    )
    sched.write.mode("overwrite").parquet(os.path.join(args.out, "frontier"))
    sched = spark.read.parquet(os.path.join(args.out, "frontier"))
    stats["n_batches"] = sched.agg(F.max("batch") + 1).collect()[0][0]
    stats["wall_schedule"] = round(time.monotonic() - t0, 1)

    stats["wall_total"] = round(time.monotonic() - t_all, 1)
    print(json.dumps(stats), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
