#!/usr/bin/env python
"""Two-parallelism scaling harness (north_rule evidence).

No real cluster exists in this sandbox, so the N→4N executor scaling
criterion is evidenced by running the identical bench job at local[8]
and local[32] on the same seeded input and reporting throughput at
both plus efficiency = (throughput@32 / throughput@8) / 4.

Writes the measurement into BASELINE.md's scaling section and prints
one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_at(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        # scaling runs use the larger graph so per-superstep compute
        # dominates fixed scheduling overhead (see BASELINE.md)
        BENCH_GRAPH_V=os.environ.get("BENCH_GRAPH_V", "1000000"),
        # pin the shuffle partition count across both runs — partitions
        # are sized by data; varying them with cores would conflate
        # spill behavior with compute scaling (a real N→4N cluster
        # comparison keeps the same partitioning of the same input)
        BENCH_SHUFFLE_PARTITIONS=os.environ.get("BENCH_SHUFFLE_PARTITIONS", "64"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    low = run_at(8, sf_dir)
    high = run_at(32, sf_dir)
    # scaling efficiency on the iterative superstep workload
    graph_queries = ["pagerank", "components", "lpa", "triangles"]
    t_low = sum(low["queries"][q] for q in graph_queries)
    t_high = sum(high["queries"][q] for q in graph_queries)
    thr_low = low["graph_edges"] / t_low
    thr_high = high["graph_edges"] / t_high
    eff = (thr_high / thr_low) / 4.0
    pr_eff = None
    if low.get("pagerank_edges_per_sec") and high.get("pagerank_edges_per_sec"):
        pr_eff = (
            high["pagerank_edges_per_sec"] / low["pagerank_edges_per_sec"]
        ) / 4.0
    bet_eff = None
    if "betweenness_s64" in low["queries"] and "betweenness_s64" in high["queries"]:
        bet_eff = (
            low["queries"]["betweenness_s64"] / high["queries"]["betweenness_s64"]
        ) / 4.0
    pages_eff = None
    if low.get("pages_per_sec") and high.get("pages_per_sec"):
        pages_eff = (high["pages_per_sec"] / low["pages_per_sec"]) / 4.0
    result = {
        "betweenness_scaling_efficiency": round(bet_eff, 3) if bet_eff else None,
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "pagerank_scaling_efficiency": round(pr_eff, 3) if pr_eff else None,
        "pages_extract_scaling_efficiency": (
            round(pages_eff, 3) if pages_eff else None
        ),
        "graph_seconds_local8": round(t_low, 2),
        "graph_seconds_local32": round(t_high, 2),
        "bench_local8": low,
        "bench_local32": high,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
