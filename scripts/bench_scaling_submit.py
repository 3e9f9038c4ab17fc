#!/usr/bin/env python
"""North-rule scaling evidence under REAL spark-submit at two cluster
sizes: the same job, submitted with ``--py-files k2_18_spark.zip`` to
``local-cluster[N,C,M]`` and ``local-cluster[4N,C,M]`` — genuinely
separate executor JVMs (closure shipping, py-files distribution,
remote shuffle fetch), per-executor cores/memory pinned so only the
executor COUNT changes, exactly the rule's "N and 4N executors".

Methodology is the interleaved-minimum from
``bench_scaling_interleaved.py`` (legs alternate cluster sizes so both
sample the same co-tenant noise environment; per-workload minima
converge to quiet-box capability because noise only adds wall).
Shuffle partitions are pinned across sizes → identical plans and
byte-identical shuffles.

Defaults: 1 vs 4 executors × 2 cores (2 vs 8 total cores — ≤25% of
this box's 32 shared logical cores, the contention-free regime; see
BASELINE.md), 4 GiB/executor, V=2M / E=30M seeded power-law graph,
PageRank-to-convergence + connected components.

Env: SUBMIT_LEGS (default 3), SUBMIT_V / SUBMIT_E, SUBMIT_EXEC_LOW /
SUBMIT_EXEC_HIGH (1/4), SUBMIT_CORES (2), SUBMIT_MEM_MB (4096),
SUBMIT_WORKLOADS (pagerank,components), SUBMIT_SHUFFLE_PARTITIONS (64).

Prints one JSON line with per-workload best walls at both sizes,
scaling efficiency, and PageRank edge-throughput per executor.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEGS = int(os.environ.get("SUBMIT_LEGS", "3"))
NUM_V = int(os.environ.get("SUBMIT_V", "2000000"))
NUM_E = int(os.environ.get("SUBMIT_E", str(NUM_V * 15)))
EXEC_LOW = int(os.environ.get("SUBMIT_EXEC_LOW", "1"))
EXEC_HIGH = int(os.environ.get("SUBMIT_EXEC_HIGH", "4"))
CORES = int(os.environ.get("SUBMIT_CORES", "2"))
MEM_MB = int(os.environ.get("SUBMIT_MEM_MB", "4096"))
WORKLOADS = os.environ.get("SUBMIT_WORKLOADS", "pagerank,components")
SHUFFLE = int(os.environ.get("SUBMIT_SHUFFLE_PARTITIONS", "64"))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "spark-submit")
LEG_TIMEOUT = int(os.environ.get("SUBMIT_LEG_TIMEOUT", "3600"))


def build_zip(tmp: str) -> str:
    path = os.path.join(tmp, "k2_18_spark.zip")
    pkg = os.path.join(REPO, "k2_18_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return path


def run_leg(zip_path: str, n_exec: int) -> dict[str, float]:
    cmd = [
        SPARK_SUBMIT,
        "--master", f"local-cluster[{n_exec},{CORES},{MEM_MB}]",
        "--driver-memory", "8g",
        "--conf", f"spark.executor.memory={MEM_MB}m",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "scale_leg_submit.py"),
        "--v", str(NUM_V),
        "--e", str(NUM_E),
        "--workloads", WORKLOADS,
        "--shuffle-partitions", str(SHUFFLE),
    ]
    # local-cluster workers take their scratch dirs from SPARK_LOCAL_DIRS
    # (the cluster manager OVERRIDES spark.local.dir — Spark warns about
    # exactly this at launch). Without it executor shuffle files land on
    # this box's slow shared virtual disk and the multi-executor legs
    # measure disk contention, not scaling.
    env = dict(os.environ)
    if os.access("/dev/shm", os.W_OK):
        env.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, timeout=LEG_TIMEOUT, env=env
    )
    m = re.search(r"LEGRESULT (\{.*\})", out.stdout)
    if not m:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise RuntimeError(f"leg at {n_exec} executors produced no LEGRESULT")
    return json.loads(m.group(1))


def main() -> None:
    workloads = WORKLOADS.split(",")
    legs: dict[int, list[dict[str, float]]] = {EXEC_LOW: [], EXEC_HIGH: []}
    with tempfile.TemporaryDirectory() as tmp:
        zip_path = build_zip(tmp)
        for i in range(LEGS):
            for n in (EXEC_LOW, EXEC_HIGH):
                w = run_leg(zip_path, n)
                legs[n].append(w)
                print(
                    f"[leg {i + 1}/{LEGS} local-cluster[{n},{CORES},{MEM_MB}]] "
                    + " ".join(f"{k}={v}" for k, v in w.items()),
                    file=sys.stderr,
                    flush=True,
                )

    best = {
        n: {w: min(leg[w] for leg in legs[n]) for w in workloads}
        for n in (EXEC_LOW, EXEC_HIGH)
    }
    ratio = EXEC_HIGH / EXEC_LOW
    eff = {
        w: round((best[EXEC_LOW][w] / best[EXEC_HIGH][w]) / ratio, 3)
        for w in workloads
    }
    result = {
        "metric": (
            f"spark_submit_scaling_efficiency_{EXEC_LOW}x{CORES}"
            f"_to_{EXEC_HIGH}x{CORES}_executors_interleaved_min"
        ),
        "value": round(
            (
                sum(best[EXEC_LOW][w] for w in workloads)
                / sum(best[EXEC_HIGH][w] for w in workloads)
            )
            / ratio,
            3,
        ),
        "unit": "ratio",
        "launcher": "spark-submit --py-files k2_18_spark.zip",
        "masters": [
            f"local-cluster[{n},{CORES},{MEM_MB}]" for n in (EXEC_LOW, EXEC_HIGH)
        ],
        "legs_per_size": LEGS,
        "graph_vertices": NUM_V,
        "graph_edges": NUM_E,
        "shuffle_partitions": SHUFFLE,
        "efficiency": eff,
        "best_walls": {str(n): best[n] for n in (EXEC_LOW, EXEC_HIGH)},
        "pagerank_edges_per_sec_per_executor": (
            {
                str(n): round(NUM_E / best[n]["pagerank"] / n, 1)
                for n in (EXEC_LOW, EXEC_HIGH)
            }
            if "pagerank" in workloads
            else None
        ),
        "all_legs": {str(n): legs[n] for n in (EXEC_LOW, EXEC_HIGH)},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
