#!/usr/bin/env python
"""Capture .explain("formatted") for named declared queries.

Usage: python capture_plans_r06.py <repo_root> <out_suffix> <query> [...]

Writes <this repo>/plans/r06/<query>_<out_suffix>.txt. Run with
<repo_root>=/tmp/repo_r05 (the round-start worktree) for the _before
plans and <repo_root>=/root/repo for the _after plans.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

repo_root = os.path.abspath(sys.argv[1])
suffix = sys.argv[2]
names = sys.argv[3:]

sys.path.insert(0, repo_root)

from k2_18_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
out_dir = os.path.join("/root/repo", "plans", "r06")
os.makedirs(out_dir, exist_ok=True)

spark = get_spark(app_name="plan_capture")
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry  # noqa: E402

q = entry.queries()
for name in names:
    df = q[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(f"# {name} — explain('formatted') @ {repo_root} "
                 f"(sf_dir={sf_dir})\n")
        fh.write(buf.getvalue())
    print(f"wrote {path}")

spark.stop()
