#!/usr/bin/env python
"""Local replica of the driver's CORRECTNESS harness: run each
``__spark_entry__.queries()`` entry AND its ``oracle_sql()`` DuckDB
twin on the same parquet tables, compare rows + schema + values.

Usage:
    python scripts/compare_oracles.py [--sf-dir /root/testdata/sf0.01] \
        [--only name1,name2] [--json out.json]

Comparison semantics (mirrors the driver): columns sorted by name,
rows sorted by all columns, values compared exactly (floats must be
bit-equal after both sides' explicit ROUND calls — tolerance hides
real bugs)."""

from __future__ import annotations

import argparse
import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # date vs Timestamp / int32 vs int64 harmonization (values only)
        if str(df[c].dtype).startswith("datetime") or c in ("day",):
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: str(v) if not (v is None or v != v) else None
            )
    return df.sort_values(list(df.columns), na_position="last").reset_index(
        drop=True
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import __spark_entry__ as E
    from k2_18_spark.session import get_spark

    spark = get_spark(
        app_name="compare_oracles", master="local[8]", shuffle_partitions=16
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    q, o = E.queries(), E.oracle_sql()
    names = args.only.split(",") if args.only else [k for k in q if k in o]
    report: dict[str, dict] = {}
    for name in names:
        entry: dict = {}
        try:
            got = normalize(q[name](spark, args.sf_dir).toPandas())
            want = normalize(con.execute(o[name]).fetchdf())
            entry["spark_rows"] = len(got)
            entry["oracle_rows"] = len(want)
            entry["rows_match"] = len(got) == len(want)
            entry["schema_match"] = list(got.columns) == list(want.columns)
            if entry["rows_match"] and entry["schema_match"]:
                mism = 0
                for c in got.columns:
                    a, b = got[c], want[c]
                    if a.dtype.kind == "f" or b.dtype.kind == "f":
                        eq = (a == b) | (a.isna() & b.isna())
                    else:
                        eq = (a.astype(object) == b.astype(object)) | (
                            a.isna() & b.isna()
                        )
                    bad = int((~eq).sum())
                    if bad:
                        i = (~eq).idxmax()
                        entry.setdefault("first_diff", {})[c] = [
                            repr(a[i]), repr(b[i]),
                        ]
                    mism += bad
                entry["values_match"] = mism == 0
                entry["value_mismatches"] = mism
            else:
                entry["values_match"] = False
            entry["ok"] = bool(
                entry["rows_match"]
                and entry["schema_match"]
                and entry["values_match"]
            )
        except Exception as exc:  # noqa: BLE001
            entry["ok"] = False
            entry["err"] = f"{type(exc).__name__}: {exc}"[:400]
        report[name] = entry
        print(name, "OK" if entry["ok"] else f"FAIL {entry}")

    n_ok = sum(1 for e in report.values() if e["ok"])
    print(f"== {n_ok}/{len(report)} green")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(report, fh, indent=1)
    spark.stop()
    sys.exit(0 if n_ok == len(report) else 1)


if __name__ == "__main__":
    main()
