"""Driver-contract harness: every queries() entry runs, and every
oracle_sql() entry matches the Spark result exactly (row count +
column names + order-insensitive values) at sf0.001 — a local mirror
of the driver's DuckDB correctness gate."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


ALL_QUERIES = sorted(entry_mod.queries())
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "pagerank" in df.columns


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_runs(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0


def test_no_hugeint_or_decimal_oracle_outputs(ddb):
    """The driver hashes values bit-exactly; DuckDB HUGEINT (bare
    SUM(BIGINT)) and DECIMAL outputs land as float64 in the comparison
    frame and break the hash even when values agree (the round-4
    pages_anchors red row). Every oracle output column must resolve to
    a hash-stable type — keep SUMs wrapped in CAST(... AS BIGINT)."""
    for name, sql in sorted(ORACLES.items()):
        rel = ddb.sql(sql)
        for cname, ctype in zip(rel.columns, rel.types):
            ts = str(ctype)
            assert "HUGEINT" not in ts and "DECIMAL" not in ts, (
                name,
                cname,
                ts,
            )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    res = ddb.sql(ORACLES[name])
    duck_cols = res.columns
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), name
    assert len(spark_rows) == len(duck_rows), (
        name,
        len(spark_rows),
        len(duck_rows),
    )
    got = normalize(spark_rows, spark_cols)
    want = normalize(duck_rows, duck_cols)
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, (name, mism[:5])
