"""Log-linear histogram quantile sketch — register parity (Spark vs
pure Python vs DuckDB), merge associativity, error bound."""

import math

import duckdb
import pytest

from k2_18_spark.functions.histsketch import (
    bucket_sql,
    bucket_sql_duckdb,
    hist_merge,
    hist_quantiles,
    hist_sketch,
)


def _py_bucket(v: int, s: int) -> int:
    if v < 2 ** (s + 1):
        return v
    bl = v.bit_length()
    return (bl - 1) * 2**s + (v >> (bl - 1 - s)) - 2**s


def _py_lo(bucket: int, s: int) -> int:
    if bucket < 2 ** (s + 1):
        return bucket
    bl_minus_1, sub = divmod(bucket, 2**s)
    return (2**s + sub) << (bl_minus_1 - s)


# values hitting 0, the exact range, octave boundaries, big longs
VALUES = (
    list(range(0, 70))
    + [2**k - 1 for k in range(5, 40)]
    + [2**k for k in range(5, 40)]
    + [2**k + 1 for k in range(5, 40)]
    + [123456, 999999937, 7_777_777_777, 2**52 + 12345]
)


@pytest.mark.parametrize("s", [2, 4, 6])
def test_bucket_parity_spark_python_duckdb(spark, s):
    df = spark.createDataFrame([(v,) for v in VALUES], "v long")
    got = {
        r["v"]: r["b"]
        for r in df.selectExpr("v", f"{bucket_sql('v', s)} AS b").collect()
    }
    want = {v: _py_bucket(v, s) for v in VALUES}
    assert got == want
    duck = dict(
        duckdb.sql(
            f"SELECT v, {bucket_sql_duckdb('v', s)} AS b FROM "
            f"(SELECT UNNEST({VALUES!r}) AS v)"
        ).fetchall()
    )
    assert duck == want


def test_sketch_registers_match_python(spark):
    s = 4
    df = spark.createDataFrame([(v,) for v in VALUES], "v long")
    got = {r["bucket"]: r["cnt"] for r in hist_sketch(df, "v", s).collect()}
    want: dict[int, int] = {}
    for v in VALUES:
        b = _py_bucket(v, s)
        want[b] = want.get(b, 0) + 1
    assert got == want


def test_merge_equals_union_build(spark):
    s = 4
    a = spark.createDataFrame([(v,) for v in VALUES[:100]], "v long")
    b = spark.createDataFrame([(v,) for v in VALUES[100:]], "v long")
    merged = {
        r["bucket"]: r["cnt"]
        for r in hist_merge(
            hist_sketch(a, "v", s), hist_sketch(b, "v", s)
        ).collect()
    }
    direct = {
        r["bucket"]: r["cnt"]
        for r in hist_sketch(a.unionByName(b), "v", s).collect()
    }
    assert merged == direct


@pytest.mark.parametrize("s", [3, 5])
def test_quantile_relative_error_bound(spark, s):
    # deterministic skewed values: v_i = (i*i*2654435761) % 10_000_000
    vals = sorted((i * i * 2654435761) % 10_000_000 for i in range(2000))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sk = hist_sketch(df, "v", s)
    qs = [0.5, 0.9, 0.99, 1.0]
    got = {r["q"]: r for r in hist_quantiles(sk, qs, s).collect()}
    for q in qs:
        rank = max(1, math.ceil(q * len(vals)))
        exact = vals[rank - 1]
        lo = got[q]["value"]
        assert got[q]["n"] == len(vals)
        assert got[q]["rank"] == rank
        # the answer bucket contains the exact order statistic
        assert lo <= exact
        if exact > 0:
            assert (exact - lo) / exact < 2**-s + 1e-12, (q, lo, exact)


def test_lo_roundtrip():
    for s in (2, 4, 6):
        for v in VALUES:
            b = _py_bucket(v, s)
            lo = _py_lo(b, s)
            assert lo <= v
            if v >= 2 ** (s + 1):
                width = 1 << (b // 2**s - s)
                assert v < lo + width
