"""HyperLogLog (functions/hll.py): python-replica register parity,
estimator accuracy inside the error bound, both estimator branches,
merge associativity, duplicate invariance."""

import hashlib
import math

import pytest

from k2_18_spark.functions.hll import (
    hll_error_bound,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _py_sketch(items, b):
    m = 1 << b
    regs = {}
    for x in items:
        h = int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)
        bucket, v = h % m, h >> b
        rho = (60 - b + 1) if v == 0 else (60 - b) - v.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _py_estimate(regs, b):
    m = 1 << b
    ps = sum(2.0 ** -r for r in regs.values())
    denom = ps + (m - len(regs))
    raw = (0.7213 / (1 + 1.079 / m)) * m * m / denom
    empties = m - len(regs)
    if raw <= 2.5 * m and empties > 0:
        return round(m * math.log(m / empties), 6)
    return round(raw, 6)


def _df(spark, items):
    return spark.createDataFrame([(str(x),) for x in items], "v string")


def test_register_parity(spark):
    items = [f"url{i}" for i in range(2000)]
    got = {
        r.bucket: r.rho
        for r in hll_sketch(_df(spark, items), "v", b=8).collect()
    }
    assert got == _py_sketch(items, 8)


def test_estimate_accuracy_and_branches(spark):
    items = [f"item{i}" for i in range(5000)]
    df = _df(spark, items)
    # b=8 (m=256): 5000 >> 2.5m → raw branch; b=14 (m=16384): linear
    for b in (8, 14):
        sk = hll_sketch(df, "v", b=b)
        est = hll_estimate(sk, b=b).collect()[0].estimate
        assert est == pytest.approx(
            _py_estimate(_py_sketch(items, b), b), abs=1e-6
        )
        rel = abs(est - 5000) / 5000
        assert rel < 3 * hll_error_bound(b), (b, est)


def test_duplicates_do_not_change_sketch(spark):
    base = [f"u{i}" for i in range(500)]
    a = hll_sketch(_df(spark, base), "v", b=8).collect()
    b_ = hll_sketch(_df(spark, base * 5), "v", b=8).collect()
    assert sorted((r.bucket, r.rho) for r in a) == sorted(
        (r.bucket, r.rho) for r in b_
    )


def test_merge_equals_whole(spark):
    items = [f"u{i}" for i in range(1000)]
    whole = hll_sketch(_df(spark, items), "v", b=8)
    s1 = hll_sketch(_df(spark, items[:600]), "v", b=8)
    s2 = hll_sketch(_df(spark, items[400:]), "v", b=8)
    merged = hll_merge(s1.union(s2))
    assert sorted((r.bucket, r.rho) for r in whole.collect()) == sorted(
        (r.bucket, r.rho) for r in merged.collect()
    )


def test_per_group_sketches(spark):
    rows = [("a", f"x{i}") for i in range(300)] + [
        ("b", f"y{i}") for i in range(30)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    est = {
        r.g: r.estimate
        for r in hll_estimate(
            hll_sketch(df, "v", b=10, group_cols=["g"]),
            b=10,
            group_cols=["g"],
        ).collect()
    }
    assert abs(est["a"] - 300) / 300 < 0.15
    assert abs(est["b"] - 30) / 30 < 0.25
