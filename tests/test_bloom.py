"""Bloom seen-set (functions/bloom.py): python-replica register
parity, no false negatives, merge associativity, per-group filters,
partitioning invariance."""

import hashlib

import pytest

from k2_18_spark.functions.bloom import (
    bloom_build,
    bloom_fpr,
    bloom_merge,
    bloom_might_contain,
)


def _h60(x: str, salt: int) -> int:
    return int(hashlib.md5(f"{x}#{salt}".encode()).hexdigest()[:15], 16)


def _py_regs(items, n_bits, k):
    regs = [0] * (n_bits // 64)
    for x in items:
        for i in range(k):
            p = _h60(x, i) % n_bits
            regs[p // 64] |= 1 << (p % 64)
    # two's-complement view to match Spark longs
    return [r - (1 << 64) if r >= (1 << 63) else r for r in regs]


def _urls(n, prefix="https://t.org/"):
    return [f"{prefix}{i}" for i in range(n)]


def test_register_parity_with_replica(spark):
    items = _urls(300)
    df = spark.createDataFrame([(u,) for u in items], "url string")
    got = bloom_build(df, "url", n_bits=256, k=4).collect()[0]
    assert list(got.regs) == _py_regs(items, 256, 4)
    assert got.n_items == 300
    # n_bits=256 with 300 items × 4 hashes saturates enough to hit
    # bit 63 of some register — the sign-bit packing case
    assert any(r < 0 for r in got.regs)


def test_no_false_negatives_and_bounded_fps(spark):
    seen = _urls(500)
    df = spark.createDataFrame([(u,) for u in seen], "url string")
    bf = bloom_build(df, "url", n_bits=8192, k=4)
    probe = spark.createDataFrame(
        [(u,) for u in _urls(1000)], "url string"
    )
    rows = bloom_might_contain(probe, bf, "url", n_bits=8192, k=4).collect()
    flags = {r.url: r.might_contain for r in rows}
    assert all(flags[u] for u in seen)  # never a false negative
    fps = sum(flags[u] for u in _urls(1000)[500:])
    # est FPR ~0.3%; allow a generous margin
    assert fps <= 25, (fps, bloom_fpr(500, 8192, 4))


def test_merge_equals_whole_build(spark):
    items = _urls(400)
    df = spark.createDataFrame([(u,) for u in items], "url string")
    whole = bloom_build(df, "url", n_bits=1024, k=4).collect()[0]
    h1 = bloom_build(
        df.filter("url < 'https://t.org/2'"), "url", n_bits=1024
    )
    h2 = bloom_build(
        df.filter("url >= 'https://t.org/2'"), "url", n_bits=1024
    )
    merged = bloom_merge(h1.union(h2), n_bits=1024).collect()[0]
    assert list(merged.regs) == list(whole.regs)
    assert merged.n_items == whole.n_items == 400


def test_per_group_filters(spark):
    rows = [("d1", f"https://a/{i}") for i in range(50)] + [
        ("d2", f"https://b/{i}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "day string, url string")
    bf = bloom_build(df, "url", n_bits=1024, k=4, group_cols=["day"])
    assert bf.count() == 2
    probe = spark.createDataFrame(
        [("d1", "https://a/7"), ("d2", "https://a/7")],
        "day string, url string",
    )
    got = {
        (r.day): r.might_contain
        for r in bloom_might_contain(
            probe, bf, "url", n_bits=1024, k=4, join_cols=["day"]
        ).collect()
    }
    assert got["d1"] is True  # in d1's build set
    # d2's filter never saw https://a/* — overwhelmingly False
    # (possible false positive is ~2e-5 at this fill; accept True
    # would mean a packing bug far more often than an fp)
    assert got["d2"] is False


def test_partitioning_invariance(spark):
    items = _urls(256)
    df = spark.createDataFrame([(u,) for u in items], "url string")
    a = bloom_build(df.repartition(1), "url", n_bits=512, k=3).collect()[0]
    b = bloom_build(df.repartition(13), "url", n_bits=512, k=3).collect()[0]
    assert list(a.regs) == list(b.regs)


def test_bad_n_bits_rejected(spark):
    df = spark.createDataFrame([("x",)], "url string")
    with pytest.raises(ValueError):
        bloom_build(df, "url", n_bits=100)
