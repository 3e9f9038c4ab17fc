"""Count-Min sketch (functions/cms.py) vs a pure-Python register
replica, plus the structural guarantees the sketch is used for:
one-sided error (est ≥ true, exact absent collisions) and
associative merging."""

import hashlib

from pyspark.sql import functions as F

from k2_18_spark.functions.cms import cms_build, cms_estimate, cms_merge

D, W, SEED = 4, 64, "t"


def _col(i, k):
    h = int(hashlib.md5(f"{SEED}|{i}|{k}".encode()).hexdigest()[:15], 16)
    return h % W


def _sketch(pairs):
    reg = {}
    for k, v in pairs:
        for i in range(D):
            key = (i, _col(i, k))
            reg[key] = reg.get(key, 0) + v
    return reg


def _est(reg, k):
    return min(reg.get((i, _col(i, k)), 0) for i in range(D))


PAIRS = [("h%d.com" % (i % 7), 1) for i in range(100)] + [
    ("big.com", 1) for _ in range(50)
]


def _items(spark):
    return spark.createDataFrame(PAIRS, "host string, one int").select("host")


def test_registers_match_replica(spark):
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_build(_items(spark), "host", d=D, w=W, seed=SEED)
        .collect()
    }
    assert got == _sketch([(k, v) for k, v in PAIRS])


def test_estimates_one_sided_and_match_replica(spark):
    sk = cms_build(_items(spark), "host", d=D, w=W, seed=SEED)
    probes = _items(spark).distinct()
    got = {
        r["host"]: r["est"]
        for r in cms_estimate(sk, probes, "host", d=D, w=W, seed=SEED)
        .collect()
    }
    reg = _sketch(PAIRS)
    true = {}
    for k, v in PAIRS:
        true[k] = true.get(k, 0) + v
    for k, t in true.items():
        assert got[k] == _est(reg, k)
        assert got[k] >= t  # the Count-Min one-sided guarantee


def test_absent_key_estimates_zero_or_collision(spark):
    sk = cms_build(_items(spark), "host", d=D, w=W, seed=SEED)
    probes = _items(spark).sparkSession.createDataFrame(
        [("nosuch.example",)], "host string"
    )
    est = cms_estimate(sk, probes, "host", d=D, w=W, seed=SEED).collect()
    assert est[0]["est"] == _est(_sketch(PAIRS), "nosuch.example")


def test_merge_equals_build_on_union(spark):
    items = _items(spark)
    # deterministic split: md5 first hex char < '8' vs >= '8'
    a = items.filter(F.substring(F.md5("host"), 1, 1) < "8")
    b = items.exceptAll(a)
    merged = cms_merge(
        cms_build(a, "host", d=D, w=W, seed=SEED),
        cms_build(b, "host", d=D, w=W, seed=SEED),
    )
    direct = cms_build(items, "host", d=D, w=W, seed=SEED)
    as_map = lambda df: {
        (r["row"], r["col"]): r["cnt"] for r in df.collect()
    }
    assert as_map(merged) == as_map(direct)


def test_weighted_build(spark):
    rows = [("a", 10), ("a", 5), ("b", 3)]
    df = _items(spark).sparkSession.createDataFrame(
        rows, "host string, nbytes int"
    )
    sk = cms_build(df, "host", d=D, w=W, seed=SEED, weight_col="nbytes")
    got = {(r["row"], r["col"]): r["cnt"] for r in sk.collect()}
    assert got == _sketch([("a", 15), ("b", 3)])
