"""Luby MIS (graph/mis.py): independence + maximality properties, and
exact round-trajectory parity vs a pure-Python replica of the
hash-priority round rule."""

import hashlib

from pyspark.sql import functions as F

from k2_18_spark.graph.mis import maximal_independent_set


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, d) for s, d in pairs], "src_id string, dst_id string"
    )


def _replica(pairs, seed):
    adj: dict[str, set] = {}
    for s, d in pairs:
        if s == d:
            adj.setdefault(s, set())
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    und = set(adj)
    out = {}
    r = 0
    while und:
        r += 1
        ky = {
            v: (hashlib.md5(f"{seed}|{v}|{r}".encode()).hexdigest(), v)
            for v in und
        }
        mis = {
            v
            for v in und
            if all(ky[v] < ky[u] for u in adj[v] if u in und)
        }
        excl = {u for v in mis for u in adj[v] if u in und} - mis
        for v in mis:
            out[v] = (True, r)
        for v in excl:
            out[v] = (False, r)
        und -= mis | excl
    return out, r


PAIRS = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),   # 4-cycle
    ("c", "e"), ("e", "f"), ("f", "g"),               # tail
    ("x", "y"), ("y", "z"), ("z", "x"),               # separate triangle
    ("lone", "lone"),                                 # self-loop only
    ("p", "q"), ("q", "p"),                           # reciprocal pair
]


def test_mis_matches_replica_trajectory(spark):
    got = {
        r["id"]: (r["in_mis"], r["round"])
        for r in maximal_independent_set(
            spark, _edges(spark, PAIRS), seed="s"
        ).collect()
    }
    want, _ = _replica(PAIRS, "s")
    assert got == want


def test_mis_independent_and_maximal(spark):
    for seed in ("a", "b", "c"):
        rows = maximal_independent_set(
            spark, _edges(spark, PAIRS), seed=seed
        ).collect()
        mis = {r["id"] for r in rows if r["in_mis"]}
        outside = {r["id"] for r in rows if not r["in_mis"]}
        adj = {}
        for s, d in PAIRS:
            if s != d:
                adj.setdefault(s, set()).add(d)
                adj.setdefault(d, set()).add(s)
        # independence: no intra-MIS edge
        for v in mis:
            assert not (adj.get(v, set()) & mis)
        # maximality: every outside vertex has a MIS neighbor
        for v in outside:
            assert adj[v] & mis
        # self-loop-only vertex is vacuously in the set, round 1
        by_id = {r["id"]: r for r in rows}
        assert by_id["lone"]["in_mis"] and by_id["lone"]["round"] == 1
        # every vertex decided exactly once
        assert len(rows) == len(mis) + len(outside)


def test_mis_deterministic_and_seed_sensitive(spark):
    e = _edges(spark, PAIRS)
    key = lambda rows: sorted(
        (r["id"], r["in_mis"], r["round"]) for r in rows
    )
    a = key(maximal_independent_set(spark, e, seed="s").collect())
    b = key(maximal_independent_set(spark, e, seed="s").collect())
    assert a == b
    # some seed among a few must change the set (4-cycle has 2 MISs)
    assert any(
        key(maximal_independent_set(spark, e, seed=s2).collect()) != a
        for s2 in ("t", "u", "v")
    )


def test_mis_on_path_graph_rounds(spark):
    # long path: decisions cascade over multiple rounds; replica agrees
    pairs = [(f"n{i}", f"n{i+1}") for i in range(30)]
    got = {
        r["id"]: (r["in_mis"], r["round"])
        for r in maximal_independent_set(
            spark, _edges(spark, pairs), seed="p"
        ).collect()
    }
    want, rounds = _replica(pairs, "p")
    assert got == want
    assert rounds >= 2  # genuinely multi-round on a 31-path
