"""Jones-Plassmann coloring (graph/coloring.py): proper-coloring +
mex properties, and exact round/color parity vs a pure-Python replica
of the fixed-priority rule."""

import hashlib

from k2_18_spark.graph.coloring import greedy_coloring


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
    pri = {
        v: (hashlib.md5(f"{seed}|{v}".encode()).hexdigest(), v) for v in adj
    }
    unc = set(adj)
    out = {}
    r = 0
    while unc:
        r += 1
        cand = {
            v for v in unc if all(pri[v] > pri[u] for u in adj[v] if u in unc)
        }
        for v in cand:
            used = {out[u][0] for u in adj[v] if u in out}
            c = 0
            while c in used:
                c += 1
            out[v] = (c, r)
        unc -= cand
    return out


PAIRS = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
    ("c", "e"), ("e", "f"), ("f", "g"),
    ("x", "y"), ("y", "z"), ("z", "x"),
    ("hub", "a"), ("hub", "c"), ("hub", "e"), ("hub", "x"),
    ("solo", "solo"),
]


def test_coloring_matches_replica(spark):
    got = {
        r["id"]: (r["color"], r["round"])
        for r in greedy_coloring(spark, _edges(spark, PAIRS), seed="s").collect()
    }
    assert got == _replica(PAIRS, "s")


def test_coloring_proper_and_compact(spark):
    for seed in ("a", "b"):
        rows = greedy_coloring(
            spark, _edges(spark, PAIRS), seed=seed
        ).collect()
        color = {r["id"]: r["color"] for r in rows}
        adj = {}
        deg = {}
        for s, d in PAIRS:
            if s != d:
                adj.setdefault(s, set()).add(d)
                adj.setdefault(d, set()).add(s)
        for v, ns in adj.items():
            deg[v] = len(ns)
            for u in ns:
                assert color[v] != color[u]
            # mex property: every smaller color appears in the
            # neighborhood (else the vertex would have taken it)
            nb_colors = {color[u] for u in ns}
            for c in range(color[v]):
                assert c in nb_colors
        # bound: chi <= max degree + 1
        assert max(color.values()) <= max(deg.values())
        # triangle x-y-z needs 3 colors
        assert len({color["x"], color["y"], color["z"]}) == 3
        # self-loop-only vertex colors 0 in round 1
        by_id = {r["id"]: r for r in rows}
        assert by_id["solo"]["color"] == 0 and by_id["solo"]["round"] == 1


def test_coloring_deterministic(spark):
    e = _edges(spark, PAIRS)
    key = lambda rows: sorted((r["id"], r["color"], r["round"]) for r in rows)
    assert key(greedy_coloring(spark, e, seed="s").collect()) == key(
        greedy_coloring(spark, e, seed="s").collect()
    )


def test_coloring_path_cascade(spark):
    pairs = [(f"n{i}", f"n{i+1}") for i in range(24)]
    got = {
        r["id"]: (r["color"], r["round"])
        for r in greedy_coloring(spark, _edges(spark, pairs), seed="p").collect()
    }
    want = _replica(pairs, "p")
    assert got == want
    assert max(c for c, _ in got.values()) <= 2  # path is 2-3 colorable
