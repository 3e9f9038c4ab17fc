"""Random-walk corpus generation (graph/walks.py) vs an independent
pure-Python follower that replays the md5-argmin / exponential-race
step rule on a dict adjacency."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from k2_18_spark.graph.walks import node2vec_walks, random_walks


def _edges(spark, rows):
    return spark.createDataFrame(
        [(s, d, float(w)) for s, d, w in rows],
        "src_id string, dst_id string, weight double",
    )


ROWS = [
    ("a", "b", 1.0), ("a", "c", 2.0), ("a", "d", 0.5),
    ("b", "c", 1.0), ("b", "a", 1.0),
    ("c", "a", 3.0), ("c", "d", 1.0),
    ("d", "e", 1.0),            # e is dangling: walks end there
    ("a", "a", 9.0),            # self-loop: must be ignored
    ("c", "d", 2.0),            # parallel edge: one candidate, w summed
]


def _u(h: str) -> float:
    return (int(h[:15], 16) + 1.0) / float(1 << 60)


def _replica(rows, walk_length, num_walks, seed, weighted, directed):
    adj: dict[str, dict[str, float]] = {}

    def add(s, d, w):
        if s == d:
            return
        adj.setdefault(s, {})
        adj[s][d] = adj[s].get(d, 0.0) + w if weighted else 1.0

    for s, d, w in rows:
        add(s, d, w)
        if not directed:
            add(d, s, w)
    out = {}
    for start in sorted(adj):
        for k in range(num_walks):
            wid = f"{start}#{k}"
            cur, seq = start, [start]
            for t in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                best = None
                for dst, w in nbrs.items():
                    h = hashlib.md5(
                        f"{seed}|{wid}|{t}|{dst}".encode()
                    ).hexdigest()
                    key = (-math.log(_u(h)) / w, dst) if weighted else (h, dst)
                    if best is None or key < best[0]:
                        best = (key, dst)
                cur = best[1]
                seq.append(cur)
            out[wid] = seq
    return out


@pytest.mark.parametrize("directed", [True, False])
def test_walks_match_replica(spark, directed):
    got = {
        r["walk_id"]: list(r["seq"])
        for r in random_walks(
            spark, _edges(spark, ROWS), walk_length=6, num_walks=3,
            seed="s1", directed=directed,
        ).collect()
    }
    want = _replica(ROWS, 6, 3, "s1", False, directed)
    assert got == want


def test_weighted_walks_match_replica(spark):
    got = {
        r["walk_id"]: list(r["seq"])
        for r in random_walks(
            spark, _edges(spark, ROWS), walk_length=6, num_walks=2,
            seed="s2", weighted=True,
        ).collect()
    }
    assert got == _replica(ROWS, 6, 2, "s2", True, True)


def test_walks_deterministic_and_seed_sensitive(spark):
    e = _edges(spark, ROWS)
    a = random_walks(spark, e, 5, 2, seed="x").collect()
    b = random_walks(spark, e, 5, 2, seed="x").collect()
    c = random_walks(spark, e, 5, 2, seed="y").collect()
    key = lambda rows: sorted((r["walk_id"], tuple(r["seq"])) for r in rows)
    assert key(a) == key(b)
    assert key(a) != key(c)


def test_dangling_truncation_and_length(spark):
    rows = random_walks(spark, _edges(spark, ROWS), 10, 1, seed="z").collect()
    by_id = {r["walk_id"]: r for r in rows}
    # any walk reaching e stops there (e has no out-edges)
    for r in rows:
        seq = list(r["seq"])
        assert r["length"] == len(seq)
        if "e" in seq:
            assert seq.index("e") == len(seq) - 1
        assert len(seq) <= 11
    assert by_id["d#0"]["seq"] == ["d", "e"]


def test_starts_subset_and_walk_count(spark):
    starts = spark.createDataFrame([("a",), ("d",)], "id string")
    rows = random_walks(
        spark, _edges(spark, ROWS), 4, 3, seed="q", starts=starts
    ).collect()
    ids = {r["walk_id"] for r in rows}
    assert ids == {f"{s}#{k}" for s in ("a", "d") for k in range(3)}
    for r in rows:
        assert r["start_id"] == r["walk_id"].split("#")[0]
        assert r["seq"][0] == r["start_id"]


def test_skipgram_pairs_exact(spark):
    from k2_18_spark.graph.walks import skipgram_pairs

    walks = spark.createDataFrame(
        [("w0", ["a", "b", "c", "d"]), ("w1", ["x", "y"])],
        "walk_id string, seq array<string>",
    )
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in skipgram_pairs(walks, window=2).collect()
    }
    want = {}
    for seq in (["a", "b", "c", "d"], ["x", "y"]):
        for i, c in enumerate(seq):
            for d in (-2, -1, 1, 2):
                if 0 <= i + d < len(seq):
                    k = (c, seq[i + d])
                    want[k] = want.get(k, 0) + 1
    assert got == want
    assert got[("a", "b")] == 1 and got[("b", "a")] == 1
    assert ("a", "d") not in got  # outside window


def test_skipgram_pairs_counts_aggregate(spark):
    from k2_18_spark.graph.walks import skipgram_pairs

    walks = spark.createDataFrame(
        [("w0", ["a", "b"]), ("w1", ["a", "b"]), ("w2", ["b", "a"])],
        "walk_id string, seq array<string>",
    )
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in skipgram_pairs(walks, window=1).collect()
    }
    assert got == {("a", "b"): 3, ("b", "a"): 3}


def test_weighted_bias_on_planted_graph(spark):
    # hub h -> (heavy w=50, light w=1): the exponential race must pick
    # `heavy` for the large majority of 200 independent walk steps
    e = _edges(spark, [("h", "heavy", 50.0), ("h", "light", 1.0)])
    rows = random_walks(spark, e, 1, 200, seed="bias", weighted=True).collect()
    picks = [r["seq"][1] for r in rows]
    frac_heavy = picks.count("heavy") / len(picks)
    assert frac_heavy > 0.9


def test_ppmi_matches_replica(spark):
    """ppmi_scores over a hand-built pair table vs direct math."""
    import math

    import pyspark.sql.functions as F

    from k2_18_spark.graph.walks import ppmi_scores

    pairs = spark.createDataFrame(
        [("a", "b", 4), ("a", "c", 1), ("b", "a", 4), ("c", "a", 1)],
        "center string, context string, n_pairs long",
    )
    out = {
        (r.center, r.context): (r.pmi, r.ppmi)
        for r in ppmi_scores(pairs, shift=1.0).collect()
    }
    n = 10
    marg_c = {"a": 5, "b": 4, "c": 1}
    marg_x = {"b": 4, "c": 1, "a": 5}
    for (c, x), cnt in [(("a", "b"), 4), (("a", "c"), 1),
                        (("b", "a"), 4), (("c", "a"), 1)]:
        pmi = math.log(cnt * n / (marg_c[c] * marg_x[x]))
        assert out[(c, x)][0] == round(pmi, 6), (c, x)
        assert out[(c, x)][1] == round(max(pmi - 1.0, 0.0), 6), (c, x)


# ---- node2vec (second-order biased walks) ----

def _n2v_replica(rows, walk_length, num_walks, seed, p, q,
                 weighted, directed):
    adj: dict[str, dict[str, float]] = {}

    def add(s, d, w):
        if s == d:
            return
        adj.setdefault(s, {})
        adj[s][d] = adj[s].get(d, 0.0) + w if weighted else 1.0

    for s, d, w in rows:
        add(s, d, w)
        if not directed:
            add(d, s, w)
    out = {}
    for start in sorted(adj):
        for k in range(num_walks):
            wid = f"{start}#{k}"
            prev, cur, seq = None, start, [start]
            for t in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                best = None
                for dst, w in nbrs.items():
                    if prev is None:
                        alpha = 1.0
                    elif dst == prev:
                        alpha = 1.0 / p
                    elif dst in adj.get(prev, {}):
                        alpha = 1.0
                    else:
                        alpha = 1.0 / q
                    h = hashlib.md5(
                        f"{seed}|{wid}|{t}|{dst}".encode()
                    ).hexdigest()
                    key = (-math.log(_u(h)) / (w * alpha), dst)
                    if best is None or key < best:
                        best = key
                prev, cur = cur, best[1]
                seq.append(cur)
            out[wid] = seq
    return out


@pytest.mark.parametrize("directed", [True, False])
def test_node2vec_matches_replica(spark, directed):
    got = {
        r["walk_id"]: list(r["seq"])
        for r in node2vec_walks(
            spark, _edges(spark, ROWS), walk_length=6, num_walks=3,
            p=4.0, q=0.25, seed="nv", directed=directed,
        ).collect()
    }
    assert got == _n2v_replica(ROWS, 6, 3, "nv", 4.0, 0.25, False, directed)


def test_node2vec_weighted_matches_replica(spark):
    got = {
        r["walk_id"]: list(r["seq"])
        for r in node2vec_walks(
            spark, _edges(spark, ROWS), walk_length=5, num_walks=2,
            p=0.5, q=2.0, seed="nw", weighted=True,
        ).collect()
    }
    assert got == _n2v_replica(ROWS, 5, 2, "nw", 0.5, 2.0, True, True)


def test_node2vec_pq1_degenerates_to_first_order(spark):
    """p = q = 1 must reproduce random_walks(weighted=True)
    bit-identically (same seed, same race keys)."""
    e = _edges(spark, ROWS)
    key = lambda rows: sorted((r["walk_id"], tuple(r["seq"])) for r in rows)
    a = node2vec_walks(spark, e, 6, 2, p=1.0, q=1.0, seed="z",
                       weighted=True)
    b = random_walks(spark, e, 6, 2, seed="z", weighted=True)
    assert key(a.collect()) == key(b.collect())


def test_node2vec_large_p_never_backtracks(spark):
    """On an undirected path graph with p → ∞, a walk only returns to
    ``prev`` when it is the SOLE candidate (path endpoints)."""
    path = [("n0", "n1", 1.0), ("n1", "n2", 1.0), ("n2", "n3", 1.0),
            ("n3", "n4", 1.0)]
    rows = node2vec_walks(
        spark, _edges(spark, path), walk_length=6, num_walks=4,
        p=1e9, q=1.0, seed="bp", directed=False,
    ).collect()
    ends = {"n0", "n4"}
    for r in rows:
        seq = list(r["seq"])
        for i in range(2, len(seq)):
            if seq[i] == seq[i - 2]:          # a backtrack
                assert seq[i - 1] in ends     # only forced at endpoints
