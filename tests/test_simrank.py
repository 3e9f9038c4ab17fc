"""SimRank (graph/simrank.py) vs a dense numpy replica of the
Jeh-Widom iteration."""

import numpy as np
import pytest

from k2_18_spark.graph.simrank import simrank


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, d) for s, d in pairs], "src_id string, dst_id string"
    )


def _replica(pairs, c, iters):
    nodes = sorted({v for p in pairs for v in p})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    pred = [[] for _ in range(n)]
    for s, d in set(pairs):
        if s != d:
            pred[ix[d]].append(ix[s])
    S = np.eye(n)
    for _ in range(iters):
        N = np.eye(n)
        for a in range(n):
            for b in range(n):
                if a != b and pred[a] and pred[b]:
                    tot = sum(S[i, j] for i in pred[a] for j in pred[b])
                    N[a, b] = c * tot / (len(pred[a]) * len(pred[b]))
        S = N
    return nodes, S


PAIRS = [
    ("u", "pa"), ("u", "pb"),            # classic C example
    ("v", "pb"), ("v", "pc"),
    ("pa", "x"), ("pb", "x"), ("pc", "y"),
    ("x", "u"), ("y", "u"),              # cycles back
]


@pytest.mark.parametrize("iters", [1, 3])
def test_simrank_matches_numpy(spark, iters):
    got = {
        (r["a"], r["b"]): r["sim"]
        for r in simrank(
            spark, _edges(spark, PAIRS), c=0.8, iterations=iters
        ).collect()
    }
    nodes, S = _replica(PAIRS, 0.8, iters)
    want = {}
    for i, a in enumerate(nodes):
        for j, b in enumerate(nodes):
            if a < b and round(S[i, j], 6) > 1e-4:
                want[(a, b)] = round(S[i, j], 6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 2e-6, (k, got[k], want[k])


def test_simrank_shared_parent_is_c(spark):
    got = {
        (r["a"], r["b"]): r["sim"]
        for r in simrank(
            spark, _edges(spark, [("u", "pa"), ("u", "pb")]), c=0.8,
            iterations=1,
        ).collect()
    }
    assert got == {("pa", "pb"): 0.8}


def test_simrank_guard(spark):
    with pytest.raises(ValueError, match="max_nodes"):
        simrank(spark, _edges(spark, PAIRS), max_nodes=3)


def test_simrank_no_common_ancestors_empty(spark):
    # disjoint chains share no in-link structure -> no nonzero pairs
    out = simrank(
        spark, _edges(spark, [("a", "b"), ("c", "d")]), iterations=3
    ).collect()
    assert out == []
