"""WL refinement (graph/wl.py): python-replica parity, isomorphism
invariance, the known 1-WL blind spot, undirected mode, resume."""

import hashlib
import random
from collections import Counter

import pytest

from k2_18_spark.graph.wl import wl_refinement, wl_signature


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _py_wl(edges, rounds=3, directed=True):
    """Pure-python replica of the documented semantics."""
    e = {(s, t) for s, t in edges if s != t}
    if not directed:
        e = e | {(t, s) for s, t in e}
    verts = {v for st in e for v in st}
    out = {v: 0 for v in verts}
    inn = {v: 0 for v in verts}
    for s, t in e:
        out[s] += 1
        inn[t] += 1
    if not directed:
        # symmetrized: out == in == degree, matching the engine
        lab = {v: _md5(f"wl0|{out[v]}|{inn[v]}") for v in verts}
        msgs = [(t, s, "n:") for s, t in e]
    else:
        lab = {v: _md5(f"wl0|{out[v]}|{inn[v]}") for v in verts}
        msgs = [(t, s, "i:") for s, t in e] + [(s, t, "o:") for s, t in e]
    for _ in range(rounds):
        inc = {v: [] for v in verts}
        for v, nbr, tag in msgs:
            inc[v].append(tag + lab[nbr])
        lab = {
            v: _md5(lab[v] + "|" + ",".join(sorted(inc[v])))
            for v in verts
        }
    return lab


def _df(spark, edges):
    return spark.createDataFrame(
        [(s, t, "L", 1.0) for s, t in edges],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def test_replica_parity_random(spark):
    rng = random.Random(7)
    edges = list(
        {
            (f"v{rng.randrange(30)}", f"v{rng.randrange(30)}")
            for _ in range(80)
        }
    )
    for directed in (True, False):
        exp = _py_wl(edges, rounds=3, directed=directed)
        got = {
            r.id: r.wl_label
            for r in wl_refinement(
                spark, _df(spark, edges), rounds=3, directed=directed
            ).collect()
        }
        assert got == exp, directed


def test_isomorphism_invariance(spark):
    rng = random.Random(11)
    edges = list(
        {
            (f"a{rng.randrange(20)}", f"a{rng.randrange(20)}")
            for _ in range(50)
        }
    )
    names = sorted({v for st in edges for v in st})
    perm = dict(zip(names, rng.sample(names, len(names))))
    relabeled = [(perm[s], perm[t]) for s, t in edges]
    la = wl_refinement(spark, _df(spark, edges), rounds=3)
    lb = wl_refinement(spark, _df(spark, relabeled), rounds=3)
    ca = Counter(r.wl_label for r in la.collect())
    cb = Counter(r.wl_label for r in lb.collect())
    assert ca == cb
    assert wl_signature(la) == wl_signature(lb)


def test_distinguishes_path_from_star(spark):
    path = [("p1", "p2"), ("p2", "p3"), ("p3", "p4")]
    star = [("c", "s1"), ("c", "s2"), ("c", "s3")]
    sa = wl_signature(wl_refinement(spark, _df(spark, path), rounds=2))
    sb = wl_signature(wl_refinement(spark, _df(spark, star), rounds=2))
    assert sa != sb


def test_known_blind_spot_c6_vs_2c3(spark):
    """1-WL cannot separate two triangles from a hexagon (all vertices
    2-regular forever) — the documented limitation, asserted so a
    future 'fix' that silently changes semantics fails loudly."""
    c6 = [(f"x{i}", f"x{(i + 1) % 6}") for i in range(6)]
    c3a = [(f"y{i}", f"y{(i + 1) % 3}") for i in range(3)]
    c3b = [(f"z{i}", f"z{(i + 1) % 3}") for i in range(3)]
    sa = wl_signature(
        wl_refinement(spark, _df(spark, c6), rounds=4, directed=False)
    )
    sb = wl_signature(
        wl_refinement(spark, _df(spark, c3a + c3b), rounds=4, directed=False)
    )
    assert sa == sb


def test_parallel_edges_and_self_loops_ignored(spark):
    base = [("a", "b"), ("b", "c")]
    noisy = base + [("a", "b"), ("a", "a")]
    la = {
        r.id: r.wl_label
        for r in wl_refinement(spark, _df(spark, base), rounds=2).collect()
    }
    lb = {
        r.id: r.wl_label
        for r in wl_refinement(spark, _df(spark, noisy), rounds=2).collect()
    }
    assert la == lb


def test_resume_from_checkpoint(spark, tmp_path):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    ck = str(tmp_path / "wl_ck")
    full = {
        r.id: r.wl_label
        for r in wl_refinement(
            spark, _df(spark, edges), rounds=3, checkpoint_dir=ck
        ).collect()
    }
    # marker says final → a re-run returns the stored state untouched
    again = {
        r.id: r.wl_label
        for r in wl_refinement(
            spark, _df(spark, edges), rounds=3, checkpoint_dir=ck
        ).collect()
    }
    assert full == again == _py_wl(edges, rounds=3)
