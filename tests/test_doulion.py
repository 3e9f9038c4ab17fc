"""DOULION sampled triangle counting — G8 scale tier
(Tsourakakis et al., KDD'09; deterministic md5-threshold coin)."""

import hashlib
import itertools
import math

from k2_18_spark.graph.triangles import doulion_triangles, triangle_count
from tests.test_lpa_triangles import clique, make_graph


def _py_doulion(edge_list, p, seed="doulion"):
    """Pure-Python replica: same md5 coin, brute-force triangles."""
    thr = format(int(p * (16**15)), "015x")
    und = sorted({(min(a, b), max(a, b)) for a, b, _ in edge_list if a != b})
    kept = [
        (a, b)
        for a, b in und
        if hashlib.md5(f"{seed}|{a}|{b}".encode()).hexdigest()[:15] < thr
    ]
    ks = set(kept)
    verts = sorted({v for e in kept for v in e})
    tri = sum(
        1
        for x, y, z in itertools.combinations(verts, 3)
        if (x, y) in ks and (x, z) in ks and (y, z) in ks
    )
    return len(und), len(kept), tri


def _edge_list():
    # three cliques bridged by a path: plenty of triangles, some kept
    el = clique("a", 8) + clique("b", 7) + clique("c", 6)
    el += [("a0", "b0", 1.0), ("b0", "c0", 1.0)]
    return el


def test_doulion_p1_is_exact(spark):
    el = _edge_list()
    nodes, edges = make_graph(spark, el)
    row = doulion_triangles(spark, edges, p=1.0).collect()[0]
    exact = triangle_count(spark, edges)
    assert row["n_kept"] == row["n_edges"]
    assert row["tri_sampled"] == exact
    assert row["estimate"] == float(exact)


def test_doulion_matches_python_replica(spark):
    el = _edge_list()
    nodes, edges = make_graph(spark, el)
    for p in (0.9, 0.6, 0.35):
        row = doulion_triangles(spark, edges, p=p).collect()[0]
        n_edges, n_kept, tri = _py_doulion(el, p)
        assert row["n_edges"] == n_edges, p
        assert row["n_kept"] == n_kept, p
        assert row["tri_sampled"] == tri, p
        assert math.isclose(
            row["estimate"], round(tri * (1.0 / (p * p * p)), 6), abs_tol=1e-9
        ), p


def test_doulion_deterministic(spark):
    nodes, edges = make_graph(spark, _edge_list())
    a = doulion_triangles(spark, edges, p=0.5).collect()[0]
    b = doulion_triangles(spark, edges, p=0.5).collect()[0]
    assert a == b


def test_doulion_reasonable_on_dense_graph(spark):
    """On a triangle-rich graph the p=0.7 estimate lands within 60%
    of truth (deterministic sample, so this is a fixed assertion,
    not a flaky statistical one)."""
    el = clique("k", 14)
    nodes, edges = make_graph(spark, el)
    exact = triangle_count(spark, edges)
    row = doulion_triangles(spark, edges, p=0.7).collect()[0]
    assert exact == 364  # C(14,3)
    assert abs(row["estimate"] - exact) / exact < 0.6
