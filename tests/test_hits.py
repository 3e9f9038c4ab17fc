"""HITS hubs/authorities — graph/hits.py vs a pure-python replica of
the classic Kleinberg power iteration (identical op order: a from
prev h, h from THIS round's unnormalized a, max-normalize via
reciprocal multiply, L1 output normalization)."""

from collections import defaultdict

import pytest

from k2_18_spark.graph.hits import hits
from k2_18_spark.graph.pagerank import PowerIterationFailedConvergence


def hits_power(edge_list, max_iter=100, tol=1e-8, fixed_iter=None):
    wmap = defaultdict(float)
    for u, v, w in edge_list:
        wmap[(u, v)] += w
    verts = sorted({x for e in wmap for x in e})
    n = len(verts)
    h = {v: 1.0 / n for v in verts}
    a = {v: 0.0 for v in verts}
    rounds = fixed_iter if fixed_iter is not None else max_iter
    converged = fixed_iter is not None
    for _ in range(rounds):
        hlast = h
        a = {v: 0.0 for v in verts}
        hh = {v: 0.0 for v in verts}
        for (u, v), w in wmap.items():
            a[v] += hlast[u] * w
        for (u, v), w in wmap.items():
            hh[u] += a[v] * w
        hm = 1.0 / max(hh.values())
        am = 1.0 / max(a.values())
        h = {k: v * hm for k, v in hh.items()}
        a = {k: v * am for k, v in a.items()}
        err = sum(abs(h[x] - hlast[x]) for x in verts)
        if fixed_iter is None and err < tol:
            converged = True
            break
    if not converged:
        raise AssertionError("replica did not converge")
    hs = 1.0 / sum(h.values())
    as_ = 1.0 / sum(a.values())
    return {k: v * hs for k, v in h.items()}, {k: v * as_ for k, v in a.items()}


def _edges_df(spark, edge_list):
    return spark.createDataFrame(
        [(u, v, "LINK", w) for u, v, w in edge_list],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _seeded(n=30):
    edges = []
    for i in range(n):
        edges.append((f"v{i}", f"v{(i + 1) % n}", 1.0 + (i % 4) * 0.5))
        if i % 3 == 0:
            edges.append((f"v{i}", f"v{(i * 7 + 2) % n}", 2.0))
        if i % 4 == 1:
            edges.append((f"v{(i * 5 + 3) % n}", f"v{i}", 0.5))
    return edges


def _dense(n=25):
    """Well-connected digraph (large eigengap → converges < 50 iters
    at tol=1e-8; the sparse ring in _seeded needs ~1000)."""
    return [
        (f"v{i}", f"v{(i * j + j) % n}", 1.0 + ((i + j) % 3) * 0.5)
        for i in range(n)
        for j in (1, 2, 3, 5, 7)
    ]


def _collect(df):
    return {
        r["id"]: (r["hub"], r["authority"]) for r in df.collect()
    }


def test_parity_converged(spark):
    edge_list = _dense()
    got = _collect(hits(spark, _edges_df(spark, edge_list)))
    eh, ea = hits_power(edge_list)
    assert set(got) == set(eh)
    for v in eh:
        assert got[v][0] == pytest.approx(eh[v], abs=1e-9)
        assert got[v][1] == pytest.approx(ea[v], abs=1e-9)


def test_parity_fixed_iter(spark):
    edge_list = _seeded(20)
    got = _collect(hits(spark, _edges_df(spark, edge_list), fixed_iter=7))
    eh, ea = hits_power(edge_list, fixed_iter=7)
    for v in eh:
        assert got[v][0] == pytest.approx(eh[v], abs=1e-12)
        assert got[v][1] == pytest.approx(ea[v], abs=1e-12)


def test_star_closed_form(spark):
    """out-star: the center is the only hub; authorities uniform."""
    edge_list = [("hub", f"l{i}", 1.0) for i in range(5)]
    got = _collect(hits(spark, _edges_df(spark, edge_list)))
    assert got["hub"][0] == pytest.approx(1.0)
    assert got["hub"][1] == pytest.approx(0.0)
    for i in range(5):
        assert got[f"l{i}"][0] == pytest.approx(0.0)
        assert got[f"l{i}"][1] == pytest.approx(0.2)


def test_parallel_edges_sum_weights(spark):
    a = _collect(hits(spark, _edges_df(spark, [("x", "y", 2.0), ("y", "x", 1.0)])))
    b = _collect(
        hits(
            spark,
            _edges_df(spark, [("x", "y", 1.5), ("x", "y", 0.5), ("y", "x", 1.0)]),
        )
    )
    assert a == b


def test_nonconvergence_raises(spark):
    edge_list = _seeded(20)
    with pytest.raises(PowerIterationFailedConvergence):
        hits(spark, _edges_df(spark, edge_list), max_iter=2, tol=1e-15)


def test_checkpoint_resume(spark, tmp_ckpt):
    edge_list = _seeded(15)
    base = _collect(hits(spark, _edges_df(spark, edge_list), fixed_iter=6))
    ck1 = _collect(
        hits(
            spark,
            _edges_df(spark, edge_list),
            fixed_iter=6,
            checkpoint_dir=tmp_ckpt,
            job_name="hits_test",
        )
    )
    # resume: state for all 6 rounds exists → loop body never re-runs
    ck2 = _collect(
        hits(
            spark,
            _edges_df(spark, edge_list),
            fixed_iter=6,
            checkpoint_dir=tmp_ckpt,
            job_name="hits_test",
        )
    )
    for v in base:
        assert ck1[v] == pytest.approx(base[v], abs=1e-12)
        assert ck2[v] == ck1[v]
