"""Harmonic centrality: exact driver-CSR path (centrality.py) vs
nx.harmonic_centrality at 1e-9, sampled-source estimator sanity, and
the HyperBall scale path (anf.harmonic_anf): python-replica bit/float
parity, accuracy vs exact, determinism, and checkpoint resume.
"""

import random

import pytest

from k2_18_spark.graph.anf import harmonic_anf
from k2_18_spark.graph.centrality import harmonic_centrality
from tests.test_anf import _edges_df, _py_anf, _seeded_digraph

nx = pytest.importorskip("networkx")

PHI = 0.77351


def _random_digraph(n, m, seed):
    rng = random.Random(seed)
    return list(
        {(f"v{rng.randrange(n)}", f"v{rng.randrange(n)}") for _ in range(m)}
    )


def test_exact_matches_nx_unweighted(spark):
    edge_list = _random_digraph(120, 500, 3)
    got = {
        r["id"]: r["harmonic_centrality"]
        for r in harmonic_centrality(spark, _edges_df(spark, edge_list)).collect()
    }
    G = nx.DiGraph()
    G.add_edges_from(edge_list)
    want = nx.harmonic_centrality(G)
    assert got.keys() == {str(k) for k in want}
    assert max(abs(got[k] - v) for k, v in want.items()) < 1e-9


def test_exact_matches_nx_weighted(spark):
    rng = random.Random(9)
    pairs = _random_digraph(50, 200, 9)
    edges = [(s, d, rng.choice([0.5, 1.0, 2.0, 4.0])) for s, d in pairs]
    df = spark.createDataFrame(edges, "src_id string, dst_id string, weight double")
    got = {
        r["id"]: r["harmonic_centrality"]
        for r in harmonic_centrality(spark, df).collect()
    }
    G = nx.DiGraph()
    for s, d, w in edges:
        G.add_edge(s, d, inv=1.0 / w)
    want = nx.harmonic_centrality(G, distance="inv")
    assert max(abs(got[k] - v) for k, v in want.items()) < 1e-9


def test_sampled_sources_estimate(spark):
    # directed cycle: every source contributes the same distance
    # multiset, so the n/k-rescaled stride sample is close to exact
    n = 60
    edge_list = [(f"v{i:02d}", f"v{(i + 1) % n:02d}") for i in range(n)]
    df = _edges_df(spark, edge_list)
    exact = sum(1.0 / d for d in range(1, n))
    got = {
        r["id"]: r["harmonic_centrality"]
        for r in harmonic_centrality(spark, df, sample_k=12).collect()
    }
    assert len(got) == n
    mean = sum(got.values()) / n
    assert abs(mean - exact) / exact < 0.15


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src_id string, dst_id string, weight double")
    assert harmonic_centrality(spark, df).count() == 0


def _py_harmonic_replica(edge_list, registers):
    """Deterministic float replica of harmonic_anf: reuse the python FM
    replica on REVERSED edges and fold estimate deltas exactly like the
    engine's column expression (same op order: 2^(Σbits/R)/φ)."""
    rev = [(d, s) for s, d in edge_list]
    snaps, rounds = _py_anf(rev, registers)

    def est(regs):
        bits = sum(((m + 1) & ~m).bit_length() - 1 for m in regs)
        return 2.0 ** (bits / float(registers)) / PHI

    verts = sorted(snaps[0])
    h = {v: 0.0 for v in verts}
    for t in range(1, len(snaps)):
        for v in verts:
            d = est(snaps[t][v]) - est(snaps[t - 1][v])
            h[v] += max(d, 0.0) / float(t)
    return h, rounds


def test_hyperball_matches_python_replica(spark):
    edge_list = _seeded_digraph(25)
    res = harmonic_anf(spark, _edges_df(spark, edge_list), registers=4)
    want, rounds = _py_harmonic_replica(edge_list, 4)
    assert res.rounds == rounds
    got = {r["id"]: r["harmonic_estimate"] for r in res.sketches.collect()}
    assert got.keys() == want.keys()
    assert max(abs(got[k] - v) for k, v in want.items()) < 1e-9


def test_hyperball_accuracy_vs_exact(spark):
    edge_list = _random_digraph(200, 800, 7)
    df = _edges_df(spark, edge_list)
    exact = {
        r["id"]: r["harmonic_centrality"]
        for r in harmonic_centrality(spark, df).collect()
    }
    est = {
        r["id"]: r["harmonic_estimate"]
        for r in harmonic_anf(spark, df, registers=32).sketches.collect()
    }
    rel = [abs(est[k] - v) / v for k, v in exact.items() if v > 5.0]
    assert rel, "graph too sparse for the accuracy gate"
    assert sum(rel) / len(rel) < 0.15  # FM std err at R=32 ≈ 0.14
    assert max(rel) < 0.5


def test_hyperball_checkpoint_resume(spark, tmp_ckpt):
    edge_list = _seeded_digraph(20)
    df = _edges_df(spark, edge_list)
    full = harmonic_anf(spark, df, registers=4)
    ck = harmonic_anf(
        spark, df, registers=4, checkpoint_dir=tmp_ckpt, job_name="harm_test"
    )
    again = harmonic_anf(
        spark, df, registers=4, checkpoint_dir=tmp_ckpt, job_name="harm_test"
    )
    base = {
        r["id"]: r["harmonic_estimate"] for r in full.sketches.collect()
    }
    for res in (ck, again):
        got = {r["id"]: r["harmonic_estimate"] for r in res.sketches.collect()}
        assert got.keys() == base.keys()
        assert max(abs(got[k] - base[k]) for k in base) < 1e-12
