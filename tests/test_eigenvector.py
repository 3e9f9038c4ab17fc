"""Eigenvector centrality (graph/eigenvector.py): nx parity on
weighted/unweighted digraphs incl. self-loops, fixed-round determinism
(the oracle mode), convergence failure, and checkpoint resume.
"""

import random

import pytest

from k2_18_spark.graph.eigenvector import eigenvector_centrality
from k2_18_spark.graph.pagerank import PowerIterationFailedConvergence
from tests.test_anf import _edges_df, _seeded_digraph

nx = pytest.importorskip("networkx")


def _wdf(spark, triples):
    return spark.createDataFrame(
        triples, "src_id string, dst_id string, weight double"
    )


def test_matches_nx_weighted(spark):
    rng = random.Random(5)
    pairs = list(
        {(f"v{rng.randrange(80)}", f"v{rng.randrange(80)}") for _ in range(400)}
    )
    triples = [(s, d, rng.choice([0.5, 1.0, 2.0])) for s, d in pairs]
    got = {
        r["id"]: r["eigenvector_centrality"]
        for r in eigenvector_centrality(spark, _wdf(spark, triples)).collect()
    }
    G = nx.DiGraph()
    for s, d, w in triples:
        G.add_edge(s, d, weight=w)
    want = nx.eigenvector_centrality(G, weight="weight")
    assert got.keys() == {str(k) for k in want}
    assert max(abs(got[k] - v) for k, v in want.items()) < 1e-9


def test_matches_nx_unweighted_with_self_loops(spark):
    edge_list = _seeded_digraph(30) + [("v3", "v3"), ("v7", "v7")]
    got = {
        r["id"]: r["eigenvector_centrality"]
        for r in eigenvector_centrality(spark, _edges_df(spark, edge_list)).collect()
    }
    G = nx.DiGraph()
    G.add_edges_from(edge_list)
    want = nx.eigenvector_centrality(G)
    assert max(abs(got[k] - v) for k, v in want.items()) < 1e-9


def test_parallel_edges_sum_weights(spark):
    # two (a,b) rows of weight 1 ≡ one row of weight 2
    dup = _wdf(spark, [("a", "b", 1.0), ("a", "b", 1.0), ("b", "a", 1.0)])
    one = _wdf(spark, [("a", "b", 2.0), ("b", "a", 1.0)])
    g1 = {
        r["id"]: r["eigenvector_centrality"]
        for r in eigenvector_centrality(spark, dup).collect()
    }
    g2 = {
        r["id"]: r["eigenvector_centrality"]
        for r in eigenvector_centrality(spark, one).collect()
    }
    assert g1.keys() == g2.keys()
    assert max(abs(g1[k] - g2[k]) for k in g1) < 1e-12


def test_fixed_iter_deterministic(spark):
    edge_list = _seeded_digraph(25)
    df = _edges_df(spark, edge_list)
    a = sorted(map(tuple, eigenvector_centrality(spark, df, fixed_iter=7).collect()))
    b = sorted(map(tuple, eigenvector_centrality(spark, df, fixed_iter=7).collect()))
    assert a == b


def test_nonconvergence_raises(spark):
    df = _edges_df(spark, _seeded_digraph(25))
    with pytest.raises(PowerIterationFailedConvergence):
        eigenvector_centrality(spark, df, max_iter=2, tol=1e-15)


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src_id string, dst_id string, weight double")
    assert eigenvector_centrality(spark, df).count() == 0


def test_checkpoint_resume(spark, tmp_ckpt):
    edge_list = _seeded_digraph(20)
    df = _edges_df(spark, edge_list)
    full = {
        r["id"]: r["eigenvector_centrality"]
        for r in eigenvector_centrality(spark, df).collect()
    }
    for _ in range(2):  # second call resumes from the converged marker
        got = {
            r["id"]: r["eigenvector_centrality"]
            for r in eigenvector_centrality(
                spark, df, checkpoint_dir=tmp_ckpt, job_name="eig_test"
            ).collect()
        }
        assert got.keys() == full.keys()
        assert max(abs(got[k] - full[k]) for k in full) < 1e-12
