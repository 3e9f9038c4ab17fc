"""Katz centrality (graph/katz.py) vs networkx.katz_centrality
(pure-python iteration — no scipy needed) on seeded random digraphs,
plus fixed-iter determinism, DAG behavior, and kill/resume."""

import random

import networkx as nx
import pytest

from k2_18_spark.graph.katz import katz_centrality
from k2_18_spark.graph.pagerank import PowerIterationFailedConvergence


def _edges_df(spark, rows):
    return spark.createDataFrame(
        [(f"V{a}", f"V{b}", "L", float(w)) for a, b, w in rows],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _nx_graph(rows):
    g = nx.DiGraph()
    for a, b, w in rows:
        if g.has_edge(a, b):
            g[a][b]["weight"] += w
        else:
            g.add_edge(a, b, weight=w)
    return g


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_nx(spark, seed):
    rng = random.Random(seed)
    rows = [
        (rng.randrange(12), rng.randrange(12), rng.choice([1.0, 2.0]))
        for _ in range(30)
    ]
    g = _nx_graph(rows)
    g.add_nodes_from(range(12))
    want = nx.katz_centrality(
        g, alpha=0.05, beta=1.0, tol=1e-10, max_iter=2000, weight="weight"
    )
    got = {
        r["id"]: r["katz_centrality"]
        for r in katz_centrality(
            spark, _edges_df(spark, rows), alpha=0.05, tol=1e-10, max_iter=2000
        ).collect()
    }
    assert set(got) == {f"V{v}" for v in g.nodes}
    for v, x in want.items():
        assert abs(got[f"V{v}"] - x) < 1e-7, v


def test_dag_finite_and_ordered(spark):
    # chain: downstream accumulates attenuated walk counts — strictly
    # increasing along the chain (where eigenvector centrality is
    # degenerate on a DAG)
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)]
    got = {
        r["id"]: r["katz_centrality"]
        for r in katz_centrality(spark, _edges_df(spark, rows), alpha=0.5).collect()
    }
    assert got["V0"] < got["V1"] < got["V2"] < got["V3"]


def test_divergent_alpha_raises(spark):
    # a 2-cycle has lambda_max = 1; alpha = 1 diverges
    rows = [(0, 1, 1.0), (1, 0, 1.0)]
    with pytest.raises(PowerIterationFailedConvergence):
        katz_centrality(spark, _edges_df(spark, rows), alpha=1.0, max_iter=50)


def test_fixed_iter_deterministic(spark):
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (0, 2, 2.0)]
    a = katz_centrality(spark, _edges_df(spark, rows), fixed_iter=7)
    b = katz_centrality(spark, _edges_df(spark, rows), fixed_iter=7)
    assert {(r["id"], r["katz_centrality"]) for r in a.collect()} == {
        (r["id"], r["katz_centrality"]) for r in b.collect()
    }


def test_resume_from_checkpoint(spark, tmp_path):
    rows = [(i, (i * 3 + 1) % 9, 1.0) for i in range(9)]
    ckpt = str(tmp_path / "ck")
    partial = katz_centrality(
        spark, _edges_df(spark, rows), fixed_iter=3, checkpoint_dir=ckpt
    )
    partial.count()
    full = katz_centrality(
        spark, _edges_df(spark, rows), alpha=0.1, tol=1e-10,
        max_iter=500, checkpoint_dir=ckpt,
    )
    cold = katz_centrality(
        spark, _edges_df(spark, rows), alpha=0.1, tol=1e-10, max_iter=500
    )
    got = {r["id"]: r["katz_centrality"] for r in full.collect()}
    want = {r["id"]: r["katz_centrality"] for r in cold.collect()}
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9
