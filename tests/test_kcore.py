"""k-core decomposition (graph/kcore.py) vs networkx.k_core.

nx.k_core(G, k) returns the maximal subgraph with min degree >= k on
the simple undirected graph — exactly the engine contract (direction
and parallel edges collapsed, self-loops dropped), so parity is exact
set + integer-degree equality, no tolerance.
"""

import random

import networkx as nx
import pytest

from k2_18_spark.graph.kcore import k_core


def _edges_df(spark, edge_list):
    return spark.createDataFrame(
        [(f"V{a}", f"V{b}", "LINK", 1.0) for a, b in edge_list],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _collect(df):
    return {r["id"]: r["degree"] for r in df.collect()}


def _nx_core(edge_list, k):
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in edge_list if a != b)
    core = nx.k_core(g, k)
    return {f"V{n}": core.degree(n) for n in core.nodes}


def _seeded(n=60, m=150, seed=7):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


@pytest.mark.parametrize("k", [2, 3, 4])
def test_parity_random(spark, k):
    edge_list = _seeded()
    got = _collect(k_core(spark, _edges_df(spark, edge_list), k))
    assert got == _nx_core(edge_list, k)


def test_lollipop_cascade(spark):
    # K6 with a 12-vertex dangling path: the 3-core is the clique and
    # the tail peels ONE vertex per round — exercises a long cascade
    # (the loop must not stop at the first fixpoint-looking round).
    clique = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    tail = [(5 + i, 5 + i + 1) for i in range(1, 12)] + [(5, 6)]
    edge_list = clique + tail
    got = _collect(k_core(spark, _edges_df(spark, edge_list), 3))
    assert got == _nx_core(edge_list, 3)
    assert set(got) == {f"V{i}" for i in range(6)}
    assert all(d == 5 for d in got.values())


def test_collapses_direction_parallel_selfloop(spark):
    # 0-1 twice (both directions), 1-1 self-loop, triangle 0-1-2:
    # simple-graph degrees decide the core, not multigraph counts.
    edge_list = [(0, 1), (1, 0), (1, 1), (1, 2), (2, 0), (0, 1)]
    got = _collect(k_core(spark, _edges_df(spark, edge_list), 2))
    assert got == {"V0": 2, "V1": 2, "V2": 2}
    assert _collect(k_core(spark, _edges_df(spark, edge_list), 3)) == {}


def test_k_larger_than_max_degree_empty(spark):
    got = _collect(k_core(spark, _edges_df(spark, _seeded(20, 30)), 50))
    assert got == {}


def test_k_validation(spark):
    with pytest.raises(ValueError):
        k_core(spark, _edges_df(spark, [(0, 1)]), 0)


def test_checkpoint_resume(spark, tmp_ckpt):
    edge_list = _seeded(40, 90, seed=3)
    df = _edges_df(spark, edge_list)
    base = _collect(k_core(spark, df, 3))
    ck1 = _collect(k_core(spark, df, 3, checkpoint_dir=tmp_ckpt, job_name="kc"))
    # second run resumes from the converged marker — same answer
    ck2 = _collect(k_core(spark, df, 3, checkpoint_dir=tmp_ckpt, job_name="kc"))
    assert base == ck1 == ck2 == _nx_core(edge_list, 3)
