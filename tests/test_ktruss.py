"""k-truss (graph/ktruss.py) vs networkx.k_truss.

nx.k_truss(G, k) keeps exactly the edges with ≥ k−2 triangles inside
the surviving subgraph; parity is exact edge-set + integer-support
equality on the simple undirected projection.
"""

import random

import networkx as nx
import pytest

from k2_18_spark.graph.ktruss import k_truss


def _edges_df(spark, edge_list):
    return spark.createDataFrame(
        [(f"V{a}", f"V{b}", "LINK", 1.0) for a, b in edge_list],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _collect(df):
    return {(r["id_a"], r["id_b"]): r["support"] for r in df.collect()}


def _nx_truss(edge_list, k):
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in edge_list if a != b)
    t = nx.k_truss(g, k)
    out = {}
    for u, v in t.edges:
        sup = len(set(t[u]) & set(t[v]))
        key = tuple(sorted((f"V{u}", f"V{v}")))
        out[key] = sup
    return out


def _seeded(n=40, m=160, seed=17):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


@pytest.mark.parametrize("k", [3, 4, 5])
@pytest.mark.parametrize("driver_max", [100_000, 0])
def test_parity_random(spark, k, driver_max):
    # both tiers: in-driver cascade finish (default) and the pure
    # distributed peel (driver_finish_max_edges=0) — identical fixpoint
    edge_list = _seeded()
    got = _collect(
        k_truss(
            spark, _edges_df(spark, edge_list), k,
            driver_finish_max_edges=driver_max,
        )
    )
    assert got == _nx_truss(edge_list, k)


def _chain_fixture():
    # K5 with a chain of triangles hanging off it: at k=4 the triangle
    # chain exposes ONE new sub-threshold edge per round (the adversarial
    # O(|E|)-round cascade), the clique stays
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = []
    prev = 4
    for i in range(5, 13):
        chain += [(prev, i), (prev - 1 if prev > 4 else 3, i)]
        prev = i
    return clique + chain


@pytest.mark.parametrize("driver_max", [100_000, 0])
def test_cascade(spark, driver_max):
    edge_list = _chain_fixture()
    got = _collect(
        k_truss(
            spark, _edges_df(spark, edge_list), 4,
            driver_finish_max_edges=driver_max,
        )
    )
    assert got == _nx_truss(edge_list, 4)
    assert set().union(*got) == {f"V{i}" for i in range(5)}


def test_chain_cascade_peels_in_constant_spark_rounds(spark):
    # the driver-tier contract: a multi-round cascade costs ZERO
    # distributed peel rounds (incidence collected up front, exact
    # queue peel in the driver), where the distributed path pays one
    # Spark round per cascade wave — the fixed-per-job overhead the
    # tier exists to remove
    from k2_18_spark.graph import ktruss as kt

    edge_list = _chain_fixture()
    df = _edges_df(spark, edge_list)
    want = _nx_truss(edge_list, 4)

    assert _collect(k_truss(spark, df, 4)) == want
    assert kt.LAST_RUN_ROUNDS == 0

    assert _collect(k_truss(spark, df, 4, driver_finish_max_edges=0)) == want
    assert kt.LAST_RUN_ROUNDS >= 3  # multi-wave cascade on this fixture


def test_k2_keeps_simple_projection(spark):
    edge_list = [(0, 1), (1, 2), (2, 0), (3, 4), (5, 5), (1, 0)]
    got = _collect(k_truss(spark, _edges_df(spark, edge_list), 2))
    assert got == _nx_truss(edge_list, 2)
    assert ("V3", "V4") in got and got[("V3", "V4")] == 0


def test_k_validation(spark):
    with pytest.raises(ValueError):
        k_truss(spark, _edges_df(spark, [(0, 1)]), 1)


def test_checkpoint_resume(spark, tmp_path):
    # driver tier disabled so the capped first run leaves a genuine
    # mid-peel checkpoint behind
    edge_list = _seeded(n=30, m=120, seed=29)
    want = _nx_truss(edge_list, 4)
    ck = str(tmp_path / "ktruss_ck")
    df = _edges_df(spark, edge_list)
    try:
        k_truss(
            spark, df, 4, checkpoint_dir=ck, max_rounds=1,
            driver_finish_max_edges=0,
        )
    except RuntimeError:
        pass
    got = _collect(
        k_truss(spark, df, 4, checkpoint_dir=ck, driver_finish_max_edges=0)
    )
    assert got == want
    # converged marker short-circuits
    again = _collect(
        k_truss(spark, df, 4, checkpoint_dir=ck, driver_finish_max_edges=0)
    )
    assert again == want


def test_checkpoint_resume_driver_tier(spark, tmp_path):
    # the driver-tier finish also writes a converged checkpoint a
    # later run short-circuits on
    edge_list = _seeded(n=30, m=120, seed=31)
    want = _nx_truss(edge_list, 4)
    ck = str(tmp_path / "ktruss_ck_drv")
    df = _edges_df(spark, edge_list)
    got = _collect(k_truss(spark, df, 4, checkpoint_dir=ck))
    assert got == want
    again = _collect(k_truss(spark, df, 4, checkpoint_dir=ck))
    assert again == want
