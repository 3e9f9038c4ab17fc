"""Personalized PageRank parity vs the pure-Python nx-semantics oracle
(allclose 1e-6 per vertex), plus seed validation, dangling
redistribution to the seed set, and checkpoint/resume."""

import math

import pytest

from k2_18_spark.graph.pagerank import (
    PowerIterationFailedConvergence,
    personalized_pagerank,
)
from k2_18_spark.io import fixtures
from tests.nx_oracle import pagerank_power, to_nx


def _got(spark, edges, nodes, seeds, **kw):
    return {
        r["id"]: r["rank"]
        for r in personalized_pagerank(
            spark, edges, seeds, nodes=nodes, hub_top_k=4, **kw
        ).collect()
    }


def _want(data, seeds):
    g = to_nx(data)
    return pagerank_power(g, personalization={s: 1.0 for s in seeds})


def _assert_close(got, want):
    assert set(got) == set(want)
    for node_id, expected in want.items():
        assert math.isclose(got[node_id], expected, rel_tol=0, abs_tol=1e-6), (
            node_id,
            got[node_id],
            expected,
        )
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-6)


@pytest.mark.parametrize("name", fixtures.FIXTURE_NAMES)
def test_ppr_matches_oracle_single_seed(spark, name):
    nodes, edges, data = fixtures.load_fixture(spark, name)
    seed = sorted(data["nodes"], key=lambda n: n["id"])[0]["id"]
    _assert_close(
        _got(spark, edges, nodes, [seed]), _want(data, [seed])
    )


@pytest.mark.parametrize(
    "name", ["test_realistic_mini", "test_disconnected", "test_star"]
)
def test_ppr_matches_oracle_multi_seed(spark, name):
    nodes, edges, data = fixtures.load_fixture(spark, name)
    ids = sorted(n["id"] for n in data["nodes"])
    seeds = ids[::2][:3]  # up to three spread-out seeds
    _assert_close(_got(spark, edges, nodes, seeds), _want(data, seeds))


def test_ppr_dangling_mass_returns_to_seeds(spark):
    # chain a -> b -> c: c is dangling, its mass teleports to the seed,
    # not uniformly — rank concentrates on the seed side vs global PR
    edges = spark.createDataFrame(
        [("a", "b", "LINK", 1.0), ("b", "c", "LINK", 1.0)],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    got = _got(spark, edges, None, ["a"])
    data = {
        "nodes": [{"id": i} for i in "abc"],
        "edges": [
            {"source": "a", "target": "b", "weight": 1.0},
            {"source": "b", "target": "c", "weight": 1.0},
        ],
    }
    _assert_close(got, _want(data, ["a"]))
    assert got["a"] > got["c"]


def test_ppr_seed_validation(spark):
    edges = spark.createDataFrame(
        [("a", "b", "LINK", 1.0)],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    with pytest.raises(ValueError):
        personalized_pagerank(spark, edges, [])
    with pytest.raises(ValueError):
        personalized_pagerank(spark, edges, ["zzz"]).collect()
    # unknown seeds alongside a real one are ignored
    got = _got(spark, edges, None, ["a", "zzz"])
    data = {
        "nodes": [{"id": "a"}, {"id": "b"}],
        "edges": [{"source": "a", "target": "b", "weight": 1.0}],
    }
    _assert_close(got, _want(data, ["a"]))


def test_ppr_checkpoint_resume(spark, tmp_path):
    nodes, edges, data = fixtures.load_fixture(spark, "test_realistic_mini")
    seeds = [sorted(n["id"] for n in data["nodes"])[0]]
    ck = str(tmp_path / "ppr_ck")
    with pytest.raises(PowerIterationFailedConvergence):
        personalized_pagerank(
            spark, edges, seeds, nodes=nodes, checkpoint_dir=ck, max_iter=3
        )
    got = {
        r["id"]: r["rank"]
        for r in personalized_pagerank(
            spark, edges, seeds, nodes=nodes, checkpoint_dir=ck
        ).collect()
    }
    _assert_close(got, _want(data, seeds))
    # converged marker short-circuits a third run
    again = {
        r["id"]: r["rank"]
        for r in personalized_pagerank(
            spark, edges, seeds, nodes=nodes, checkpoint_dir=ck
        ).collect()
    }
    assert again == got
