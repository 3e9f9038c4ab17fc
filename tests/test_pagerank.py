"""PageRank golden parity: per-vertex allclose 1e-6 vs the reference's
nx.pagerank on all 8 fixtures (north_rule), plus checkpoint/resume."""

import math

import pytest

from k2_18_spark.graph.pagerank import educational_importance, pagerank
from k2_18_spark.io import fixtures
from tests.nx_oracle import nx_pagerank, pagerank_power, to_nx

import networkx as nx


@pytest.mark.parametrize("name", fixtures.FIXTURE_NAMES)
def test_pagerank_matches_networkx(spark, name):
    nodes, edges, data = fixtures.load_fixture(spark, name)
    got = {
        r["id"]: r["rank"]
        for r in pagerank(spark, edges, nodes=nodes, hub_top_k=4).collect()
    }
    want = nx_pagerank(data)
    assert set(got) == set(want)
    for node_id, expected in want.items():
        assert math.isclose(got[node_id], expected, rel_tol=0, abs_tol=1e-6), (
            name,
            node_id,
            got[node_id],
            expected,
        )
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-6)


@pytest.mark.parametrize("name", ["test_educational", "test_weighted_triangle"])
def test_educational_importance_matches_networkx(spark, name):
    from k2_18_spark.schemas import EDUCATIONAL_EDGE_TYPES

    nodes, edges, data = fixtures.load_fixture(spark, name)
    got = {
        r["id"]: r["rank"]
        for r in educational_importance(spark, edges, nodes=nodes).collect()
    }

    g = to_nx(data)
    edu = nx.DiGraph()
    edu.add_nodes_from(g.nodes())
    edu.add_weighted_edges_from(
        (u, v, d.get("weight", 1.0))
        for u, v, d in g.edges(data=True)
        if str(d.get("type", "")).upper() in EDUCATIONAL_EDGE_TYPES
    )
    if edu.number_of_edges() > 0:
        want = pagerank_power(edu, alpha=0.85, weight="weight")
    else:
        want = {n: 1.0 / edu.number_of_nodes() for n in edu.nodes()}

    assert set(got) == set(want)
    for node_id, expected in want.items():
        assert math.isclose(got[node_id], expected, abs_tol=1e-6), (name, node_id)


def test_pagerank_golden_expected_values(spark):
    """Expected files carry 6-decimal rounded pagerank — check within 1e-5."""
    for name in ["test_weighted_triangle", "test_line", "test_star"]:
        nodes, edges, _ = fixtures.load_fixture(spark, name)
        got = {r["id"]: r["rank"] for r in pagerank(spark, edges, nodes=nodes).collect()}
        for node_id, exp in fixtures.expected_node_metrics(name).items():
            if "pagerank" in exp:
                assert math.isclose(got[node_id], exp["pagerank"], abs_tol=5e-6), (
                    name,
                    node_id,
                )


def test_pagerank_checkpoint_resume(spark, tmp_ckpt):
    """Kill-and-resume: run 3 iterations, then resume to convergence from
    the checkpoint — result identical to an uninterrupted run."""
    nodes, edges, data = fixtures.load_fixture(spark, "test_realistic_mini")

    with pytest.raises(Exception):
        pagerank(
            spark, edges, nodes=nodes, max_iter=3, checkpoint_dir=tmp_ckpt, strict=True
        )

    resumed = {
        r["id"]: r["rank"]
        for r in pagerank(spark, edges, nodes=nodes, checkpoint_dir=tmp_ckpt).collect()
    }
    want = nx_pagerank(data)
    for node_id, expected in want.items():
        assert math.isclose(resumed[node_id], expected, abs_tol=1e-6)

    # lineage table exists and covers every checkpointed iteration
    from k2_18_spark.checkpoint import CheckpointStore

    store = CheckpointStore(spark, tmp_ckpt, "pagerank")
    lin = store.lineage().collect()
    assert len(lin) > 0
    iters = {r["iteration"] for r in lin}
    assert 0 in iters and max(iters) >= 3
    assert all(r["rows_out"] >= 0 for r in lin)


def test_pagerank_empty_edges_uniform(spark):
    nodes, edges, _ = fixtures.load_fixture(spark, "test_line")
    empty_edges = edges.filter("1=0")
    got = pagerank(spark, empty_edges, nodes=nodes).collect()
    n = nodes.count()
    assert len(got) == n
    for r in got:
        assert math.isclose(r["rank"], 1.0 / n, abs_tol=1e-12)


# ---- warm start (incremental crawl) ----------------------------------

import random

from k2_18_spark.graph import pagerank as pr_mod


def _rand_edges(spark, n=200, m=800, seed=11, extra=()):
    rng = random.Random(seed)
    pairs = {(f"N{rng.randrange(n)}", f"N{rng.randrange(n)}") for _ in range(m)}
    pairs |= set(extra)
    return spark.createDataFrame(
        [(a, b, "LINK", 1.0) for a, b in sorted(pairs) if a != b],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def test_warm_start_same_fixpoint_fewer_supersteps(spark):
    base = _rand_edges(spark)
    ranks0 = pagerank(spark, base).localCheckpoint(eager=True)

    delta = [("N0", "N199"), ("N42", "N7"), ("NEWPAGE", "N3")]
    updated = _rand_edges(spark, extra=delta)
    cold = {r["id"]: r["rank"] for r in pagerank(spark, updated).collect()}
    cold_iters = pr_mod.LAST_RUN_ITERATIONS

    warm_df = pagerank(spark, updated, init_ranks=ranks0)
    warm_iters = pr_mod.LAST_RUN_ITERATIONS
    warm = {r["id"]: r["rank"] for r in warm_df.collect()}

    assert set(warm) == set(cold)  # NEWPAGE picked up at 1/n
    for k in cold:
        assert math.isclose(warm[k], cold[k], rel_tol=0, abs_tol=2e-5), (
            k, warm[k], cold[k])
    assert warm_iters < cold_iters, (warm_iters, cold_iters)
    assert math.isclose(sum(warm.values()), 1.0, abs_tol=1e-6)


def test_warm_start_identical_graph_converges_immediately(spark):
    base = _rand_edges(spark, seed=23)
    ranks0 = pagerank(spark, base).localCheckpoint(eager=True)
    pagerank(spark, base, init_ranks=ranks0)
    assert pr_mod.LAST_RUN_ITERATIONS <= 2


def test_warm_start_rejects_zero_mass(spark):
    base = _rand_edges(spark, seed=29)
    # init must cover every vertex with zero rank: missing vertices
    # would otherwise be seeded at 1/n > 0
    verts = (
        base.select(base.src_id.alias("id"))
        .union(base.select(base.dst_id.alias("id")))
        .distinct()
    )
    import pyspark.sql.functions as F

    full_zero = verts.select("id", F.lit(0.0).alias("rank"))
    with pytest.raises(ValueError, match="no positive mass"):
        pagerank(spark, base, init_ranks=full_zero)
