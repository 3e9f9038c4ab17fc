"""TrustRank / spam-mass parity vs the pure-Python nx-semantics power
iteration (allclose 1e-6 per vertex), spam-farm behavioral separation,
and inverse-PageRank seed selection determinism."""

import math

import pytest

from k2_18_spark.graph.trustrank import select_trust_seeds, spam_mass, trustrank
from k2_18_spark.io import fixtures
from tests.nx_oracle import pagerank_power, to_nx


def _assert_close(got, want, abs_tol=1e-6):
    assert set(got) == set(want)
    for node_id, expected in want.items():
        assert math.isclose(got[node_id], expected, rel_tol=0, abs_tol=abs_tol), (
            node_id,
            got[node_id],
            expected,
        )


@pytest.mark.parametrize("name", ["test_realistic_mini", "test_star"])
def test_trustrank_matches_seeded_power_iteration(spark, name):
    nodes, edges, data = fixtures.load_fixture(spark, name)
    ids = sorted(n["id"] for n in data["nodes"])
    trusted = ids[::3][:2]
    got = {
        r["id"]: r["trust"]
        for r in trustrank(
            spark, edges, trusted, nodes=nodes, hub_top_k=4
        ).collect()
    }
    want = pagerank_power(
        to_nx(data), personalization={s: 1.0 for s in trusted}
    )
    _assert_close(got, want)


def test_spam_mass_identity_and_parity(spark):
    nodes, edges, data = fixtures.load_fixture(spark, "test_realistic_mini")
    trusted = [sorted(n["id"] for n in data["nodes"])[0]]
    rows = spam_mass(spark, edges, trusted, nodes=nodes).collect()
    g = to_nx(data)
    want_pr = pagerank_power(g)
    want_tr = pagerank_power(g, personalization={s: 1.0 for s in trusted})
    _assert_close({r["id"]: r["rank"] for r in rows}, want_pr)
    _assert_close({r["id"]: r["trust"] for r in rows}, want_tr)
    for r in rows:
        # the published decomposition, exactly as computed
        assert math.isclose(
            r["spam_mass"], r["rank"] - r["trust"], abs_tol=1e-12
        )
        assert math.isclose(
            r["rel_spam_mass"], r["spam_mass"] / r["rank"], abs_tol=1e-12
        )


def test_spam_mass_separates_a_spam_farm(spark):
    # good core g0<->g1<->g2 (trusted g0) linking to an honest page h;
    # a spam farm f0..f3 of mutual links boosting a target page t.
    # No trusted page can reach the farm, so its trust is ~0 and its
    # relative mass ~1; pages reachable from g0 score far lower.
    good = [("g0", "g1"), ("g1", "g2"), ("g2", "g0"), ("g1", "h")]
    farm = [
        (a, b)
        for a in ("f0", "f1", "f2", "f3")
        for b in ("f0", "f1", "f2", "f3", "t")
        if a != b
    ] + [("t", "f0")]
    edges = spark.createDataFrame(
        [(a, b, "LINK", 1.0) for a, b in good + farm],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    rel = {
        r["id"]: r["rel_spam_mass"]
        for r in spam_mass(spark, edges, ["g0"]).collect()
    }
    for spam_page in ("f0", "f1", "f2", "f3", "t"):
        assert rel[spam_page] > 0.9, (spam_page, rel[spam_page])
    for good_page in ("g0", "g1", "g2", "h"):
        assert rel[good_page] < 0.5, (good_page, rel[good_page])
    # the boosted target accrues MORE raw rank than any good page —
    # exactly the case PageRank alone cannot flag
    rank = {
        r["id"]: r["rank"] for r in spam_mass(spark, edges, ["g0"]).collect()
    }
    assert rank["t"] > max(rank[g] for g in ("g0", "g1", "g2", "h"))


def test_select_trust_seeds_is_reversed_pagerank_topk(spark):
    nodes, edges, data = fixtures.load_fixture(spark, "test_realistic_mini")
    got = select_trust_seeds(spark, edges, 3, nodes=nodes).collect()
    rev = {
        "nodes": data["nodes"],
        "edges": [
            {**e, "source": e["target"], "target": e["source"]}
            for e in data["edges"]
        ],
    }
    want = pagerank_power(to_nx(rev))
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [r["id"] for r in got] == [node_id for node_id, _ in expect]
    for r, (_, w) in zip(got, expect):
        assert math.isclose(r["inv_rank"], w, abs_tol=1e-6)


def test_trustrank_requires_a_known_seed(spark):
    edges = spark.createDataFrame(
        [("a", "b", "LINK", 1.0)],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    with pytest.raises(ValueError):
        trustrank(spark, edges, ["zzz"]).collect()
