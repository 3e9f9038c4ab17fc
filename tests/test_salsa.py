"""SALSA parity vs an independent dense two-step-chain power iteration
(the walk the closed form is the stationary limit of), plus hand-worked
closed-form cases, component normalization, weights, and isolated
vertices."""

import math
from collections import defaultdict

import pytest

from k2_18_spark.graph.salsa import salsa
from k2_18_spark.io import fixtures


def _chain_oracle(edge_list):
    """Power-iterate the actual SALSA Markov chains (authority: back
    along an in-link ∝ weight, forward along an out-link ∝ weight;
    hub: the reverse order) from the uniform start — independent of
    the closed form the engine computes."""
    win, wout = defaultdict(float), defaultdict(float)
    w = defaultdict(float)
    for s, d, x in edge_list:
        w[(s, d)] += x
        wout[s] += x
        win[d] += x
    auths = sorted(win)
    hubs = sorted(wout)

    def stationary(states, trans):
        pi = {v: 1.0 / len(states) for v in states}
        for _ in range(10000):
            nxt = defaultdict(float)
            for v, p in pi.items():
                for u, q in trans(v):
                    nxt[u] += p * q
            err = sum(abs(nxt[v] - pi[v]) for v in states)
            pi = dict(nxt)
            if err < 1e-14:
                break
        return pi

    def a_trans(v):
        out = defaultdict(float)
        for (s, d), x in w.items():
            if d != v:
                continue
            back = x / win[v]
            for (s2, d2), y in w.items():
                if s2 == s:
                    out[d2] += back * (y / wout[s])
        return out.items()

    def h_trans(u):
        out = defaultdict(float)
        for (s, d), x in w.items():
            if s != u:
                continue
            fwd = x / wout[u]
            for (s2, d2), y in w.items():
                if d2 == d:
                    out[s2] += fwd * (y / win[d])
        return out.items()

    return stationary(hubs, h_trans), stationary(auths, a_trans)


def _run(spark, edge_list, nodes=None):
    edges = spark.createDataFrame(
        [(s, d, "LINK", float(x)) for s, d, x in edge_list],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    nodes_df = None
    if nodes is not None:
        nodes_df = spark.createDataFrame([(n,) for n in nodes], "id string")
    return {
        r["id"]: (r["hub"], r["authority"])
        for r in salsa(spark, edges, nodes=nodes_df).collect()
    }


def _assert_matches_chain(got, edge_list):
    hubs, auths = _chain_oracle(edge_list)
    for v, want in hubs.items():
        assert math.isclose(got[v][0], want, rel_tol=0, abs_tol=1e-9), (
            "hub", v, got[v][0], want,
        )
    for v, want in auths.items():
        assert math.isclose(got[v][1], want, rel_tol=0, abs_tol=1e-9), (
            "authority", v, got[v][1], want,
        )
    for v, (h, a) in got.items():
        if v not in hubs:
            assert h == 0.0
        if v not in auths:
            assert a == 0.0
    assert math.isclose(sum(h for h, _ in got.values()), 1.0, abs_tol=1e-9)
    assert math.isclose(sum(a for _, a in got.values()), 1.0, abs_tol=1e-9)


@pytest.mark.parametrize("name", ["test_realistic_mini", "test_star", "test_disconnected"])
def test_salsa_matches_chain_stationary_on_fixtures(spark, name):
    _, _, data = fixtures.load_fixture(spark, name)
    edge_list = [
        (e["source"], e["target"], float(e.get("weight", 1.0)))
        for e in data["edges"]
    ]
    got = _run(spark, edge_list)
    _assert_matches_chain(got, edge_list)


def test_salsa_closed_form_star(spark):
    # hub c points to a and b; a also points to b.
    # A = {a, b} (one component), in-deg a=1, b=2 → authority 1/3, 2/3.
    # H = {c, a}, out-deg c=2, a=1 → hub 2/3, 1/3.
    got = _run(spark, [("c", "a", 1), ("c", "b", 1), ("a", "b", 1)])
    assert math.isclose(got["a"][1], 1 / 3, abs_tol=1e-12)
    assert math.isclose(got["b"][1], 2 / 3, abs_tol=1e-12)
    assert math.isclose(got["c"][0], 2 / 3, abs_tol=1e-12)
    assert math.isclose(got["a"][0], 1 / 3, abs_tol=1e-12)
    assert got["c"][1] == 0.0 and got["b"][0] == 0.0


def test_salsa_component_mass_split(spark):
    # two disjoint support components: {x→y} and {p→q, p→r, s→q, s→r}.
    # Component 1 has 1 of 3 authorities → y gets 1/3 of the authority
    # mass; component 2's q and r split 2/3 evenly (equal in-degree 2)
    # — the TKC-resistance SALSA is known for, vs HITS which would
    # zero out the small component.
    edges = [("x", "y", 1), ("p", "q", 1), ("p", "r", 1), ("s", "q", 1), ("s", "r", 1)]
    got = _run(spark, edges)
    assert math.isclose(got["y"][1], 1 / 3, abs_tol=1e-12)
    assert math.isclose(got["q"][1], 1 / 3, abs_tol=1e-12)
    assert math.isclose(got["r"][1], 1 / 3, abs_tol=1e-12)
    assert math.isclose(got["x"][0], 1 / 3, abs_tol=1e-12)
    assert math.isclose(got["p"][0], 1 / 3, abs_tol=1e-12)
    _assert_matches_chain(got, edges)


def test_salsa_weights_and_parallel_edges(spark):
    # parallel rows sum: (u,a) twice at weight 1 == weight 2 once
    edges = [("u", "a", 1), ("u", "a", 1), ("u", "b", 1), ("v", "b", 3)]
    got = _run(spark, edges)
    _assert_matches_chain(got, [("u", "a", 2), ("u", "b", 1), ("v", "b", 3)])


def test_salsa_self_loop_and_isolated_nodes(spark):
    got = _run(spark, [("a", "a", 1), ("a", "b", 1)], nodes=["a", "b", "z"])
    _assert_matches_chain(
        {k: v for k, v in got.items() if k != "z"},
        [("a", "a", 1), ("a", "b", 1)],
    )
    assert got["z"] == (0.0, 0.0)


def test_salsa_empty_graph(spark):
    edges = spark.createDataFrame(
        [], "src_id string, dst_id string, edge_type string, weight double"
    )
    assert salsa(spark, edges).count() == 0
