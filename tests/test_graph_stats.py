"""Global graph stats (graph/stats.py) vs networkx —
nx.overall_reciprocity and nx.degree_assortativity_coefficient."""

import random

import networkx as nx
import pytest

from k2_18_spark.graph.stats import degree_assortativity, reciprocity


def _edges_df(spark, edge_list):
    return spark.createDataFrame(
        [(f"V{a}", f"V{b}", "LINK", 1.0) for a, b in edge_list],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _seeded(n=50, m=200, seed=31):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


def test_reciprocity_parity(spark):
    edge_list = _seeded()
    g = nx.DiGraph()
    g.add_edges_from(edge_list)
    got = reciprocity(spark, _edges_df(spark, edge_list))
    assert got == pytest.approx(nx.overall_reciprocity(g), abs=1e-12)


def test_reciprocity_hand(spark):
    # 1 mutual pair + 1 one-way + 1 self-loop = 4 directed simple
    # edges, 2 reciprocated (nx keeps the loop in the denominator but
    # never counts it as reciprocated)
    df = _edges_df(spark, [(0, 1), (1, 0), (1, 2), (3, 3), (0, 1)])
    g = nx.DiGraph([(0, 1), (1, 0), (1, 2), (3, 3)])
    assert reciprocity(spark, df) == pytest.approx(2 / 4)
    assert reciprocity(spark, df) == pytest.approx(nx.overall_reciprocity(g))


def test_assortativity_parity(spark):
    edge_list = _seeded(n=40, m=150, seed=37)
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in edge_list if a != b)
    got = degree_assortativity(spark, _edges_df(spark, edge_list))
    assert got == pytest.approx(
        nx.degree_assortativity_coefficient(g), abs=1e-9
    )


def test_assortativity_star_is_negative(spark):
    star = [(0, i) for i in range(1, 8)] + [(1, 2)]
    got = degree_assortativity(spark, _edges_df(spark, star))
    g = nx.Graph(star)
    assert got == pytest.approx(nx.degree_assortativity_coefficient(g), abs=1e-9)
    assert got < 0


def test_undefined_cases(spark):
    with pytest.raises(ValueError):
        degree_assortativity(spark, _edges_df(spark, [(0, 1), (2, 3)]))  # regular
    with pytest.raises(ValueError):
        reciprocity(spark, _edges_df(spark, []).limit(0))


# --- modularity (nx.algorithms.community.modularity parity) ---------------

from k2_18_spark.graph.stats import modularity, modularity_by_community  # noqa: E402


def _weighted_df(spark, rows):
    return spark.createDataFrame(
        [(f"V{a}", f"V{b}", "LINK", w) for a, b, w in rows],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _clusters_df(spark, nodes, k=4):
    return spark.createDataFrame(
        [(f"V{n}", n % k) for n in nodes], "id string, cluster_id int"
    )


def _seeded_weighted(n=30, m=120, seed=31):
    rng = random.Random(seed)
    return [
        (rng.randrange(n), rng.randrange(n), round(rng.random() * 3 + 0.5, 3))
        for _ in range(m)
    ]


def _nx_directed(rows):
    g = nx.DiGraph()
    for a, b, w in rows:  # parallel rows sum (MultiDiGraph adjacency)
        g.add_edge(a, b, weight=(g.edges[a, b]["weight"] + w) if g.has_edge(a, b) else w)
    return g


def _partition(nodes, k=4):
    part = {}
    for n in nodes:
        part.setdefault(n % k, set()).add(n)
    return list(part.values())


@pytest.mark.parametrize("resolution", [1.0, 1.7])
def test_modularity_directed_parity(spark, resolution):
    rows = _seeded_weighted()
    g = _nx_directed(rows)
    got = modularity(
        spark,
        _weighted_df(spark, rows),
        _clusters_df(spark, g.nodes),
        resolution=resolution,
    )
    want = nx.community.modularity(
        g, _partition(g.nodes), weight="weight", resolution=resolution
    )
    assert got == pytest.approx(want, abs=1e-9)


def test_modularity_undirected_parity(spark):
    # each undirected edge listed once (a<=b), incl. a self-loop
    rng = random.Random(53)
    seen = {}
    for _ in range(100):
        a, b = sorted((rng.randrange(25), rng.randrange(25)))
        seen[(a, b)] = round(rng.random() * 2 + 0.25, 3)
    seen[(7, 7)] = 1.5
    rows = [(a, b, w) for (a, b), w in seen.items()]
    g = nx.Graph()
    g.add_weighted_edges_from(rows)
    got = modularity(
        spark,
        _weighted_df(spark, rows),
        _clusters_df(spark, g.nodes),
        directed=False,
    )
    want = nx.community.modularity(g, _partition(g.nodes), weight="weight")
    assert got == pytest.approx(want, abs=1e-9)


def test_modularity_contributions_sum_and_schema(spark):
    rows = _seeded_weighted(seed=97)
    g = _nx_directed(rows)
    per = modularity_by_community(
        spark, _weighted_df(spark, rows), _clusters_df(spark, g.nodes)
    )
    pdf = per.toPandas().set_index("cluster_id")
    assert set(pdf.columns) == {"internal_w", "out_w", "in_w", "contribution"}
    # every community of the total clustering appears, incl. any with no edges
    assert set(pdf.index) == {n % 4 for n in g.nodes}
    total = nx.community.modularity(g, _partition(g.nodes), weight="weight")
    assert pdf["contribution"].sum() == pytest.approx(total, abs=1e-9)
    # mass checks: Σinternal ≤ Σout = Σin = m
    m = sum(d["weight"] for _, _, d in g.edges(data=True))
    assert pdf["out_w"].sum() == pytest.approx(m, abs=1e-9)
    assert pdf["in_w"].sum() == pytest.approx(m, abs=1e-9)
    assert pdf["internal_w"].sum() <= m + 1e-9


def test_modularity_single_community_is_zero(spark):
    rows = _seeded_weighted(n=10, m=40, seed=11)
    g = _nx_directed(rows)
    clusters = spark.createDataFrame(
        [(f"V{n}", 0) for n in g.nodes], "id string, cluster_id int"
    )
    got = modularity(spark, _weighted_df(spark, rows), clusters)
    assert got == pytest.approx(0.0, abs=1e-12)


def test_modularity_empty_graph_raises(spark):
    empty = _weighted_df(spark, []).limit(0)
    cl = spark.createDataFrame([("V0", 0)], "id string, cluster_id int")
    with pytest.raises(ValueError):
        modularity(spark, empty, cl)
    with pytest.raises(ValueError):
        modularity(spark, empty, cl, directed=False)


# ---- degree_histogram / powerlaw_alpha -------------------------------

import math

from k2_18_spark.graph.stats import degree_histogram, powerlaw_alpha


def test_degree_histogram_out_in_total(spark):
    # V0 -> V1, V0 -> V2, V1 -> V2, plus dup + self-loop (total drops it)
    df = _edges_df(spark, [(0, 1), (0, 2), (1, 2), (0, 1), (2, 2)])
    out = {r["degree"]: r["n_vertices"] for r in
           degree_histogram(spark, df, "out").collect()}
    assert out == {1: 2, 2: 1}  # V0: {1,2}; V1: {2}; V2: {2} (self-loop)
    inn = {r["degree"]: r["n_vertices"] for r in
           degree_histogram(spark, df, "in").collect()}
    assert inn == {1: 1, 3: 1}  # V1: 1 in; V2: from V0, V1, V2
    tot = {r["degree"]: r["n_vertices"] for r in
           degree_histogram(spark, df, "total").collect()}
    # undirected simple, self-loop dropped: V0-V1, V0-V2, V1-V2 → all deg 2
    assert tot == {2: 3}


def test_degree_histogram_matches_nx(spark):
    edge_list = _seeded(seed=77)
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in edge_list if a != b)
    exp: dict[int, int] = {}
    for _, d in g.degree():
        exp[d] = exp.get(d, 0) + 1
    got = {r["degree"]: r["n_vertices"] for r in
           degree_histogram(spark, _edges_df(spark, edge_list), "total").collect()}
    assert got == exp


def test_powerlaw_alpha_closed_form(spark):
    """CSN eq. 3.7 replayed by hand on a tiny out-degree multiset."""
    # out-degrees: V0=3, V1=2, V2=1 (plus V3 with only in-edges → no row)
    df = _edges_df(spark, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
    alpha, n = powerlaw_alpha(spark, df, direction="out", d_min=1)
    s = sum(math.log(d / 0.5) for d in (3, 2, 1))
    assert n == 3
    assert alpha == pytest.approx(1 + 3 / s, rel=1e-12)
    # d_min=2 drops the degree-1 vertex
    alpha2, n2 = powerlaw_alpha(spark, df, direction="out", d_min=2)
    s2 = sum(math.log(d / 1.5) for d in (3, 2))
    assert (n2, alpha2) == (2, pytest.approx(1 + 2 / s2, rel=1e-12))


def test_powerlaw_alpha_recovers_planted_exponent(spark):
    """Degrees sampled from a discrete zeta(α=2.5) tail → α̂ within 10%."""
    rng = random.Random(5)
    alpha_true, d_min = 2.5, 2
    # inverse-CDF sample from p(d) ∝ d^-α via rejection on a bounded range
    degs = []
    while len(degs) < 3000:
        d = rng.randrange(d_min, 10_000)
        if rng.random() < (d / d_min) ** (-alpha_true):
            degs.append(d)
    rows = []
    v = 0
    for i, d in enumerate(degs):
        for j in range(d):
            rows.append((f"s{i}", f"t{v}"))
            v += 1
    df = spark.createDataFrame(
        [(a, b, "LINK", 1.0) for a, b in rows],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    alpha_hat, n = powerlaw_alpha(spark, df, direction="out", d_min=d_min)
    assert n == 3000
    assert abs(alpha_hat - alpha_true) / alpha_true < 0.10


def test_powerlaw_alpha_guards(spark):
    df = _edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        powerlaw_alpha(spark, df, d_min=0)
    with pytest.raises(ValueError):
        powerlaw_alpha(spark, df, d_min=5)  # empty tail
    with pytest.raises(ValueError):
        degree_histogram(spark, df, direction="sideways")


def test_attribute_mixing_and_assortativity(spark):
    """Nominal assortativity vs networkx on a two-class digraph, plus
    the perfectly-assortative guard."""
    import networkx as nx
    import pytest

    from k2_18_spark.graph.stats import (
        attribute_assortativity,
        attribute_mixing_matrix,
    )

    edges = [
        ("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
        ("b1", "b2"), ("b2", "b1"),
        ("a1", "b1"), ("b2", "a2"),
    ]
    attrs = {v: v[0] for e in edges for v in e}
    edf = spark.createDataFrame(
        [(s, t, "L", 1.0) for s, t in edges],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    adf = spark.createDataFrame(list(attrs.items()), "id string, attr string")

    g = nx.DiGraph()
    g.add_edges_from(edges)
    nx.set_node_attributes(g, attrs, "cls")
    exp = nx.attribute_assortativity_coefficient(g, "cls")
    got = attribute_assortativity(spark, edf, adf)
    assert got == pytest.approx(exp, abs=1e-9)

    m = {
        (r.attr_src, r.attr_dst): (r.n_edges, r.frac)
        for r in attribute_mixing_matrix(edf, adf).collect()
    }
    assert m[("a", "a")][0] == 3 and m[("b", "b")][0] == 2
    assert m[("a", "b")][0] == 1 and m[("b", "a")][0] == 1
    assert abs(sum(v[1] for v in m.values()) - 1.0) < 1e-6

    # perfectly assortative: only within-class edges → r = 1.0
    pure = edf.filter("substr(src_id,1,1) = substr(dst_id,1,1)")
    assert attribute_assortativity(spark, pure, adf) == 1.0
