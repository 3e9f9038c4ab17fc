"""Co-citation / bibliographic coupling (graph/cocitation.py) vs a
brute-force Python oracle on seeded random digraphs.

Contract: cocitation(a,b) counts distinct citers u with u->a and u->b
(AᵀA off-diagonals over the DISTINCT, loop-free edge set); coupling
counts shared references (AAᵀ); jaccard/overlap normalize by the
direction-relevant degree. Parity exact on counts, 1e-12 on ratios
(both sides divide the same small integers).
"""

import random

import pytest

from k2_18_spark.graph.cocitation import bibliographic_coupling, cocitation


def _edges_df(spark, edge_list):
    return spark.createDataFrame(
        [(f"V{a}", f"V{b}", "LINK", 1.0) for a, b in edge_list],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _brute(edge_list, mode):
    """mode='cocit': common in-neighbors; mode='coup': common out."""
    e = {(f"V{a}", f"V{b}") for a, b in edge_list if a != b}
    if mode == "cocit":
        nbrs = {}  # target -> set of citers
        for s, d in e:
            nbrs.setdefault(d, set()).add(s)
    else:
        nbrs = {}  # source -> set of references
        for s, d in e:
            nbrs.setdefault(s, set()).add(d)
    keys = sorted(nbrs)
    out = {}
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            common = len(nbrs[a] & nbrs[b])
            if common:
                da, db = len(nbrs[a]), len(nbrs[b])
                out[(a, b)] = (
                    common,
                    common / (da + db - common),
                    common / min(da, db),
                )
    return out


def _collect(df, count_name):
    return {
        (r["id_a"], r["id_b"]): (r[count_name], r["jaccard"], r["overlap"])
        for r in df.collect()
    }


def _assert_match(got, want):
    assert set(got) == set(want)
    for k, (c, j, o) in want.items():
        gc, gj, go = got[k]
        assert gc == c, k
        assert abs(gj - j) < 1e-12, k
        assert abs(go - o) < 1e-12, k


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cocitation_random_digraph(spark, seed):
    rng = random.Random(seed)
    edge_list = [(rng.randrange(12), rng.randrange(12)) for _ in range(60)]
    df = cocitation(spark, _edges_df(spark, edge_list), max_center_degree=None)
    _assert_match(_collect(df, "cocitations"), _brute(edge_list, "cocit"))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_coupling_random_digraph(spark, seed):
    rng = random.Random(seed)
    edge_list = [(rng.randrange(12), rng.randrange(12)) for _ in range(60)]
    df = bibliographic_coupling(
        spark, _edges_df(spark, edge_list), max_center_degree=None
    )
    _assert_match(_collect(df, "couplings"), _brute(edge_list, "coup"))


def test_directions_differ():
    """Sanity: the two measures are genuinely different on a digraph
    where u cites {a,b} and {a,b} cite disjoint references."""
    edge_list = [(0, 1), (0, 2), (1, 3), (2, 4)]
    assert _brute(edge_list, "cocit") == {("V1", "V2"): (1, 1.0, 1.0)}
    # V1, V2 share no references; V3/V4 have one citer each (no pair)
    assert ("V1", "V2") not in _brute(edge_list, "coup")


def test_cocitation_dedupes_parallel_edges(spark):
    """Duplicate (u,a) rows must not double-count u as a citer."""
    edge_list = [(0, 1), (0, 1), (0, 2), (3, 1), (3, 2)]
    df = cocitation(spark, _edges_df(spark, edge_list), max_center_degree=None)
    got = _collect(df, "cocitations")
    assert got[("V1", "V2")][0] == 2  # citers {V0, V3}, counted once each


def test_hub_cap_drops_center_credits(spark):
    """A citing hub above the cap contributes no wedges; pairs it alone
    supported disappear, shared pairs lose one credit."""
    # hub 9 cites 0..4 (out-degree 5); page 8 cites {0, 1}
    edge_list = [(9, t) for t in range(5)] + [(8, 0), (8, 1)]
    exact = _collect(
        cocitation(spark, _edges_df(spark, edge_list), max_center_degree=None),
        "cocitations",
    )
    capped = _collect(
        cocitation(spark, _edges_df(spark, edge_list), max_center_degree=4),
        "cocitations",
    )
    assert exact[("V0", "V1")][0] == 2 and exact[("V2", "V3")][0] == 1
    assert capped[("V0", "V1")][0] == 1  # only V8's credit survives
    assert ("V2", "V3") not in capped


def test_min_common_floor(spark):
    edge_list = [(9, t) for t in range(4)] + [(8, 0), (8, 1)]
    df = cocitation(
        spark, _edges_df(spark, edge_list), max_center_degree=None, min_common=2
    )
    got = _collect(df, "cocitations")
    assert set(got) == {("V0", "V1")}
