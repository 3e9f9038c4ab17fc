"""Weighted SSSP (graph/sssp.py) vs networkx Dijkstra on seeded random
graphs, plus tie-break / validation / resume behavior."""

import math
import random

import networkx as nx
import pytest

from k2_18_spark.graph import sssp as sssp_mod
from k2_18_spark.graph.sssp import sssp


def _edges_df(spark, weighted_list):
    return spark.createDataFrame(
        [(f"V{a}", f"V{b}", "LINK", float(w)) for a, b, w in weighted_list],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _src_df(spark, ids):
    return spark.createDataFrame([(f"V{i}",) for i in ids], "id string")


def _rand_graph(seed, n=18, m=45):
    rng = random.Random(seed)
    return [
        (rng.randrange(n), rng.randrange(n), round(rng.uniform(0.1, 5.0), 3))
        for _ in range(m)
    ]


def _nx_dists(weighted_list, sources, directed):
    g = nx.DiGraph() if directed else nx.Graph()
    for a, b, w in weighted_list:
        if a == b:
            continue
        # parallel edges: min length (matches the engine's pair-min dedup;
        # nx add_edge overwrites, so fold the min by hand)
        if g.has_edge(a, b):
            w = min(w, g[a][b]["weight"])
        g.add_edge(a, b, weight=float(w))
    srcs = [s for s in sources if s in g]
    dist, _paths = nx.multi_source_dijkstra(g, set(srcs))
    return {f"V{v}": d for v, d in dist.items()}


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("directed", [True, False])
def test_sssp_matches_nx_dijkstra(spark, seed, directed):
    wl = _rand_graph(seed)
    srcs = [0, 1]
    want = _nx_dists(wl, srcs, directed)
    got = {
        r["id"]: r["distance"]
        for r in sssp(
            spark, _edges_df(spark, wl), _src_df(spark, srcs), directed=directed
        ).collect()
    }
    assert set(got) == set(want)
    for k, d in want.items():
        assert math.isclose(got[k], d, rel_tol=0, abs_tol=1e-9), (k, got[k], d)


def test_sssp_unit_mode_is_bfs(spark):
    wl = [(0, 1, 9.0), (1, 2, 9.0), (0, 2, 9.0), (2, 3, 9.0)]
    got = {
        r["id"]: (r["distance"], r["hops"])
        for r in sssp(
            spark, _edges_df(spark, wl), _src_df(spark, [0]), weight_mode="unit"
        ).collect()
    }
    assert got == {"V0": (0.0, 0), "V1": (1.0, 1), "V2": (1.0, 1), "V3": (2.0, 2)}


def test_sssp_inverse_mode(spark):
    # strong edge (w=4 → len .25) beats two weak hops (w=1 → len 1 each)
    wl = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 4.0)]
    got = {
        r["id"]: r["distance"]
        for r in sssp(
            spark, _edges_df(spark, wl), _src_df(spark, [0]), weight_mode="inverse"
        ).collect()
    }
    assert got["V2"] == pytest.approx(0.25)
    assert got["V1"] == pytest.approx(1.0)


def test_sssp_tie_breaks_to_fewer_hops(spark):
    # two paths 0→3 of identical length 2.0: direct (1 hop) vs 0→1→2→3
    wl = [(0, 3, 2.0), (0, 1, 0.5), (1, 2, 0.5), (2, 3, 1.0)]
    got = {
        r["id"]: (r["distance"], r["hops"])
        for r in sssp(spark, _edges_df(spark, wl), _src_df(spark, [0])).collect()
    }
    assert got["V3"] == (2.0, 1)


def test_sssp_float_collision_hops_lex_dominate_dijkstra(spark):
    """IEEE754 tie-break sharp edge (documented in BASELINE.md): two
    DIFFERENT paths to P whose float sums bit-collide after +1.0.

      S→X→P        0.1+0.2           = 0.30000000000000004  (2 hops)
      S→Y1→Y2→P    0.025+0.125+0.15  = 0.3 exactly          (3 hops)
      P→V          +1.0 → BOTH sums round to exactly 1.3

    P's lex-min is (0.3, 3). The 2-hop prefix (0.30000000000000004, 2)
    is transient — but its round-3 relaxation gives V (1.3, 3), which
    is the TRUE fewest-hops among bit-equal-1.3 paths (S→X→P→V is a
    real 3-hop path of float length 1.3). Per-vertex Dijkstra relaxes
    only settled pairs, so it would report (1.3, 4) for V. The engine's
    round-replay semantics keep (1.3, 3): it lex-dominates Dijkstra
    pointwise (every engine pair is a real path value, and every
    settled-pair relaxation Dijkstra makes is eventually re-applied by
    the engine with the same operand bits)."""
    assert 0.1 + 0.2 == 0.30000000000000004
    assert 0.025 + 0.125 + 0.15 == 0.3
    assert 0.30000000000000004 + 1.0 == 1.3 == 0.3 + 1.0
    wl = [
        (0, 1, 0.1), (1, 2, 0.2),                       # S→X→P
        (0, 3, 0.025), (3, 4, 0.125), (4, 2, 0.15),     # S→Y1→Y2→P
        (2, 5, 1.0),                                    # P→V
    ]
    got = {
        r["id"]: (r["distance"], r["hops"])
        for r in sssp(spark, _edges_df(spark, wl), _src_df(spark, [0])).collect()
    }
    assert got["V2"] == (0.3, 3)   # lex-min at P: exact 0.3 beats ...004
    assert got["V5"] == (1.3, 3)   # true fewest-hops; Dijkstra says 4


def test_sssp_unreachable_absent_and_directed(spark):
    wl = [(0, 1, 1.0), (2, 0, 1.0)]  # V2 is upstream of the source
    got = {r["id"] for r in
           sssp(spark, _edges_df(spark, wl), _src_df(spark, [0])).collect()}
    assert got == {"V0", "V1"}


def test_sssp_multi_source_head_start(spark):
    wl = [(0, 1, 1.0), (2, 1, 1.0)]
    srcs = spark.createDataFrame(
        [("V0", 0.0), ("V2", 10.0)], "id string, dist0 double"
    )
    got = {
        r["id"]: r["distance"]
        for r in sssp(spark, _edges_df(spark, wl), srcs).collect()
    }
    assert got == {"V0": 0.0, "V2": 10.0, "V1": 1.0}


def test_sssp_rejects_negative_weight(spark):
    wl = [(0, 1, 1.0), (1, 2, -0.5)]
    with pytest.raises(ValueError, match="negative"):
        sssp(spark, _edges_df(spark, wl), _src_df(spark, [0]))


def test_sssp_parallel_edges_take_min(spark):
    wl = [(0, 1, 5.0), (0, 1, 2.0), (0, 1, 7.0)]
    got = {
        r["id"]: r["distance"]
        for r in sssp(spark, _edges_df(spark, wl), _src_df(spark, [0])).collect()
    }
    assert got["V1"] == 2.0


def test_sssp_deterministic(spark):
    wl = _rand_graph(7)
    a = sorted(
        map(tuple, sssp(spark, _edges_df(spark, wl), _src_df(spark, [0])).collect())
    )
    b = sorted(
        map(tuple, sssp(spark, _edges_df(spark, wl), _src_df(spark, [0])).collect())
    )
    assert a == b


def test_sssp_resume_from_checkpoint(spark, tmp_ckpt):
    wl = _rand_graph(3)
    first = sorted(map(tuple, sssp(
        spark, _edges_df(spark, wl), _src_df(spark, [0]),
        checkpoint_dir=tmp_ckpt,
    ).collect()))
    iters = sssp_mod.LAST_RUN_ITERATIONS
    assert iters >= 1
    # second call resumes from the converged marker without iterating
    second = sorted(map(tuple, sssp(
        spark, _edges_df(spark, wl), _src_df(spark, [0]),
        checkpoint_dir=tmp_ckpt,
    ).collect()))
    assert first == second
    want = _nx_dists(wl, [0], True)
    got = {t[0]: t[1] for t in first}
    assert set(got) == set(want)
    for k, d in want.items():
        assert math.isclose(got[k], d, abs_tol=1e-9)


def test_sssp_empty_sources(spark):
    wl = [(0, 1, 1.0)]
    out = sssp(spark, _edges_df(spark, wl), _src_df(spark, [99]))
    assert out.count() == 0
