"""ANF (approximate neighborhood function) — graph/anf.py.

Layers:
1. bit-exact parity vs a pure-python Flajolet-Martin replica (same
   md5-60 register hash, same OR propagation) on a seeded digraph;
2. estimator sanity on graphs with known exact neighborhood sizes;
3. saturation-round == diameter and monotone totals on a chain;
4. checkpoint/lineage + mid-run resume (house CheckpointStore
   contract, same as pagerank/components).
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from k2_18_spark.graph.anf import AnfResult, anf, effective_diameter

BIT_CAP = 59


def _py_register(vid: str, r: int) -> int:
    h = int(hashlib.md5(f"{vid}:{r}".encode()).hexdigest()[:15], 16)
    bit = BIT_CAP if h == 0 else (h & -h).bit_length() - 1
    return 1 << bit


def _py_anf(edge_list, registers):
    """Pure-python replica: returns (sketches-per-round list, rounds)."""
    verts = sorted({v for e in edge_list for v in e})
    out = {v: set() for v in verts}
    for s, d in edge_list:
        if s != d:
            out[s].add(d)
    cur = {v: [_py_register(v, r) for r in range(registers)] for v in verts}
    snaps = [dict(cur)]
    for _ in range(200):
        new = {}
        for v in verts:
            regs = list(cur[v])
            for u in out[v]:
                for r in range(registers):
                    regs[r] |= cur[u][r]
            new[v] = regs
        snaps.append(new)
        if new == cur:
            return snaps, len(snaps) - 1
        cur = new
    raise AssertionError("python replica did not saturate")


def _edges_df(spark, edge_list):
    return spark.createDataFrame(
        [(s, d, "LINK", 1.0) for s, d in edge_list],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _seeded_digraph(n=40):
    """Deterministic sparse digraph: ring + two modular chords."""
    edges = []
    for i in range(n):
        edges.append((f"v{i}", f"v{(i + 1) % n}"))
        if i % 3 == 0:
            edges.append((f"v{i}", f"v{(i * 7 + 2) % n}"))
        if i % 5 == 0:
            edges.append((f"v{(i * 3 + 1) % n}", f"v{i}"))
    return edges


def test_bit_exact_vs_python_replica(spark):
    edge_list = _seeded_digraph()
    res = anf(spark, _edges_df(spark, edge_list), registers=8)
    snaps, _ = _py_anf(edge_list, registers=8)
    final = snaps[-1]
    got = {
        row["id"]: [row[f"s{r}"] for r in range(8)]
        for row in res.sketches.collect()
    }
    assert got == final  # every register of every vertex, bit for bit


def test_round_trajectory_matches_replica(spark):
    """total_bits per round equals the replica's — verifies the merge
    order (round t covers exactly ≤t-hop reachability, not more)."""
    edge_list = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    res = anf(spark, _edges_df(spark, edge_list), registers=8)
    snaps, rounds = _py_anf(edge_list, registers=8)

    def bits(snap):
        tot = 0
        for regs in snap.values():
            for m in regs:
                tot += ((m + 1) & ~m).bit_length() - 1
        return tot

    # engine totals[t] is measured AFTER merge t (replica snap t+1)
    assert [t["total_bits"] for t in res.totals] == [
        bits(snaps[i + 1]) for i in range(len(res.totals))
    ]
    assert res.rounds == rounds


def test_estimate_accuracy_star(spark):
    """Center of a 200-leaf out-star reaches 201 vertices; FM with 64
    registers has ~10% std error — assert within 35%."""
    n = 200
    edge_list = [("hub", f"leaf{i}") for i in range(n)]
    res = anf(spark, _edges_df(spark, edge_list), registers=64)
    est = {r["id"]: r["nf_estimate"] for r in res.sketches.collect()}
    assert est["hub"] == pytest.approx(n + 1, rel=0.35)
    # leaves reach only themselves — estimator should be small
    assert est["leaf0"] < 8


def test_chain_saturates_at_diameter(spark):
    k = 7
    edge_list = [(f"c{i}", f"c{i + 1}") for i in range(k)]
    res = anf(spark, _edges_df(spark, edge_list), registers=8)
    # chain c0..ck: longest reach is k hops; saturation detected one
    # round later (the no-change round)
    assert res.rounds == k + 1
    bits = [t["total_bits"] for t in res.totals]
    assert bits == sorted(bits)  # monotone non-decreasing
    nf = [t["nf_total"] for t in res.totals]
    assert nf[-1] >= nf[0]
    ed = effective_diameter(res.totals, q=1.0)
    assert ed <= k
    assert effective_diameter(res.totals, q=0.5) <= ed


def test_checkpoint_resume(spark, tmp_ckpt):
    edge_list = _seeded_digraph(20)
    full = anf(spark, _edges_df(spark, edge_list), registers=4)

    ck = anf(
        spark,
        _edges_df(spark, edge_list),
        registers=4,
        checkpoint_dir=tmp_ckpt,
        job_name="anf_test",
    )
    assert isinstance(ck, AnfResult)
    assert sorted(map(tuple, ck.sketches.drop("nf_estimate").collect())) == sorted(
        map(tuple, full.sketches.drop("nf_estimate").collect())
    )

    # a second invocation resumes from the converged marker: identical
    # sketches AND the totals trajectory rebuilt from markers
    again = anf(
        spark,
        _edges_df(spark, edge_list),
        registers=4,
        checkpoint_dir=tmp_ckpt,
        job_name="anf_test",
    )
    assert sorted(map(tuple, again.sketches.drop("nf_estimate").collect())) == sorted(
        map(tuple, ck.sketches.drop("nf_estimate").collect())
    )
    assert [t["total_bits"] for t in again.totals] == [
        t["total_bits"] for t in ck.totals
    ]


def test_fixed_rounds_matches_trajectory(spark):
    """fixed_rounds=K sketches equal the replica's K-merge snapshot
    (and differ from saturation when K < diameter)."""
    edge_list = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    res = anf(spark, _edges_df(spark, edge_list), registers=8, fixed_rounds=2)
    snaps, _ = _py_anf(edge_list, registers=8)
    got = {
        row["id"]: [row[f"s{r}"] for r in range(8)]
        for row in res.sketches.collect()
    }
    assert got == snaps[2]
    assert res.rounds == 2
    assert got != snaps[-1]  # not yet saturated at K=2 on a 4-chain


def test_duplicate_edges_and_self_loops_ignored(spark):
    base = [("x", "y"), ("y", "z")]
    noisy = base + [("x", "y"), ("x", "x"), ("z", "z")]
    a = anf(spark, _edges_df(spark, base), registers=8)
    b = anf(spark, _edges_df(spark, noisy), registers=8)
    assert sorted(map(tuple, a.sketches.collect())) == sorted(
        map(tuple, b.sketches.collect())
    )


def test_delta_frontier_long_chain_matches_replica(spark):
    """Pins the r6 changed-sketch frontier: on a 12-chain the round-t
    join side shrinks every round (only vertices ≥ t hops from the
    sink still change), and every round from 2 on mixes changed and
    settled neighbors — the exact case where a wrong delta filter
    would drop a contribution. Full per-round totals AND final
    sketches must match the full-merge python replica bit for bit."""
    n = 12
    edge_list = [(f"c{i}", f"c{i + 1}") for i in range(n - 1)]
    res = anf(spark, _edges_df(spark, edge_list), registers=4)
    snaps, rounds = _py_anf(edge_list, registers=4)

    def bits(snap):
        tot = 0
        for regs in snap.values():
            for m in regs:
                tot += ((m + 1) & ~m).bit_length() - 1
        return tot

    assert [t["total_bits"] for t in res.totals] == [
        bits(snaps[i + 1]) for i in range(len(res.totals))
    ]
    assert res.rounds == rounds
    got = {
        row["id"]: [row[f"s{r}"] for r in range(4)]
        for row in res.sketches.collect()
    }
    assert got == snaps[-1]
