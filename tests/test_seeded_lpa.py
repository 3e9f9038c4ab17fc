"""Seeded label propagation (graph/seeded_lpa.py) vs a synchronous
Python replica on seeded random graphs, plus clamping / directed /
resume behavior."""

import random
from collections import defaultdict

import pytest

from k2_18_spark.graph.seeded_lpa import seeded_label_propagation


def _edges_df(spark, edge_list):
    return spark.createDataFrame(
        [(f"V{a}", f"V{b}", "LINK", float(w)) for a, b, w in edge_list],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _seeds_df(spark, seeds):
    return spark.createDataFrame(
        [(f"V{v}", lab) for v, lab in seeds], "id string, label string"
    )


def _brute(edge_list, seeds, max_iter, directed):
    nbrs = defaultdict(lambda: defaultdict(float))
    if directed:
        for a, b, w in edge_list:
            if a != b:
                nbrs[f"V{b}"][f"V{a}"] += w
    else:
        # undirected mode rides the engine's U2 projection, which
        # collapses parallel (src,dst) rows to the max-weight one
        # BEFORE summing the two orientations (adjacency._collapse_multi)
        direct = {}
        for a, b, w in edge_list:
            if a != b:
                key = (f"V{a}", f"V{b}")
                direct[key] = max(direct.get(key, 0.0), w)
        und = defaultdict(float)
        for (x, y), w in direct.items():
            und[tuple(sorted((x, y)))] += w
        for (x, y), w in und.items():
            nbrs[x][y] += w
            nbrs[y][x] += w
    verts = set(nbrs)
    for d in list(nbrs.values()):
        verts |= set(d)
    seed_map = {}
    for v, lab in seeds:
        k = f"V{v}"
        seed_map[k] = min(seed_map.get(k, lab), lab)
    verts |= set(seed_map)
    labels = {v: seed_map.get(v) for v in verts}
    for _ in range(max_iter):
        new = {}
        for v in verts:
            if v in seed_map:
                new[v] = seed_map[v]
                continue
            votes = defaultdict(float)
            for u, w in nbrs[v].items():
                if labels[u] is not None:
                    votes[labels[u]] += w
            if votes:
                best = max(votes.values())
                new[v] = min(l for l, w in votes.items() if w == best)
            else:
                new[v] = labels[v]
        if new == labels:
            break
        labels = new
    return labels


def _collect(df):
    return {r["id"]: r["label"] for r in df.collect()}


@pytest.mark.parametrize("seed,directed", [(0, False), (1, False), (2, True), (3, True)])
def test_random_graphs_match_replica(spark, seed, directed):
    rng = random.Random(seed)
    edge_list = [
        (rng.randrange(14), rng.randrange(14), rng.choice([1.0, 2.0]))
        for _ in range(40)
    ]
    seeds = [(0, "red"), (7, "blue"), (13, "green")]
    got = _collect(
        seeded_label_propagation(
            spark,
            _edges_df(spark, edge_list),
            _seeds_df(spark, seeds),
            max_iter=15,
            directed=directed,
        )
    )
    assert got == _brute(edge_list, seeds, 15, directed)


def test_seeds_clamped_against_majority(spark):
    # seed V0=red surrounded by three blue seeds: stays red
    edge_list = [(1, 0, 1.0), (2, 0, 1.0), (3, 0, 1.0)]
    seeds = [(0, "red"), (1, "blue"), (2, "blue"), (3, "blue")]
    got = _collect(
        seeded_label_propagation(
            spark, _edges_df(spark, edge_list), _seeds_df(spark, seeds)
        )
    )
    assert got["V0"] == "red"


def test_unreached_stay_null_and_tie_breaks_min(spark):
    # chain red-seed - m - blue-seed: m ties -> min("blue","red")="blue";
    # isolated component x-y never reached
    edge_list = [(0, 1, 1.0), (1, 2, 1.0), (8, 9, 1.0)]
    seeds = [(0, "red"), (2, "blue")]
    got = _collect(
        seeded_label_propagation(
            spark, _edges_df(spark, edge_list), _seeds_df(spark, seeds)
        )
    )
    assert got["V1"] == "blue"
    assert got["V8"] is None and got["V9"] is None


def test_directed_flows_one_way(spark):
    # seed at the head: label flows along direction, never backwards
    edge_list = [(0, 1, 1.0), (1, 2, 1.0), (3, 0, 1.0)]
    seeds = [(0, "spam")]
    got = _collect(
        seeded_label_propagation(
            spark,
            _edges_df(spark, edge_list),
            _seeds_df(spark, seeds),
            directed=True,
        )
    )
    assert got["V1"] == "spam" and got["V2"] == "spam"
    assert got["V3"] is None  # upstream of the seed


def test_resume_from_checkpoint(spark, tmp_path):
    edge_list = [(i, i + 1, 1.0) for i in range(8)]
    seeds = [(0, "red"), (8, "blue")]
    ckpt = str(tmp_path / "ck")
    partial = seeded_label_propagation(
        spark, _edges_df(spark, edge_list), _seeds_df(spark, seeds),
        max_iter=2, checkpoint_dir=ckpt,
    )
    partial.count()
    full = seeded_label_propagation(
        spark, _edges_df(spark, edge_list), _seeds_df(spark, seeds),
        max_iter=20, checkpoint_dir=ckpt,
    )
    want = _brute(edge_list, seeds, 20, False)
    assert _collect(full) == want
    # converged marker short-circuits a third run
    again = seeded_label_propagation(
        spark, _edges_df(spark, edge_list), _seeds_df(spark, seeds),
        max_iter=20, checkpoint_dir=ckpt,
    )
    assert _collect(again) == want
