"""Bow-tie decomposition (Broder WWW'00) — hand-worked fixture +
networkx-replica parity on randomized digraphs."""

import networkx as nx
import pytest
from pyspark.sql import functions as F

from k2_18_spark.graph.bowtie import REGIONS, bowtie_decomposition, bowtie_summary


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b, "LINK", 1.0) for a, b in pairs],
        "src_id string, dst_id string, edge_type string, weight double",
    )


def _nodes_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id string")


def nx_bowtie(G: nx.DiGraph, all_nodes=None) -> dict:
    """Independent reachability replica of the Broder taxonomy."""
    nodes = set(all_nodes) if all_nodes is not None else set(G.nodes)
    sccs = [s for s in nx.strongly_connected_components(G)] or [set()]
    # singletons for isolated nodes absent from G
    for n in nodes - set(G.nodes):
        sccs.append({n})
    core = sorted(sccs, key=lambda s: (-len(s), min(s)))[0]
    rep = min(core)
    fwd = (nx.descendants(G, rep) | core) if rep in G else set(core)
    bwd = (nx.ancestors(G, rep) | core) if rep in G else set(core)
    out_s, in_s = fwd - core, bwd - core
    remainder = nodes - fwd - bwd
    fin = set()
    for v in in_s:
        fin |= nx.descendants(G, v)
    fin &= remainder
    bout = set()
    for v in out_s:
        bout |= nx.ancestors(G, v)
    bout &= remainder
    und = G.to_undirected()
    weak = nx.node_connected_component(und, rep) if rep in G else {rep}
    regions = {}
    for v in nodes:
        if v in core:
            regions[v] = "CORE"
        elif v in in_s:
            regions[v] = "IN"
        elif v in out_s:
            regions[v] = "OUT"
        elif v in fin and v in bout:
            regions[v] = "TUBE"
        elif v in fin:
            regions[v] = "TENDRIL_IN"
        elif v in bout:
            regions[v] = "TENDRIL_OUT"
        elif v in weak:
            regions[v] = "TENDRIL_OTHER"
        else:
            regions[v] = "DISCONNECTED"
    return regions


# hand-worked bow-tie: 3-cycle core, IN chain, OUT chain, tube,
# tendrils both sides, an other-tendril, a detached 2-cycle (smaller
# SCC → DISCONNECTED), and an isolated vertex.
HAND_EDGES = [
    ("c1", "c2"), ("c2", "c3"), ("c3", "c1"),       # CORE
    ("i2", "i1"), ("i1", "c1"),                     # IN chain
    ("c2", "o1"), ("o1", "o2"),                     # OUT chain
    ("i1", "t1"), ("t1", "o2"),                     # TUBE t1
    ("i2", "ti1"), ("ti1", "ti2"),                  # TENDRIL_IN ti1,ti2
    ("to1", "o1"),                                  # TENDRIL_OUT to1
    ("x1", "ti2"),                                  # TENDRIL_OTHER x1
    ("d1", "d2"), ("d2", "d1"),                     # detached 2-cycle
]
HAND_EXPECT = {
    "c1": "CORE", "c2": "CORE", "c3": "CORE",
    "i1": "IN", "i2": "IN",
    "o1": "OUT", "o2": "OUT",
    "t1": "TUBE",
    "ti1": "TENDRIL_IN", "ti2": "TENDRIL_IN",
    "to1": "TENDRIL_OUT",
    "x1": "TENDRIL_OTHER",
    "d1": "DISCONNECTED", "d2": "DISCONNECTED",
    "iso": "DISCONNECTED",
}


def test_hand_fixture(spark):
    nodes = _nodes_df(spark, sorted(HAND_EXPECT))
    res = bowtie_decomposition(spark, _edges_df(spark, HAND_EDGES), nodes=nodes)
    got = {r["id"]: r["region"] for r in res.collect()}
    assert got == HAND_EXPECT


def test_hand_fixture_matches_nx_replica(spark):
    G = nx.DiGraph(HAND_EDGES)
    assert nx_bowtie(G, all_nodes=HAND_EXPECT.keys()) == HAND_EXPECT


def test_summary_counts_and_order(spark):
    nodes = _nodes_df(spark, sorted(HAND_EXPECT))
    dec = bowtie_decomposition(spark, _edges_df(spark, HAND_EDGES), nodes=nodes)
    rows = bowtie_summary(dec).collect()
    got = [(r["region"], r["n_vertices"]) for r in rows]
    order = [r for r, _ in got]
    assert order == [x for x in REGIONS if x in order]  # canonical order
    assert dict(got) == {
        "CORE": 3, "IN": 2, "OUT": 2, "TUBE": 1, "TENDRIL_IN": 2,
        "TENDRIL_OUT": 1, "TENDRIL_OTHER": 1, "DISCONNECTED": 3,
    }


def test_partition_is_complete(spark):
    """Every vertex gets exactly one label."""
    nodes = _nodes_df(spark, sorted(HAND_EXPECT))
    dec = bowtie_decomposition(spark, _edges_df(spark, HAND_EDGES), nodes=nodes)
    assert dec.count() == len(HAND_EXPECT)
    assert dec.select("id").distinct().count() == len(HAND_EXPECT)


def test_self_loops_and_parallel_edges(spark):
    """Self-loops must not create a fake 1-vertex 'cycle' beating the
    tie-break, and parallel edges collapse."""
    pairs = [("a", "a"), ("a", "b"), ("a", "b"), ("b", "a"), ("b", "c")]
    res = bowtie_decomposition(spark, _edges_df(spark, pairs))
    got = {r["id"]: r["region"] for r in res.collect()}
    assert got == {"a": "CORE", "b": "CORE", "c": "OUT"}


def test_edgeless_graph(spark):
    nodes = _nodes_df(spark, ["a", "b"])
    res = bowtie_decomposition(
        spark, _edges_df(spark, []), nodes=nodes
    ).collect()
    got = {r["id"]: r["region"] for r in res}
    # core = tie-break min singleton; everything else disconnected
    assert got == {"a": "CORE", "b": "DISCONNECTED"}


@pytest.mark.parametrize("seed", [7, 19, 42])
def test_nx_parity_random_digraphs(spark, seed):
    import random

    rng = random.Random(seed)
    n = 60
    ids = [f"v{i:02d}" for i in range(n)]
    pairs = set()
    # dense-ish center to grow a giant SCC + sparse periphery
    for _ in range(110):
        a, b = rng.choice(ids[:30]), rng.choice(ids[:30])
        if a != b:
            pairs.add((a, b))
    for _ in range(50):
        a, b = rng.choice(ids), rng.choice(ids)
        if a != b:
            pairs.add((a, b))
    G = nx.DiGraph(sorted(pairs))
    expect = nx_bowtie(G, all_nodes=ids)
    res = bowtie_decomposition(
        spark, _edges_df(spark, sorted(pairs)), nodes=_nodes_df(spark, ids)
    )
    got = {r["id"]: r["region"] for r in res.collect()}
    assert got == expect
