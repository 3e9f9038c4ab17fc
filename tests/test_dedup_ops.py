"""Regression tests for the dedup operator family (round-2 fixes):

- SimHash chunk blocking derives chunk count from max_hamming, so recall
  is complete for thresholds > 3 (VERDICT round 1, What's-wrong #1).
- LSH bucket-size caps bound degenerate buckets without silent drops.
- metrics_view's no-edge_order fallback is deterministic
  (VERDICT What's-wrong #2).
- SCC's driver-Tarjan guard fires BEFORE collecting the cyclic core
  (VERDICT What's-wrong #3).
- parallel typed edges collapse BEFORE the type filter in
  prerequisite_metrics / educational_importance (ADVICE #1).
- degree_centrality = 1.0 for single-node graphs, matching
  nx.degree_centrality (ADVICE #4).
"""

import random

import pytest
from pyspark.sql import functions as F

from k2_18_spark import schemas
from k2_18_spark.graph.adjacency import metrics_view
from k2_18_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash,
    simhash_near_duplicates,
)

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "red", "green", "blue", "cyan", "magenta",
    "yellow", "black", "white", "gray", "one", "two", "three", "four",
    "five", "six", "seven", "eight", "nine", "ten",
]


def _near_dup_corpus(seed=0, n_docs=40):
    """Base text + small seeded word substitutions → many pairs within
    Hamming ≤ 6, a good fraction spreading their diffs across all four
    of the old 16-bit chunks."""
    rng = random.Random(seed)
    base = [rng.choice(WORDS) for _ in range(60)]
    docs = []
    for i in range(n_docs):
        w = list(base)
        for _ in range(1 + i % 4):
            w[rng.randrange(60)] = rng.choice(WORDS)
        docs.append((i, " ".join(w), "s"))
    return docs


def test_simhash_recall_complete_at_hamming_6(spark):
    """Every pair within Hamming ≤ 6 must be returned — the old fixed
    4×16-bit blocking (pigeonhole bound 3) silently missed pairs whose
    differing bits touch all four chunks."""
    docs = spark.createDataFrame(
        _near_dup_corpus(), "doc_id int, text string, source string"
    )
    shs = {
        r["doc_id"]: r["simhash"] & ((1 << 64) - 1)
        for r in simhash(docs).collect()
    }
    want = set()
    cross_chunk = 0
    ids = sorted(shs)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            x = shs[ids[i]] ^ shs[ids[j]]
            if bin(x).count("1") <= 6:
                want.add((ids[i], ids[j]))
                if all(((x >> (c * 16)) & 0xFFFF) != 0 for c in range(4)):
                    cross_chunk += 1
    # the corpus must actually exercise the old bug
    assert cross_chunk > 0
    got = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_duplicates(docs, max_hamming=6).collect()
    }
    assert got == want


def test_simhash_rejects_overwide_threshold(spark):
    docs = spark.createDataFrame(
        [(0, "a", "s")], "doc_id int, text string, source string"
    )
    with pytest.raises(ValueError):
        simhash_near_duplicates(docs, max_hamming=32)


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """All-identical docs → one bucket of n docs; with a cap the
    quadratic bucket is dropped (loudly), without it pairs explode."""
    docs = spark.createDataFrame(
        [(i, "the same boilerplate text repeated everywhere", "s")
         for i in range(50)],
        "doc_id int, text string, source string",
    )
    capped = minhash_lsh_pairs(docs, max_bucket_size=10)
    assert capped.count() == 0  # the only bucket exceeded the cap
    uncapped = minhash_lsh_pairs(docs)
    assert uncapped.count() == 50 * 49 // 2

    sim_capped = simhash_near_duplicates(docs, max_bucket_size=10)
    assert sim_capped.count() == 0


def test_metrics_view_fallback_deterministic(spark):
    """Without edge_order, the multigraph collapse keeps the max-weight
    row — stable across partitionings (old dropDuplicates was arbitrary)."""
    rows = [("a", "b", "MENTIONS", 0.3), ("a", "b", "PREREQUISITE", 0.9),
            ("a", "b", "ELABORATES", 0.5), ("c", "d", "MENTIONS", 1.0)]
    for nparts in (1, 7):
        edges = spark.createDataFrame(
            rows, "src_id string, dst_id string, edge_type string, weight double"
        ).repartition(nparts)
        got = {(r["src_id"], r["dst_id"]): (r["weight"], r["edge_type"])
               for r in metrics_view(edges).collect()}
        assert got[("a", "b")] == (0.9, "PREREQUISITE")
        assert got[("c", "d")] == (1.0, "MENTIONS")


def test_scc_core_guard_raises_before_collect(spark):
    from k2_18_spark.graph.scc import strongly_connected_components

    cycle = [(f"v{i}", f"v{(i + 1) % 8}", "PREREQUISITE", 1.0, None, i)
             for i in range(8)]
    edges = spark.createDataFrame(cycle, schemas.EDGES)
    # forced tarjan must refuse (guard fires BEFORE collecting);
    # method="auto" instead switches to the distributed FW-BW path
    with pytest.raises(RuntimeError, match="cyclic core too large"):
        strongly_connected_components(
            spark, edges, max_core_vertices=4, method="tarjan"
        )
    # and with an adequate guard the 8-cycle is one SCC
    scc = strongly_connected_components(spark, edges, max_core_vertices=100)
    assert {r["scc_id"] for r in scc.collect()} == {"v0"}


def _nodes_edges(spark, edge_rows, node_ids):
    nodes = spark.createDataFrame(
        [(v, "Chunk", "t", 0, None, 3, None, None, None, None, i)
         for i, v in enumerate(node_ids)],
        schemas.NODES,
    )
    edges = spark.createDataFrame(edge_rows, schemas.EDGES)
    return nodes, edges


def test_prerequisite_collapse_before_type_filter(spark):
    """(a,b) carries PREREQUISITE(order 0) shadowed by MENTIONS(order 1):
    the reference's DiGraph keeps only the MENTIONS edge, so the
    PREREQUISITE subgraph is EMPTY → depth 0, effort = own difficulty."""
    from k2_18_spark.graph.scc import prerequisite_metrics

    nodes, edges = _nodes_edges(
        spark,
        [("a", "b", "PREREQUISITE", 1.0, None, 0),
         ("a", "b", "MENTIONS", 1.0, None, 1)],
        ["a", "b"],
    )
    got = {r["id"]: (r["prerequisite_depth"], r["learning_effort"])
           for r in prerequisite_metrics(spark, edges, nodes).collect()}
    assert got == {"a": (0, 3.0), "b": (0, 3.0)}


def test_educational_collapse_before_type_filter(spark):
    """Same shadowing for the educational subgraph → empty edge set →
    uniform PageRank over all vertices."""
    from k2_18_spark.graph.pagerank import educational_importance

    nodes, edges = _nodes_edges(
        spark,
        [("a", "b", "PREREQUISITE", 1.0, None, 0),
         ("a", "b", "MENTIONS", 1.0, None, 1)],
        ["a", "b"],
    )
    got = {r["id"]: r["rank"]
           for r in educational_importance(spark, edges, nodes=nodes).collect()}
    assert got == {"a": 0.5, "b": 0.5}


def test_degree_centrality_single_node_matches_nx(spark):
    from k2_18_spark.operators.degrees import degrees

    nodes, edges = _nodes_edges(spark, [], ["only"])
    got = degrees(edges, nodes).collect()
    assert len(got) == 1
    assert got[0]["degree_centrality"] == 1.0


def test_shingles_zipwith_chain_matches_replica(spark):
    """r6: _shingles builds grams as a zip_with concat chain; pin the
    exact semantics against a pure-python replica — including the
    short-doc partial tail gram (size < n keeps the join of ALL
    tokens, the behavior the old slice-in-transform form had)."""
    import re

    from pyspark.sql import functions as F

    from k2_18_spark.operators.dedup import _shingles

    texts = [
        "The quick brown fox jumps over the lazy dog",
        "one two",          # shorter than n=3 → one partial shingle
        "single",           # one token
        "  spaced   out\ttokens  here  ",
        "dup dup dup dup",  # distinct collapses repeats
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {
        r["doc_id"]: sorted(r["sh"])
        for r in df.select("doc_id", _shingles("text", 3).alias("sh")).collect()
    }
    for i, t in enumerate(texts):
        toks = re.sub(r"\s+", " ", t.strip().lower()).split(" ")
        grams = [
            " ".join(toks[j : j + 3])
            for j in range(max(len(toks) - 3, 0) + 1)
        ]
        assert got[i] == sorted(set(grams)), i
