"""Edge-upsert merge (J7) + dedup pipeline (§3.3) tests with pure-Python
reference-semantics oracles."""

import math

from pyspark.sql import functions as F

from k2_18_spark.pipeline.dedup_pipeline import (
    build_dedup_map,
    dedup_graph,
    find_duplicate_pairs,
)
from k2_18_spark.pipeline.upsert import upsert_edges


def to_edges_df(spark, rows):
    return spark.createDataFrame(
        rows, "src_id string, dst_id string, edge_type string, weight double"
    )


def reference_upsert(existing: list, new: list) -> list:
    """Sequential oracle reimplementing refiner_longrange.py:1021-1193."""
    edges = [dict(e) for e in existing]
    for ne in new:
        ne = dict(ne)
        key_edges = [e for e in edges if (e["src"], e["dst"]) == (ne["src"], ne["dst"])]
        if not key_edges:
            ne["conditions"] = "added_by=refiner_longrange_v1"
            edges.append(ne)
            continue
        same = [e for e in key_edges if e["type"] == ne["type"]]
        if same:
            if ne["weight"] > same[0].get("weight", 0.5):
                same[0]["weight"] = ne["weight"]
        else:
            max_w = max(e.get("weight", 0.5) for e in key_edges)
            if ne["weight"] >= max_w:
                for e in key_edges:
                    edges.remove(e)
                ne["conditions"] = "fixed_by=refiner_longrange_v1"
                edges.append(ne)
    return [
        e
        for e in edges
        if not (e["type"] == "PREREQUISITE" and e["src"] == e["dst"])
    ]


def test_upsert_matches_sequential_oracle(spark):
    existing = [
        {"src": "a", "dst": "b", "type": "ELABORATES", "weight": 0.4},
        {"src": "a", "dst": "b", "type": "MENTIONS", "weight": 0.35},
        {"src": "b", "dst": "c", "type": "PREREQUISITE", "weight": 0.8},
        {"src": "c", "dst": "d", "type": "TESTS", "weight": 0.6},
    ]
    new = [
        {"src": "x", "dst": "y", "type": "PREREQUISITE", "weight": 0.7},  # add
        {"src": "a", "dst": "b", "type": "ELABORATES", "weight": 0.9},  # update
        {"src": "b", "dst": "c", "type": "ELABORATES", "weight": 0.9},  # replace
        {"src": "c", "dst": "d", "type": "HINT_FORWARD", "weight": 0.1},  # kept
        {"src": "z", "dst": "z", "type": "PREREQUISITE", "weight": 0.9},  # self-loop
    ]
    want = {
        (e["src"], e["dst"], e["type"]): (e["weight"], e.get("conditions"))
        for e in reference_upsert(existing, new)
    }

    ex_df = to_edges_df(
        spark, [(e["src"], e["dst"], e["type"], e["weight"]) for e in existing]
    )
    new_df = to_edges_df(
        spark, [(e["src"], e["dst"], e["type"], e["weight"]) for e in new]
    )
    merged, stats = upsert_edges(ex_df, new_df)
    got = {
        (r["src_id"], r["dst_id"], r["edge_type"]): (r["weight"], r["conditions"])
        for r in merged.collect()
    }
    assert got == want
    s = {(r["outcome"], r["edge_type"]): r["n"] for r in stats.collect()}
    assert s[("added", "PREREQUISITE")] == 2  # x→y and the self-loop (dropped later)
    assert s[("updated", "ELABORATES")] == 1
    assert s[("replaced", "ELABORATES")] == 1
    assert s[("kept", "HINT_FORWARD")] == 1


def _mini_corpus(spark):
    nodes = spark.createDataFrame(
        [
            ("alg:c:0", "Chunk", "intro text about sorting"),
            ("alg:c:100", "Chunk", "intro text about sortin"),  # near-dup of c:0
            ("alg:c:200", "Chunk", "completely different content here"),
            ("alg:q:100:0", "Assessment", "question about sorting intro"),
            ("alg:p:1", "Concept", "sorting"),
            ("alg:c:300", "Chunk", "   "),  # blank → dropped in rewrite
        ],
        "id string, type string, text string",
    )
    # hand-built normalized vectors: c:0 ≈ c:100 (cos 1.0), others orthogonal
    import math as m

    v = {
        "alg:c:0": [1.0, 0.0, 0.0],
        "alg:c:100": [1.0, 0.0, 0.0],
        "alg:c:200": [0.0, 1.0, 0.0],
        "alg:q:100:0": [0.0, 0.0, 1.0],
    }
    emb = spark.createDataFrame(
        [(k, vv) for k, vv in v.items()], "node_id string, vector array<double>"
    )
    edges = to_edges_df(
        spark,
        [
            ("alg:c:100", "alg:c:200", "PREREQUISITE", 0.9),
            ("alg:c:0", "alg:p:1", "MENTIONS", 0.35),
            ("alg:c:100", "alg:p:1", "MENTIONS", 0.35),
            ("alg:c:100", "alg:c:0", "PARALLEL", 0.5),  # becomes self-loop → drop
            ("alg:c:300", "alg:c:200", "ELABORATES", 0.5),  # src node removed
        ],
    )
    return nodes, edges, emb


def test_find_duplicate_pairs_master_by_position(spark):
    nodes, _, emb = _mini_corpus(spark)
    pairs = find_duplicate_pairs(nodes, emb, sim_threshold=0.85).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert p["master_id"] == "alg:c:0" and p["duplicate_id"] == "alg:c:100"
    assert math.isclose(p["similarity"], 1.0, abs_tol=1e-9)


def test_dedup_graph_end_to_end(spark):
    nodes, edges, emb = _mini_corpus(spark)
    nodes_out, edges_out, dmap, stats = dedup_graph(spark, nodes, edges, emb)
    ids = {r["id"] for r in nodes_out.collect()}
    assert "alg:c:100" not in ids  # duplicate removed
    assert "alg:c:300" not in ids  # blank removed
    assert "alg:c:0" in ids and "alg:p:1" in ids
    eout = {
        (r["src_id"], r["dst_id"], r["edge_type"]) for r in edges_out.collect()
    }
    # c:100 → c:200 rewritten to master c:0
    assert ("alg:c:0", "alg:c:200", "PREREQUISITE") in eout
    # the two MENTIONS collapse to one after rewrite
    assert ("alg:c:0", "alg:p:1", "MENTIONS") in eout
    # rewritten self-loop dropped; dangling (c:300) edge dropped
    assert not any(s == d for s, d, _ in eout)
    assert not any(s == "alg:c:300" for s, _, _ in eout)
    assert stats["duplicates_removed"] == 1
    m = dmap.collect()
    assert len(m) == 1 and m[0]["master_id"] == "alg:c:0"


def test_build_dedup_map_transitive_cluster(spark):
    pairs = spark.createDataFrame(
        [
            ("a", "b", 0.9),
            ("b", "c", 0.9),  # b is master of c but duplicate of a
            ("x", "y", 0.95),
        ],
        "master_id string, duplicate_id string, similarity double",
    )
    got = {
        r["duplicate_id"]: r["master_id"]
        for r in build_dedup_map(spark, pairs).collect()
    }
    # cluster {a,b,c}: only 'a' never appears as duplicate → master
    assert got == {"b": "a", "c": "a", "y": "x"}
