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


# -- LSH candidate path (VERDICT r02 task 1) ------------------------------


def _clustered_corpus(spark, n_clusters=8, per=5, dim=16):
    """Deterministic clustered embeddings: per-cluster near-identical
    vectors (cos ≈ 0.9997 within, ≈ 0 across) — every within-cluster
    pair clears threshold 0.85, nothing else does."""
    import math as m

    nodes_rows, emb_rows = [], []
    idx = 0
    for c in range(n_clusters):
        for j in range(per):
            nid = f"s:c:{idx}"
            v = [0.0] * dim
            v[c] = 1.0
            v[(c + j + 1) % dim] += 0.01 * (j + 1)
            norm = m.sqrt(sum(x * x for x in v))
            nodes_rows.append((nid, "Chunk", "body " + "x" * 40))
            emb_rows.append((nid, [x / norm for x in v]))
            idx += 1
    nodes = spark.createDataFrame(nodes_rows, "id string, type string, text string")
    emb = spark.createDataFrame(emb_rows, "node_id string, vector array<double>")
    return nodes, emb


def test_lsh_candidates_match_exact_pairs_and_map(spark):
    """The bucketed LSH candidate path must recover every pair the
    exact all-pairs path finds at threshold 0.85 on fixture-scale
    clustered data (deterministic planes → deterministic result), and
    feed build_dedup_map to the identical dedup map."""
    from k2_18_spark.pipeline.dedup_pipeline import lsh_candidates

    nodes, emb = _clustered_corpus(spark, dim=16)
    exact = find_duplicate_pairs(nodes, emb, sim_threshold=0.85)
    lsh = find_duplicate_pairs(
        nodes,
        emb,
        sim_threshold=0.85,
        candidate_fn=lsh_candidates(dim=16, n_planes=6, n_tables=10),
    )
    key = lambda r: (r["master_id"], r["duplicate_id"], round(r["similarity"], 9))
    exact_set = {key(r) for r in exact.collect()}
    lsh_set = {key(r) for r in lsh.collect()}
    assert exact_set  # 8 clusters × C(5,2) = 80 pairs
    assert len(exact_set) == 80
    assert lsh_set >= exact_set  # full recall on fixtures
    assert lsh_set == exact_set  # precision is exact by construction

    m_exact = {
        (r["duplicate_id"], r["master_id"])
        for r in build_dedup_map(spark, exact).collect()
    }
    m_lsh = {
        (r["duplicate_id"], r["master_id"])
        for r in build_dedup_map(spark, lsh).collect()
    }
    assert m_lsh >= m_exact and m_lsh == m_exact
    # 8 clusters of 5 → 32 duplicates, master = min-position member
    assert len(m_exact) == 32


def test_dedup_graph_lsh_path_end_to_end(spark):
    """dedup_graph(candidate_fn=lsh_candidates(...)) produces the same
    outputs as the default exact path on the mini corpus."""
    from k2_18_spark.pipeline.dedup_pipeline import lsh_candidates

    nodes, edges, emb = _mini_corpus(spark)
    n1, e1, map1, s1 = dedup_graph(spark, nodes, edges, emb)
    n2, e2, map2, s2 = dedup_graph(
        spark,
        nodes,
        edges,
        emb,
        candidate_fn=lsh_candidates(dim=3, n_planes=4, n_tables=6),
    )
    assert {r["id"] for r in n1.collect()} == {r["id"] for r in n2.collect()}
    assert {tuple(r) for r in e1.collect()} == {tuple(r) for r in e2.collect()}
    assert {tuple(r) for r in map1.collect()} == {tuple(r) for r in map2.collect()}
    assert s1["duplicates_removed"] == s2["duplicates_removed"] == 1


def test_refiner_lsh_candidates_match_exact(spark):
    """refiner.candidate_pairs with the LSH candidate_fn returns the
    same top-k forward/backward candidates as the all-pairs path."""
    from k2_18_spark.pipeline.dedup_pipeline import lsh_candidates
    from k2_18_spark.pipeline.refiner import candidate_pairs

    nodes, emb = _clustered_corpus(spark, dim=16)
    for direction in ("forward", "backward"):
        exact = candidate_pairs(
            nodes, emb, sim_threshold=0.85, direction=direction
        )
        lsh = candidate_pairs(
            nodes,
            emb,
            sim_threshold=0.85,
            direction=direction,
            candidate_fn=lsh_candidates(dim=16, n_planes=6, n_tables=10),
        )
        key = lambda r: (
            r["source_id"], r["target_id"], round(r["similarity"], 9)
        )
        assert {key(r) for r in exact.collect()} == {key(r) for r in lsh.collect()}


def test_build_dedup_map_tiers_agree(spark):
    """Driver union-find tier and distributed components tier produce
    the identical dedup map (max_collect=0 forces the superstep path)."""
    pairs = spark.createDataFrame(
        [
            ("a", "b", 0.9),
            ("b", "c", 0.9),
            ("x", "y", 0.95),
            ("m", "n", 0.88),
            ("n", "o", 0.87),
            ("o", "p", 0.91),
        ],
        "master_id string, duplicate_id string, similarity double",
    )
    fast = {tuple(r) for r in build_dedup_map(spark, pairs).collect()}
    dist = {
        tuple(r) for r in build_dedup_map(spark, pairs, max_collect=0).collect()
    }
    assert fast == dist
    assert fast == {("b", "a"), ("c", "a"), ("y", "x"),
                    ("n", "m"), ("o", "m"), ("p", "m")}
