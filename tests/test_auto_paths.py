"""Size-triggered default paths (round-4 VERDICT task 2 + 3):

- candidate_fn="auto" in dedup_graph / find_duplicate_pairs /
  refiner.candidate_pairs — exact all-pairs below AUTO_EXACT_MAX,
  bucketed hyperplane-LSH above, identical maps on planted clusters
  either side of the threshold.
- mine_mentions(method="auto") — broadcast-regex below
  BROADCAST_MAX_TERMS, inverted-index above, identical edges.
- attach_existing_edges plan: the edge table is semi-joined to the
  candidate pairs BEFORE any aggregate (no full-edge collect_list).
"""

from pyspark.sql import functions as F

from k2_18_spark.pipeline.dedup_pipeline import (
    dedup_graph,
    exact_candidates,
    resolve_candidate_fn,
)
from k2_18_spark.pipeline.mentions import mine_mentions
from k2_18_spark.pipeline.refiner import attach_existing_edges, candidate_pairs


def _planted(spark, n_clusters=6, cluster_size=4):
    """Chunk corpus of identical-vector clusters (cos=1.0 within, 0.0
    across) — LSH recall on exact duplicates is 1.0 by construction
    (identical vectors get identical signatures), so auto-exact and
    auto-LSH must produce the same dedup map."""
    dim = n_clusters
    nodes, vecs = [], []
    for c in range(n_clusters):
        v = [1.0 if i == c else 0.0 for i in range(dim)]
        for k in range(cluster_size):
            nid = f"s:c:{c * 1000 + k * 10}"
            nodes.append((nid, "Chunk", f"cluster {c} member {k} text"))
            vecs.append((nid, v))
    nodes_df = spark.createDataFrame(nodes, "id string, type string, text string")
    emb_df = spark.createDataFrame(vecs, "node_id string, vector array<double>")
    edges_df = spark.createDataFrame(
        [], "src_id string, dst_id string, edge_type string, weight double"
    )
    return nodes_df, edges_df, emb_df


def test_resolve_candidate_fn_switches_at_threshold(spark):
    vecs = spark.createDataFrame(
        [(f"v{i}", [float(i), 1.0]) for i in range(4)],
        "id string, vector array<double>",
    )
    # at/below the threshold → the exact path, literally
    assert resolve_candidate_fn(vecs, "auto", auto_exact_max=4) is exact_candidates
    # above → a lsh_candidates closure, not exact
    picked = resolve_candidate_fn(vecs, "auto", auto_exact_max=3)
    assert picked is not exact_candidates and callable(picked)
    # None pins exact; callables pass through untouched
    assert resolve_candidate_fn(vecs, None) is exact_candidates
    sentinel = lambda df: df  # noqa: E731
    assert resolve_candidate_fn(vecs, sentinel) is sentinel


def test_dedup_graph_auto_identical_maps_across_threshold(spark):
    nodes, edges, emb = _planted(spark)
    n_docs = emb.count()  # 24

    def run(auto_exact_max):
        *_, dmap, _ = dedup_graph(
            spark, nodes, edges, emb, sim_threshold=0.85,
            candidate_fn="auto", auto_exact_max=auto_exact_max,
        )
        return sorted(
            (r["duplicate_id"], r["master_id"]) for r in dmap.collect()
        )

    exact_side = run(n_docs)  # auto resolves to exact
    lsh_side = run(2)  # auto resolves to LSH
    assert exact_side == lsh_side
    assert len(exact_side) == 6 * 3  # cluster_size-1 dups per cluster


def test_candidate_pairs_auto_identical_across_threshold(spark):
    nodes, _, emb = _planted(spark, n_clusters=4, cluster_size=3)

    def run(auto_exact_max):
        got = candidate_pairs(
            nodes, emb, sim_threshold=0.75,
            candidate_fn="auto", auto_exact_max=auto_exact_max,
        )
        return sorted(
            (r["source_id"], r["target_id"], round(r["similarity"], 9))
            for r in got.collect()
        )

    assert run(1_000) == run(2)


def test_mine_mentions_auto_identical_across_threshold(spark):
    chunks = spark.createDataFrame(
        [
            ("c1", "Chunk", "Sorting and graphs are core topics."),
            ("c2", "Chunk", "Nothing relevant here."),
            ("c3", "Chunk", "graph theory builds on sorting."),
        ],
        "id string, type string, text string",
    )
    concepts = spark.createDataFrame(
        [
            ("p:sort", ("sorting", ["sort order"]), "d"),
            ("p:graph", ("graphs", ["graph theory"]), "d"),
        ],
        "concept_id string, "
        "term struct<primary string, aliases array<string>>, "
        "definition string",
    )

    def run(**kw):
        return sorted(
            (r["src_id"], r["dst_id"])
            for r in mine_mentions(chunks, concepts, **kw).collect()
        )

    broadcast_side = run(method="auto", broadcast_max_terms=1_000)
    indexed_side = run(method="auto", broadcast_max_terms=0)
    pinned = run(method="broadcast")
    assert broadcast_side == indexed_side == pinned
    assert ("c1", "p:sort") in pinned and ("c3", "p:graph") in pinned

    import pytest

    with pytest.raises(ValueError):
        run(method="bogus")


def test_attach_existing_edges_semi_joins_before_aggregate(spark):
    pairs = spark.createDataFrame(
        [("a", "b", 0.9)], "source_id string, target_id string, similarity double"
    )
    edges = spark.createDataFrame(
        [("a", "b", "MENTIONS", 0.35), ("x", "y", "ELABORATES", 0.5)],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    out = attach_existing_edges(pairs, edges)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # both orientations semi-join the edge table down to the pair keys
    # before their collect_list aggregate — the edge-side shuffle is
    # O(|pairs|), not O(|E|)
    assert plan.count("LeftSemi") >= 2
    # and every Aggregate sits above a semi-join, not a raw edge scan:
    # walking the plan text, each "Aggregate" block must be followed by
    # a "Join LeftSemi" before the next Aggregate/end
    segs = plan.split("Aggregate")[1:]
    assert all("LeftSemi" in s for s in segs if "collect_list" in s)
