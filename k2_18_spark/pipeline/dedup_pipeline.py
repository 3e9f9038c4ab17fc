"""End-to-end graph dedup (SURVEY.md §3.3 — reference src/dedup.py).

Stages, all DataFrame-only:
1. P1  filter Chunk/Assessment with non-empty text (src/dedup.py:135-149)
2. F8  parse global position from ids (:102-132)
3. J4  similarity self-join on the embeddings table with sim ≥
       threshold (0.85) + P7 length-ratio ≥ 0.8 (:169-228); master =
       lower (position, id)
4. G11 cluster pairs via the connected-components superstep
       (union-find equivalent); final master = min initial-master of
       the cluster, else min id (:231-281)
5. J2/P5/U1/J1 rewrite edges through the dedup map, drop empty nodes,
       drop duplicate (src,dst,type), drop dangling edges (:284-356)
6. A10 stats (_meta equivalent)

The reference finds candidates with a FAISS HNSW index; the engine
uses the exact blocked cosine join for fixture-scale parity and
MinHash/hyperplane LSH (operators/) as the 100 TB candidate path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from k2_18_spark.operators.dedup import cosine
from k2_18_spark.operators.graph_ops import drop_dangling_edges, rewrite_edges


def global_position(id_col) -> F.Column:
    """F8: {slug}:c:{pos} / {slug}:q:{pos}:{idx} → pos (long)."""
    return F.split(id_col, ":").getItem(2).cast("long")


def filter_dedup_nodes(nodes: DataFrame) -> DataFrame:
    """P1 + T2 sort keys."""
    return (
        nodes.filter(
            F.col("type").isin("Chunk", "Assessment")
            & F.col("text").isNotNull()
            & (F.trim(F.col("text")) != "")
        )
        .withColumn("pos", global_position(F.col("id")))
    )


def find_duplicate_pairs(
    nodes: DataFrame,
    embeddings: DataFrame,
    sim_threshold: float = 0.85,
    len_ratio_min: float = 0.8,
) -> DataFrame:
    """J4 → (master_id, duplicate_id, similarity).

    ``embeddings``: (node_id, vector) — L2-normalized, cosine = dot.
    Master choice: lower position, ties by lower id (reference
    src/dedup.py:208-221)."""
    cand = filter_dedup_nodes(nodes).select(
        "id", "pos", F.length("text").alias("tlen")
    )
    e = cand.join(
        embeddings.select(F.col("node_id").alias("id"), "vector"), "id"
    )
    a = e.select(
        F.col("id").alias("id_a"),
        F.col("pos").alias("pos_a"),
        F.col("tlen").alias("len_a"),
        F.col("vector").alias("va"),
    )
    b = e.select(
        F.col("id").alias("id_b"),
        F.col("pos").alias("pos_b"),
        F.col("tlen").alias("len_b"),
        F.col("vector").alias("vb"),
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "len_ratio",
            F.least("len_a", "len_b") / F.greatest("len_a", "len_b"),
        )
        .filter(F.col("len_ratio") >= len_ratio_min)
        .withColumn("similarity", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("similarity") >= sim_threshold)
    )
    master_is_a = (F.col("pos_a") < F.col("pos_b")) | (
        (F.col("pos_a") == F.col("pos_b")) & (F.col("id_a") < F.col("id_b"))
    )
    return pairs.select(
        F.when(master_is_a, F.col("id_a")).otherwise(F.col("id_b")).alias("master_id"),
        F.when(master_is_a, F.col("id_b")).otherwise(F.col("id_a")).alias(
            "duplicate_id"
        ),
        "similarity",
    )


def build_dedup_map(spark: SparkSession, pairs: DataFrame) -> DataFrame:
    """G11 → (duplicate_id, master_id). Final master per cluster = min
    id among the pairs' initial masters, else min id overall
    (reference src/dedup.py:258-278)."""
    from k2_18_spark.graph.components import connected_components

    edges = pairs.select(
        F.col("master_id").alias("src_id"), F.col("duplicate_id").alias("dst_id")
    )
    comp = connected_components(spark, edges)

    # a node is an "initial master" if it never appears as a duplicate
    dups = pairs.select(F.col("duplicate_id").alias("id")).distinct()
    initial_masters = (
        pairs.select(F.col("master_id").alias("id"))
        .distinct()
        .join(dups, "id", "left_anti")
    )
    w = Window.partitionBy("component_id")
    labeled = comp.join(
        initial_masters.withColumn("is_master", F.lit(1)), "id", "left"
    )
    final = labeled.withColumn(
        "final_master",
        F.coalesce(
            F.min(F.when(F.col("is_master") == 1, F.col("id"))).over(w),
            F.min("id").over(w),
        ),
    )
    return final.filter(F.col("id") != F.col("final_master")).select(
        F.col("id").alias("duplicate_id"), F.col("final_master").alias("master_id")
    )


def dedup_graph(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    embeddings: DataFrame,
    sim_threshold: float = 0.85,
    len_ratio_min: float = 0.8,
    validate: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame, dict]:
    """→ (nodes_out, edges_out, dedup_map, stats).

    ``validate=True`` runs the stage-boundary invariant validator on the
    output graph (the reference validates after every stage —
    src/utils/validation.py:106-169) and raises GraphInvariantError on
    any violation; the report lands in ``stats["validation"]``."""
    nodes_before = nodes.count()
    edges_before = edges.count()

    pairs = find_duplicate_pairs(nodes, embeddings, sim_threshold, len_ratio_min)
    dedup_map = build_dedup_map(spark, pairs).cache()

    # remove duplicate nodes; also drop Chunk/Assessment with blank text (P5)
    nodes_out = nodes.join(
        dedup_map.withColumnRenamed("duplicate_id", "id"), "id", "left_anti"
    ).filter(
        ~(
            F.col("type").isin("Chunk", "Assessment")
            & (F.coalesce(F.trim(F.col("text")), F.lit("")) == "")
        )
    )
    edges_rewritten = rewrite_edges(edges, dedup_map)
    edges_out = drop_dangling_edges(edges_rewritten, nodes_out)

    # similarity per final (duplicate → master) pair for the dedup_map CSV
    dedup_map_csv = dedup_map.join(
        pairs.select("duplicate_id", F.col("similarity")),
        "duplicate_id",
        "left",
    ).groupBy("duplicate_id", "master_id").agg(
        F.max("similarity").alias("similarity")
    )

    stats = {
        "nodes_before": nodes_before,
        "nodes_after": nodes_out.count(),
        "edges_before": edges_before,
        "edges_after": edges_out.count(),
        "duplicates_removed": dedup_map.count(),
    }
    if validate:
        from k2_18_spark.operators.validate import assert_valid_graph

        stats["validation"] = assert_valid_graph(nodes_out, edges_out)
    return nodes_out, edges_out, dedup_map_csv, stats
