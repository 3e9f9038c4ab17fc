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


# auto candidate-path tier boundary: inputs at or below this row count
# use the exact all-pairs path (parity; n² is trivial here), above it
# the bucketed hyperplane-LSH path (same idiom as SCC method="auto" and
# the two-tier union-find). ~5k docs ⇒ ≤12.5M scored pairs, the point
# where all-pairs stops being free on a 32-core box.
AUTO_EXACT_MAX = 5_000


def resolve_candidate_fn(
    vectors: DataFrame, candidate_fn, auto_exact_max: int = AUTO_EXACT_MAX
):
    """Resolve the ``candidate_fn`` contract shared by
    find_duplicate_pairs / dedup_graph / refiner.candidate_pairs:

    - ``"auto"`` (the default everywhere): count the input once; exact
      all-pairs at or below ``auto_exact_max`` rows, bucketed LSH above
      (dim read from the first vector). Candidates only lose recall,
      never precision, so the switch is safe-by-construction.
    - ``None``: exact all-pairs (explicit parity pin).
    - any callable: used as-is (e.g. ``lsh_candidates(dim=...)``).
    """
    if candidate_fn == "auto":
        if vectors.count() <= auto_exact_max:
            return exact_candidates
        first = vectors.select("vector").first()
        dim = len(first["vector"]) if first else 0
        return lsh_candidates(dim=dim)
    return candidate_fn or exact_candidates


def exact_candidates(vectors: DataFrame) -> DataFrame:
    """All-pairs candidate generation → (id_a, id_b), id_a < id_b.

    O(n²) crossJoin — the fixture-scale parity path (the reference's
    FAISS exact search sees every pair too, src/dedup.py:169-228).
    NOT for large inputs: pass ``lsh_candidates(...)`` instead.

    The left side is repartitioned first: a crossJoin of two small
    inputs otherwise runs as a SINGLE-partition nested-loop task and
    serializes the whole O(n²) scoring onto one core."""
    par = vectors.sparkSession.sparkContext.defaultParallelism
    a = vectors.select(F.col("id").alias("id_a")).repartition(max(par * 2, 8))
    b = vectors.select(F.col("id").alias("id_b"))
    return a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))


def lsh_candidates(
    dim: int,
    n_planes: int = 8,
    n_tables: int = 8,
    max_bucket_size: int | None = 10_000,
):
    """Candidate-fn factory: bucketed hyperplane-LSH pair generation
    (operators/similarity.hyperplane_candidate_pairs) — the 100 TB
    path. Work is O(Σ bucket²), never all-pairs; recall is tunable via
    (n_planes, n_tables) and verified superset-of-exact on fixtures in
    tests/test_upsert_dedup.py."""
    from k2_18_spark.operators.similarity import hyperplane_candidate_pairs

    def gen(vectors: DataFrame) -> DataFrame:
        return hyperplane_candidate_pairs(
            vectors,
            dim=dim,
            id_col="id",
            vec_col="vector",
            n_planes=n_planes,
            n_tables=n_tables,
            max_bucket_size=max_bucket_size,
        )

    return gen


def find_duplicate_pairs(
    nodes: DataFrame,
    embeddings: DataFrame,
    sim_threshold: float = 0.85,
    len_ratio_min: float = 0.8,
    candidate_fn="auto",
    auto_exact_max: int = AUTO_EXACT_MAX,
) -> DataFrame:
    """J4 → (master_id, duplicate_id, similarity).

    ``embeddings``: (node_id, vector) — L2-normalized, cosine = dot.
    Master choice: lower position, ties by lower id (reference
    src/dedup.py:208-221).

    ``candidate_fn``: see ``resolve_candidate_fn`` — ``"auto"``
    (default) size-switches exact↔LSH at ``auto_exact_max`` rows;
    ``None`` pins exact all-pairs; or pass ``lsh_candidates(dim=...)``
    directly. Every candidate is exact-scored, so a candidate_fn can
    only lose pairs (recall), never corrupt the kept ones (precision
    is exact either way)."""
    cand = filter_dedup_nodes(nodes).select(
        "id", "pos", F.length("text").alias("tlen")
    )
    e = cand.join(
        embeddings.select(F.col("node_id").alias("id"), "vector"), "id"
    )
    vecs = e.select("id", "vector")
    gen = resolve_candidate_fn(vecs, candidate_fn, auto_exact_max)
    id_pairs = gen(vecs)

    attrs_a = e.select(
        F.col("id").alias("id_a"),
        F.col("pos").alias("pos_a"),
        F.col("tlen").alias("len_a"),
        F.col("vector").alias("va"),
    )
    attrs_b = e.select(
        F.col("id").alias("id_b"),
        F.col("pos").alias("pos_b"),
        F.col("tlen").alias("len_b"),
        F.col("vector").alias("vb"),
    )
    pairs = (
        id_pairs.join(attrs_a, "id_a")
        .join(attrs_b, "id_b")
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


def build_dedup_map(
    spark: SparkSession, pairs: DataFrame, max_collect: int = 2_000_000
) -> DataFrame:
    """G11 → (duplicate_id, master_id). Final master per cluster = min
    id among the pairs' initial masters, else min id overall
    (reference src/dedup.py:258-278).

    Two tiers, identical output: pair graphs up to ``max_collect`` rows
    run driver-side union-find with path compression (the reference's
    own algorithm, src/dedup.py:59-99 — duplicate-pair graphs are tiny
    relative to the corpus even at crawl scale); larger ones run the
    distributed components superstep. The count is checked BEFORE any
    collect."""
    n_pairs = pairs.count()
    if n_pairs == 0:
        return spark.createDataFrame([], "duplicate_id string, master_id string")
    if n_pairs <= max_collect:
        rows = pairs.select("master_id", "duplicate_id").collect()
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in rows:
            a, b = find(r["master_id"]), find(r["duplicate_id"])
            if a != b:
                parent[max(a, b)] = min(a, b)
        clusters: dict[str, set[str]] = {}
        for r in rows:
            for v in (r["master_id"], r["duplicate_id"]):
                clusters.setdefault(find(v), set()).add(v)
        dups = {r["duplicate_id"] for r in rows}
        out = []
        for members in clusters.values():
            initial = {m for m in members if m not in dups}
            master = min(initial) if initial else min(members)
            out.extend((m, master) for m in members if m != master)
        return spark.createDataFrame(
            sorted(out), "duplicate_id string, master_id string"
        )

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
    candidate_fn="auto",
    auto_exact_max: int = AUTO_EXACT_MAX,
) -> tuple[DataFrame, DataFrame, DataFrame, dict]:
    """→ (nodes_out, edges_out, dedup_map, stats).

    ``candidate_fn``: see ``resolve_candidate_fn`` — ``"auto"``
    (default) size-switches exact↔LSH at ``auto_exact_max`` input
    rows, ``None`` pins exact all-pairs (fixture parity),
    ``lsh_candidates(dim=...)`` pins the bucketed scale path.

    ``validate=True`` runs the stage-boundary invariant validator on the
    output graph (the reference validates after every stage —
    src/utils/validation.py:106-169) and raises GraphInvariantError on
    any violation; the report lands in ``stats["validation"]``."""
    nodes_before = nodes.count()
    edges_before = edges.count()

    # eager materialization: pairs feed build_dedup_map (count + maybe
    # collect), the similarity join below, AND implicitly every stats
    # count — without it the whole candidate-generation + scoring plan
    # re-executes per downstream action (measured 4-5× end-to-end cost)
    pairs = find_duplicate_pairs(
        nodes,
        embeddings,
        sim_threshold,
        len_ratio_min,
        candidate_fn=candidate_fn,
        auto_exact_max=auto_exact_max,
    ).localCheckpoint(eager=True)
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
