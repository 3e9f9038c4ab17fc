"""Weighted single-source / multi-source shortest paths as a DataFrame
superstep loop (SURVEY.md G40).

The reference computes per-source shortest-path trees inside its
centrality pass (viz/graph2metrics.py Brandes SSSP stage); this module
exposes the primitive directly as a distributed operator — "distance
from the seed pages/concepts" is the standard link-graph question the
centrality internals never surface.

Algorithm: frontier Bellman-Ford (the Pregel SSSP formulation — equal
to delta-stepping with a single infinite bucket). State is the SPARSE
set of reached vertices ``(id, dist, hops)``; each superstep relaxes
only the out-edges of vertices improved in the previous round:

    cand   = frontier ⋈ edges on src            (one |frontier|-shuffle)
    best   = min_(dist, hops) per dst           (map-side combinable)
    merged = dist ⟗ best, keep lexicographic min

Correctness matches full-vector Bellman-Ford round for round: a vertex
not improved last round contributes only relaxations already absorbed
in earlier rounds, so skipping it changes nothing. Round count is
bounded by the hop length of the longest shortest path (≤ |V|-1);
non-negative weights are required and validated up front (one
aggregate) — with them every (dist, hops) update strictly decreases,
so the loop terminates.

Determinism: distances are min-folds of identical double sums (min is
exact regardless of order, and each candidate ``dist[src] + w`` has
bit-identical operands on every engine by induction over rounds), so
results are bit-reproducible across engines — the DuckDB oracle
replays the same recurrence. Ties between equal-distance paths resolve
to the fewest hops (lexicographic ``(dist, hops)`` min, associative as
a struct min → safe under map-side partial aggregation and hub keys).

Scale: the edge relation is weight-sanitized, dictionary-encoded to
8-byte vertex keys, deduplicated to the MIN length per (src, dst) pair
(parallel edges can never shorten a path below their min), partitioned
by the per-round join key ``src`` and persisted ONCE — each superstep
shuffles only the frontier vector, never the edge table. Hub fan-in is
absorbed by the map-side partial min. Every superstep checkpoints
(dist, hops, improved) with per-partition lineage and resumes mid-run
(same CheckpointStore contract as PageRank/components).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from k2_18_spark.checkpoint import CheckpointStore
from k2_18_spark.graph.adjacency import vertex_ids

# supersteps executed by the most recent sssp run (observability —
# pagerank.LAST_RUN_ITERATIONS idiom)
LAST_RUN_ITERATIONS = 0


def sssp(
    spark: SparkSession,
    edges: DataFrame,
    sources: Sequence[str] | DataFrame,
    nodes: DataFrame | None = None,
    weight_mode: str = "weight",
    directed: bool = True,
    max_iter: int = 100_000,
    checkpoint_dir: str | None = None,
    job_name: str = "sssp",
    num_partitions: int | None = None,
) -> DataFrame:
    """→ DataFrame ``(id, distance double, hops int)`` for every vertex
    REACHABLE from any source (unreachable vertices are absent, the
    ``bfs_distances`` convention in graph/diameter.py).

    ``sources``: vertex ids (sequence, or a DataFrame with an ``id``
    column and optionally ``dist0`` for a per-source head start — the
    landmark/partial-resume idiom; default 0.0).

    ``weight_mode``:
      - ``"weight"``  — edge ``weight`` column IS the length
      - ``"unit"``    — every edge has length 1 (weighted BFS ≡ hops)
      - ``"inverse"`` — length = 1/weight: strong edges are short, the
        knowledge-graph affinity→distance map (functions/weights.py
        ``inverse_weight``, F11; reference viz/graph2metrics.py builds
        its distance graph the same way)

    Lengths must be non-negative and finite; the input is validated
    with one aggregate before the loop and a ``ValueError`` names the
    offending count — silent NULL/negative weights would corrupt every
    downstream distance.
    """
    from k2_18_spark.session import superstep_conf

    with superstep_conf(spark):
        return _sssp_loop(
            spark, edges, sources, nodes, weight_mode, directed, max_iter,
            checkpoint_dir, job_name, num_partitions,
        )


def _edge_lengths(edges: DataFrame, weight_mode: str) -> DataFrame:
    if weight_mode == "unit":
        return edges.select("src_id", "dst_id", F.lit(1.0).alias("w"))
    if weight_mode == "weight":
        return edges.select("src_id", "dst_id", F.col("weight").cast("double").alias("w"))
    if weight_mode == "inverse":
        # inverse_weight semantics (F11): w>0 → 1/w; else invalid here
        # (a zero-affinity edge has no finite distance interpretation)
        return edges.select(
            "src_id",
            "dst_id",
            (F.lit(1.0) / F.col("weight").cast("double")).alias("w"),
        )
    raise ValueError(f"unknown weight_mode {weight_mode!r}")


def _sssp_loop(
    spark, edges, sources, nodes, weight_mode, directed, max_iter,
    checkpoint_dir, job_name, num_partitions,
) -> DataFrame:
    global LAST_RUN_ITERATIONS
    from k2_18_spark.graph.adjacency import dense_vertex_ids

    if nodes is not None and "node_order" in nodes.columns:
        verts = nodes.select("id", F.col("node_order").alias("ord"))
    else:
        verts = dense_vertex_ids(vertex_ids(edges, nodes))
    verts = verts.persist(StorageLevel.MEMORY_AND_DISK)
    n = verts.count()
    out_schema = "id string, distance double, hops int"
    if n == 0:
        verts.unpersist()
        return spark.createDataFrame([], out_schema)

    lengths = _edge_lengths(edges, weight_mode)
    bad = lengths.agg(
        F.sum(
            (
                F.col("w").isNull()
                | F.isnan("w")
                | (F.col("w") < 0)
                | (F.col("w") == float("inf"))
            ).cast("long")
        )
    ).collect()[0][0]
    if bad:
        raise ValueError(
            f"sssp(weight_mode={weight_mode!r}): {bad} edge(s) with "
            "NULL/NaN/negative/non-finite length — sanitize weights first "
            "(functions/weights.py, P4)"
        )

    # min length per directed pair (parallel edges: only the min can lie
    # on a shortest path); undirected = canonical-pair min then mirror
    if directed:
        rel = lengths.groupBy("src_id", "dst_id").agg(F.min("w").alias("w"))
    else:
        rel = (
            lengths.select(
                F.least("src_id", "dst_id").alias("src_id"),
                F.greatest("src_id", "dst_id").alias("dst_id"),
                "w",
            )
            .groupBy("src_id", "dst_id")
            .agg(F.min("w").alias("w"))
        )
        rel = rel.union(
            rel.select(
                F.col("dst_id").alias("src_id"),
                F.col("src_id").alias("dst_id"),
                "w",
            )
        )
    rel = rel.filter(F.col("src_id") != F.col("dst_id"))

    # dictionary-encode endpoints: supersteps shuffle 8-byte keys only
    enc_s = verts.select(F.col("id").alias("src_id"), F.col("ord").alias("_vs"))
    enc_d = verts.select(F.col("id").alias("dst_id"), F.col("ord").alias("_vd"))
    rel = (
        rel.join(enc_s.hint("shuffle_hash"), "src_id")
        .join(enc_d.hint("shuffle_hash"), "dst_id")
        .select(F.col("_vs").alias("src"), F.col("_vd").alias("dst"), "w")
        .repartition(*([num_partitions, "src"] if num_partitions else ["src"]))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rel.count()  # eager — supersteps must not pay the build

    if isinstance(sources, DataFrame):
        src_df = sources.select(
            "id",
            (
                F.col("dist0").cast("double")
                if "dist0" in sources.columns
                else F.lit(0.0)
            ).alias("dist"),
        )
    else:
        src_df = spark.createDataFrame(
            [(s, 0.0) for s in sources], "id string, dist double"
        )
    seed = (
        src_df.join(verts.hint("shuffle_hash"), "id")
        .groupBy(F.col("ord").alias("id"))
        .agg(F.min("dist").alias("dist"))
        .select("id", "dist", F.lit(0).alias("hops"), F.lit(1).cast("long").alias("improved"))
    )

    store = (
        CheckpointStore(
            spark, checkpoint_dir, job_name, state_version="encoded-long-v1"
        )
        if checkpoint_dir
        else None
    )

    state = None
    start_iter = 0
    if store is not None:
        last = store.latest_iteration()
        if last is not None:
            state = store.load_state(last).select("id", "dist", "hops", "improved")
            if store.load_marker(last).get("converged"):
                return _decode(state, verts, rel, out_schema)
            start_iter = last + 1
    if state is None:
        state = seed.localCheckpoint(eager=True)
        if state.isEmpty():
            verts.unpersist()
            rel.unpersist()
            return spark.createDataFrame([], out_schema)

    LAST_RUN_ITERATIONS = 0
    for it in range(start_iter, max_iter):
        frontier = state.filter(F.col("improved") == 1).select("id", "dist", "hops")
        # shuffle_hash: hash the frontier vector, stream the persisted
        # src-partitioned edges (no per-round sort of the edge table)
        cand = (
            rel.join(
                frontier.withColumnRenamed("id", "src").hint("shuffle_hash"),
                "src",
            )
            .select(
                F.col("dst").alias("id"),
                F.struct(
                    (F.col("dist") + F.col("w")).alias("dist"),
                    (F.col("hops") + F.lit(1)).alias("hops"),
                ).alias("cand"),
            )
            .groupBy("id")
            .agg(F.min("cand").alias("cand"))  # lexicographic (dist, hops)
        )
        merged = (
            state.select("id", "dist", "hops")
            .join(cand.hint("shuffle_hash"), "id", "full_outer")
            .select(
                "id",
                F.when(
                    F.col("dist").isNull()
                    | (
                        F.col("cand").isNotNull()
                        & (
                            (F.col("cand.dist") < F.col("dist"))
                            | (
                                (F.col("cand.dist") == F.col("dist"))
                                & (F.col("cand.hops") < F.col("hops"))
                            )
                        )
                    ),
                    F.lit(1),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias("improved"),
                "dist",
                "hops",
                "cand",
            )
            .select(
                "id",
                F.when(F.col("improved") == 1, F.col("cand.dist"))
                .otherwise(F.col("dist"))
                .alias("dist"),
                F.when(F.col("improved") == 1, F.col("cand.hops"))
                .otherwise(F.col("hops"))
                .alias("hops"),
                "improved",
            )
        )
        prev_state = state
        if store is not None:
            merged = store.save_state(it, merged, rows_in=n)
        else:
            # lazy: the changed-count aggregate materializes the
            # checkpoint in the SAME job — one scheduling round per
            # superstep, not two
            merged = merged.localCheckpoint(eager=False)
        changed = merged.agg(F.sum("improved")).collect()[0][0] or 0
        state = merged
        prev_state.unpersist()
        LAST_RUN_ITERATIONS = it - start_iter + 1
        if changed == 0:
            if store is not None:
                store.annotate(it, converged=True)
            break
    else:
        raise RuntimeError(f"sssp did not converge in {max_iter} supersteps")

    return _decode(state, verts, rel, out_schema)


def _decode(state: DataFrame, verts: DataFrame, rel: DataFrame, out_schema: str):
    dec = verts.select(F.col("ord").alias("id"), F.col("id").alias("orig_id"))
    out = state.join(dec, "id").select(
        F.col("orig_id").alias("id"),
        F.col("dist").alias("distance"),
        F.col("hops").cast("int").alias("hops"),
    )
    # pin results before releasing the inputs the plan depends on
    out = out.localCheckpoint(eager=True)
    verts.unpersist()
    rel.unpersist()
    return out
