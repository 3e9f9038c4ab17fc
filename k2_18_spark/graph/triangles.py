"""Triangle counting — SURVEY.md G8 (north_rule addition: semantic-
density scoring; not present in the reference).

Canonical distributed algorithm (node-iterator++ / compact-forward):

1. undirected distinct edge set, canonical (a < b), self-loops dropped
2. orient every edge from the lower-(degree, id) endpoint to the
   higher one — each triangle then has exactly ONE wedge at its
   smallest vertex, and per-vertex wedge fan-out is bounded by
   O(sqrt(E)) even on power-law graphs (the classic skew guard:
   hub vertices receive edges but generate no giant wedge lists)
3. wedges: oriented ⋈ oriented on the shared center → (a, b, c)
4. close: semi-join wedges against the oriented edge set on (b, c)

Per-vertex counts credit all three corners. Everything is joins +
groupBy (map-side partial agg) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from k2_18_spark.graph.adjacency import vertex_ids


def _oriented(edges: DataFrame) -> DataFrame:
    """Undirected-dedup then degree-orient. → (lo, hi) with
    (deg, id) of lo < (deg, id) of hi."""
    und = (
        edges.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        und.join(
            deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a")).hint(
                "shuffle_hash"
            ),
            "a",
        )
        .join(
            deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b")).hint(
                "shuffle_hash"
            ),
            "b",
        )
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("lo"), F.col("b").alias("hi")),
            )
            .otherwise(F.struct(F.col("b").alias("lo"), F.col("a").alias("hi")))
            .alias("e")
        )
        .select("e.lo", "e.hi")
    )
    return e


def triangles(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-vertex triangle counts → (id, triangle_count)."""
    tri = triangle_list(spark, edges, num_partitions=num_partitions)
    corners = (
        tri.select(F.col("x").alias("id"))
        .union(tri.select(F.col("y").alias("id")))
        .union(tri.select(F.col("z").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangle_count"))
    verts = vertex_ids(edges, nodes)
    return verts.join(counts, "id", "left").select(
        "id", F.coalesce("triangle_count", F.lit(0)).cast("long").alias("triangle_count")
    )


def triangle_list(
    spark: SparkSession,
    edges: DataFrame,
    num_partitions: int | None = None,
) -> DataFrame:
    """Enumerate each triangle exactly once → (x, y, z)."""
    e = _oriented(edges)
    if num_partitions:
        e = e.repartition(num_partitions, "lo")
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    e.count()  # materialize once; reused three times below

    # wedge at the smallest corner: lo→b, lo→c (b != c, canonical b<c);
    # shuffle_hash (r6): build one side's per-partition hash table
    # instead of sort-merge sorting BOTH copies of the oriented table —
    # degree orientation bounds per-center fan-out (O(√E)), so the
    # build side is safe on power-law graphs
    e1 = e.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = e.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    wedges = e1.join(e2.hint("shuffle_hash"), "x").filter(F.col("y") < F.col("z"))

    # closing edge may be oriented y→z or z→y; canonicalize both sides
    closing = e.select(
        F.least("lo", "hi").alias("y"), F.greatest("lo", "hi").alias("z")
    )
    tri = wedges.join(closing, ["y", "z"], "left_semi").select("x", "y", "z")
    return tri


def triangle_count(spark: SparkSession, edges: DataFrame) -> int:
    """Global triangle count."""
    return triangle_list(spark, edges).count()


def _simple_degrees(edges: DataFrame) -> DataFrame:
    """Degrees on the simple undirected projection → (id, degree)."""
    und = (
        edges.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def clustering_coefficient(
    spark: SparkSession,
    edges: DataFrame,
    nodes: DataFrame | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Local clustering coefficient on the simple undirected graph →
    (id, degree, triangle_count, clustering).

    c(v) = 2·T(v) / (d(v)·(d(v)−1)), 0 where d < 2 (the nx.clustering
    convention). Reuses the degree-oriented triangle counter, so the
    wedge fan-out stays O(sqrt(E)) per vertex on power-law graphs; the
    degree join hashes the |V|-row side."""
    tri = triangles(spark, edges, nodes, num_partitions=num_partitions)
    deg = _simple_degrees(edges)
    return tri.join(deg.hint("shuffle_hash"), "id", "left").select(
        "id",
        F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
        "triangle_count",
        F.when(
            F.coalesce("degree", F.lit(0)) >= 2,
            2.0
            * F.col("triangle_count")
            / (F.col("degree") * (F.col("degree") - F.lit(1))),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def transitivity(spark: SparkSession, edges: DataFrame) -> float:
    """Global transitivity = 3·triangles / wedges (nx.transitivity;
    0.0 on wedge-free graphs). One aggregate over the degree table plus
    the triangle count — no per-vertex state on the driver."""
    deg = _simple_degrees(edges)
    wedges = (
        deg.agg(F.sum(F.col("degree") * (F.col("degree") - 1) / 2)).collect()[0][0]
        or 0
    )
    if wedges == 0:
        return 0.0
    return 3.0 * triangle_count(spark, edges) / float(wedges)


def doulion_triangles(
    spark: SparkSession,
    edges: DataFrame,
    p: float = 0.25,
    seed: str = "doulion",
) -> DataFrame:
    """DOULION sparsified triangle estimate (Tsourakakis et al.,
    KDD'09) → ONE row (n_edges, n_kept, tri_sampled, estimate).

    The 100-TB tier for G8: exact wedge enumeration costs
    O(Σ d_lo(v)²); keeping each canonical undirected edge with
    probability ``p`` cuts wedge work by ~p² and the closing
    semi-join by ~p³, while E[tri_sampled / p³] equals the true
    count (unbiased; Tsourakakis gives the concentration bound).

    The coin is a deterministic md5-threshold draw on the canonical
    pair (the `mixing.py` idiom) — no RNG state, bit-reproducible
    across engines and retries, and any DuckDB/SQL oracle can
    replay the exact sample. ``estimate`` is scaled by a Python
    float literal (1/p³) so both engines multiply by the identical
    double.
    """
    if not 0.0 < p <= 1.0:
        raise ValueError(f"p must be in (0, 1], got {p}")
    und = (
        edges.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_edges = und.count()
    # deterministic keep: 60-bit hex draw on "seed|a|b" under threshold.
    # p == 1 needs a sentinel above every hex string — format(16**15)
    # is 16 chars starting '1', which lexicographically drops ~15/16
    # of 15-char draws instead of keeping all.
    thr = "g" if p >= 1.0 else format(int(max(p, 0.0) * (16**15)), "015x")
    draw = F.substring(
        F.md5(
            F.encode(
                F.concat_ws(
                    "|", F.lit(seed), F.col("a").cast("string"),
                    F.col("b").cast("string"),
                ),
                "UTF-8",
            )
        ),
        1,
        15,
    )
    kept = und.filter(draw < F.lit(thr)).persist(StorageLevel.MEMORY_AND_DISK)
    n_kept = kept.count()
    und.unpersist()
    tri_sampled = triangle_list(
        spark, kept.select(F.col("a").alias("src_id"), F.col("b").alias("dst_id"))
    ).count()
    kept.unpersist()
    scale = 1.0 / (p * p * p)
    return spark.createDataFrame(
        [(n_edges, n_kept, tri_sampled)],
        "n_edges long, n_kept long, tri_sampled long",
    ).select(
        "n_edges",
        "n_kept",
        "tri_sampled",
        F.round(F.col("tri_sampled") * F.lit(scale), 6).alias("estimate"),
    )
