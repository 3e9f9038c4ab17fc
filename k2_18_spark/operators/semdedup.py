"""Semantic dedup over an embedding column: deterministic Lloyd's
k-means partitioning + within-cluster near-duplicate pruning
(SemDeDup, Abbas et al. 2023, arXiv:2303.09540).

The reference clusters document embeddings with a FAISS index before
pairwise scoring (src/dedup.py:152-166); at web scale the same role —
bounding the O(n²) pairwise stage to within-partition work — falls to
k-means here: every pairwise cosine is computed only inside a cluster,
so total work is O(Σ cluster²) instead of all-pairs, and the cluster
column is the natural shuffle key.

Determinism contract (what makes the exact DuckDB oracle possible):

- centroids are seeded from the ``k`` lowest-id vectors (no RNG);
- every centroid coordinate and every distance is rounded to
  ``round_dp`` decimals before it is compared or fed to the next
  round, so both engines argmin over identical decimals and float
  summation-order differences (numpy pairwise vs SQL sequential)
  cannot flip an assignment;
- argmin ties break to the lowest centroid index, prune ties to the
  lowest vec_id.

Scale shape: per round, assignment is ONE Arrow-batched pandas UDF
map over the vectors against a broadcast (k × dim) centroid matrix
(k·dim doubles — tiny), and the recompute is ONE
posexplode → groupBy(cluster, pos) mean whose shuffle is O(k·dim)
after map-side partials. The k×dim collect between rounds is the
documented driver tier (same contract as the PageRank delta scalar).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k2_18_spark.operators.dedup import cosine

log = logging.getLogger(__name__)


def _assign_udf(centroids, round_dp: int):
    """pandas UDF: vector column → struct(cluster, dist) against the
    broadcast rounded centroid matrix. Distances are true Euclidean
    (matching DuckDB ``list_distance``), computed per-centroid as
    sqrt(Σ(x−c)²) and rounded before the argmin."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)  # (k, dim)

    def _assign(vs):
        X = np.stack(vs.to_numpy()).astype(np.float64)  # (n, dim)
        dists = np.empty((len(X), len(C)), dtype=np.float64)
        for j in range(len(C)):
            dists[:, j] = np.sqrt(((X - C[j]) ** 2).sum(axis=1))
        dists = dists.round(round_dp)
        cl = dists.argmin(axis=1)  # first (lowest-index) min = tie rule
        return pd.DataFrame(
            {"cluster": cl.astype("int32"), "dist": dists[np.arange(len(X)), cl]}
        )

    _assign.__annotations__ = {"vs": pd.Series, "return": pd.DataFrame}
    return pandas_udf(_assign, "struct<cluster:int, dist:double>")


def kmeans(
    spark: SparkSession,
    vectors: DataFrame,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Lloyd's k-means, ``n_iter`` centroid updates, deterministic.

    Returns (id, cluster, dist): the assignment of every vector under
    the FINAL centroids (so ``n_iter + 1`` assignment passes total).
    Empty clusters keep their previous centroid.
    """
    v = vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))

    seed_rows = (
        v.orderBy("_id").limit(k).select("_id", "_v").collect()
    )  # k rows — driver tier, k·dim doubles
    centroids = [[round(float(x), round_dp) for x in r["_v"]] for r in seed_rows]
    dim = len(centroids[0])

    for _ in range(n_iter):
        assigned = v.select(
            "_id", "_v", _assign_udf(centroids, round_dp)(F.col("_v")).alias("a")
        ).select("_id", "_v", F.col("a.cluster").alias("cluster"))
        # distributed mean: shuffle is O(k·dim) after map-side partials
        sums = (
            assigned.select("cluster", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        nxt = [list(c) for c in centroids]  # empty cluster → keep previous
        by_cluster: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["mean"]
        for j, coords in by_cluster.items():
            nxt[j] = [round(coords[p], round_dp) for p in range(dim)]
        centroids = nxt

    return v.select(
        F.col("_id").alias(id_col),
        _assign_udf(centroids, round_dp)(F.col("_v")).alias("a"),
    ).select(
        id_col, F.col("a.cluster").alias("cluster"), F.col("a.dist").alias("dist")
    )


def semdedup(
    vectors: DataFrame,
    assignments: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """Within-cluster semantic prune: a vector is DROPPED when some
    other vector in the same k-means cluster has rounded cosine
    similarity ≥ ``threshold`` to it AND is strictly closer to the
    centroid (ties on distance keep the lower id) — one survivor per
    near-duplicate neighborhood, the member that best represents the
    cluster. Returns (id, cluster, keep).

    The self-join is equi-keyed on the cluster column, so the
    quadratic stage is O(Σ cluster²) — but k-means on near-isotropic
    embeddings can still emit a degenerate giant cluster.
    ``max_cluster_size`` bounds that: clusters above the cap are
    deterministically hash-split (xxhash64 of the id) into
    ceil(size/cap) subclusters and pairs are compared within a
    subcluster only. Splitting is precision-safe — every drop still
    requires a genuine ≥threshold neighbor closer to the centroid —
    and loses only recall on pairs that straddle a subcluster
    boundary (the ``minhash_lsh_pairs`` candidate contract). The
    split is logged, never silent. ``None`` (default) disables the
    cap and keeps the exact-oracle semantics.
    """
    va = (
        vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .join(
            assignments.select(
                F.col(id_col).alias("_id"), "cluster", "dist"
            ),
            "_id",
        )
    )
    pair_key = ["cluster"]
    if max_cluster_size is not None:
        sizes = va.groupBy("cluster").agg(F.count(F.lit(1)).alias("_csz"))
        over = sizes.filter(F.col("_csz") > max_cluster_size)
        stats = over.agg(
            F.count(F.lit(1)).alias("clusters"), F.sum("_csz").alias("rows")
        ).collect()[0]
        if stats["clusters"]:
            log.warning(
                "semdedup: hash-split %d oversized clusters (> %d members, "
                "%d rows) into subclusters — near-dup pairs that straddle a "
                "subcluster boundary are NOT compared (recall-only loss)",
                stats["clusters"], max_cluster_size, stats["rows"],
            )
        # ≤ k rows — broadcast; _sub=0 for clusters under the cap
        va = (
            va.join(F.broadcast(over), "cluster", "left")
            .withColumn(
                "_sub",
                F.when(F.col("_csz").isNull(), F.lit(0)).otherwise(
                    F.pmod(
                        F.xxhash64("_id"),
                        F.ceil(F.col("_csz") / max_cluster_size).cast("long"),
                    ).cast("int")
                ),
            )
            .drop("_csz")
        )
        pair_key = ["cluster", "_sub"]
    x, y = va.alias("x"), va.alias("y")
    dropped = (
        x.join(y, pair_key)
        .filter(F.col("x._id") != F.col("y._id"))
        .filter(
            F.round(cosine(F.col("x._v"), F.col("y._v")), round_dp)
            >= F.lit(threshold)
        )
        .filter(
            (F.col("y.dist") < F.col("x.dist"))
            | (
                (F.col("y.dist") == F.col("x.dist"))
                & (F.col("y._id") < F.col("x._id"))
            )
        )
        .select(F.col("x._id").alias("_id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        va.join(dropped, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "cluster",
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("keep"),
        )
    )
