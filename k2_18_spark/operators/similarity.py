"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k (broadcast query set — the classic
small-dim × huge-corpus shape). Scale path: random-hyperplane LSH
bucketing that prunes the candidate set before exact re-scoring
(stand-in for the reference's FAISS HNSW index, src/dedup.py:152-166,
which has no distributed equivalent)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from k2_18_spark.operators.dedup import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: corpus × broadcast(queries).
    → (query_id, vec_id, cos_sim, rank)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("cv"), F.col("qv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", F.col("rank").cast("int"))
    )


def _rh_bucket(vec, planes: list[list[float]]) -> F.Column:
    """Random-hyperplane signature: one bit per plane (sign of dot)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in p]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseOR(
            F.shiftleft(F.when(dot >= 0, F.lit(1).cast("long")).otherwise(0), i)
        )
    return bucket


def _planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG-seeded, no numpy
    RNG state dependence)."""
    out = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        out.append(row)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH candidate
    generation + exact cosine re-scoring of candidates only.

    At 100 TB the crossJoin in brute_force_topk is O(|corpus|·|Q|);
    here each query only scores corpus rows sharing a bucket in ≥1 of
    ``n_tables`` tables (tunable recall/cost).
    → (query_id, vec_id, cos_sim, rank) — rank within retrieved set."""
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cand = None
    for t in range(n_tables):
        planes = _planes(dim, n_planes, seed=42 + 1000 * t)
        cb = c.select("vec_id", _rh_bucket(F.col("cv"), planes).alias("bucket"))
        qb = q.select("query_id", _rh_bucket(F.col("qv"), planes).alias("bucket"))
        pairs = cb.join(qb, "bucket").select("query_id", "vec_id")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.distinct()
    scored = (
        cand.join(c, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("cv"), F.col("qv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", F.col("rank").cast("int"))
    )
