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


def hyperplane_candidate_pairs(
    vectors: DataFrame,
    dim: int,
    id_col: str = "id",
    vec_col: str = "vector",
    n_planes: int = 8,
    n_tables: int = 8,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Bucketed candidate generation for a similarity SELF-join:
    → (id_a, id_b) with id_a < id_b, distinct across tables.

    Each table hashes every vector to an ``n_planes``-bit
    random-hyperplane signature; only rows sharing a bucket in ≥1 table
    become candidates. Work is O(Σ bucket²) instead of the all-pairs
    O(n²) crossJoin — the scale path the reference gets from its FAISS
    index (src/dedup.py:152-166). Oversized buckets are dropped WITH a
    logged warning (no-silent-caps), same contract as minhash_lsh_pairs.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from k2_18_spark.operators.dedup import _cap_buckets

    # ALL tables' signatures in one vectorized pass: a numpy matmul
    # against the stacked (tables × planes, dim) plane matrix inside an
    # Arrow-batched pandas UDF. Column-expression hyperplane signatures
    # (n_tables × n_planes zip_with/aggregate trees over literal
    # arrays) choke janino codegen and fall back to per-element
    # interpretation — the matmul is both the fast AND the scalable
    # form. Candidate generation only needs internal consistency (both
    # sides of the self-join hash identically); every candidate is
    # exact-scored downstream, so this does not need to match
    # _rh_bucket bit-for-bit.
    flat = np.array(
        [
            row
            for t in range(n_tables)
            for row in _planes(dim, n_planes, seed=42 + 1000 * t)
        ]
    )  # (n_tables * n_planes, dim)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    def _buckets(vs):
        A = np.stack(vs.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (A @ flat.T) >= 0.0  # (n, T*P)
        bits = bits.reshape(len(A), n_tables, n_planes)
        return pd.Series(list(bits @ weights))  # (n, T) bucket ids

    # real annotation objects: `from __future__ import annotations` turns
    # inline hints into strings the UDF type inferrer cannot resolve
    _buckets.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    table_buckets = pandas_udf(_buckets, "array<long>")

    v = vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    b = v.select(
        "_id", F.posexplode(table_buckets(F.col("_v"))).alias("tbl", "bucket")
    )
    b = _cap_buckets(b, ["tbl", "bucket"], max_bucket_size, "hyperplane_pairs")
    return (
        b.alias("x")
        .join(b.alias("y"), ["tbl", "bucket"])
        .filter(F.col("x._id") < F.col("y._id"))
        .select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
        .distinct()
    )


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
