"""Deduplication operators over a documents table.

The reference dedups graph nodes by embedding similarity + union-find
(src/dedup.py:169-281); at training-data scale the same shapes appear
as: exact dedup, MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup. All are DataFrame-only; near-dup clustering
reuses the connected-components superstep as distributed union-find
(SURVEY.md G11).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

log = logging.getLogger(__name__)


def _cap_buckets(
    keyed: DataFrame, key_cols: list[str], max_bucket_size: int | None, what: str
) -> DataFrame:
    """Drop candidate buckets larger than ``max_bucket_size``.

    A degenerate bucket (boilerplate/identical docs) makes the bucket
    self-join quadratic; capping bounds the worst case. NOT silent: the
    dropped bucket count and row count are computed eagerly and logged
    (no-silent-caps rule). ``None`` disables the cap."""
    if max_bucket_size is None:
        return keyed
    sizes = keyed.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_bsz"))
    dropped = sizes.filter(F.col("_bsz") > max_bucket_size)
    stats = dropped.agg(
        F.count(F.lit(1)).alias("buckets"), F.sum("_bsz").alias("rows")
    ).collect()[0]
    if stats["buckets"]:
        log.warning(
            "%s: dropped %d oversized buckets (> %d members, %d rows) from "
            "candidate generation — pairs inside them are NOT reported",
            what, stats["buckets"], max_bucket_size, stats["rows"],
        )
    return keyed.join(
        F.broadcast(dropped.select(*key_cols)), key_cols, "left_anti"
    )

# -- exact ---------------------------------------------------------------


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: every doc mapped to the master
    (min doc_id) of its normalized-text group.
    → (doc_id, master_id, group_size); only rows in groups of ≥2."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    keyed = docs.select("doc_id", F.md5(norm).alias("key"))
    w = Window.partitionBy("key")
    return (
        keyed.withColumn("master_id", F.min("doc_id").over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .filter(F.col("group_size") >= 2)
        .select("doc_id", "master_id", F.col("group_size").cast("long"))
    )


# -- shingling / n-gram Jaccard ------------------------------------------


def _shingles(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of the lowercased text.

    r6: built as a zip_with concat chain — the old form sliced the
    token array inside a transform lambda, and a non-attribute array
    referenced in a lambda re-evaluates PER ELEMENT (the whole
    split+regexp chain ran once per gram). zip_with arguments evaluate
    once per row. concat_ws SKIPS the null padding of the shorter
    shifted side, which exactly reproduces the old partial tail gram
    for docs shorter than ``n`` tokens (the slice below keeps index 0
    in that case, the join of all tokens)."""
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    chain = toks
    for k in range(1, n):
        shifted = F.slice(
            toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0))
        )
        chain = F.zip_with(
            chain, shifted, lambda g, x: F.concat_ws(" ", g, x)
        )
    ngrams = F.slice(
        chain, 1, F.greatest(F.size(toks) - n, F.lit(0)) + 1
    )
    return F.array_distinct(ngrams)


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    block_col: str | None = "source",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    Pairs are blocked by ``block_col`` (e.g. source/domain) to bound
    the quadratic term — the scale path replaces blocking with MinHash
    LSH buckets (minhash_lsh_pairs) and uses this only to verify.
    → (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ threshold.
    """
    sh = docs.select(
        "doc_id", *( [block_col] if block_col else [] ), _shingles(text_col, n).alias("sh")
    )
    join_keys = [block_col] if block_col else []
    a = sh.select(
        *join_keys, F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
    )
    b = sh.select(
        *join_keys, F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
    )
    pairs = a.join(b, join_keys) if join_keys else a.crossJoin(b)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# -- MinHash + LSH ---------------------------------------------------------

# 2^31-1: keeps (h % p) * a + b < 2^62 — no int64 overflow under Spark's
# ANSI mode (h, a, b all < p).
_MERSENNE = (1 << 31) - 1


def token_hash64(col, token_hash: str = "xxhash64"):
    """64-bit-ish hash of a string column under a named scheme.

    ``xxhash64``: Spark's native JVM hash — the fast default.
    ``md5_60``: first 60 bits of md5 as a long — slower, but exactly
    reproducible in ANSI SQL (DuckDB: CAST(CONCAT('0x',
    substr(md5(s),1,15)) AS BIGINT)), which lets the driver's oracle
    replay MinHash/SimHash signatures bit-for-bit."""
    if token_hash == "xxhash64":
        return F.xxhash64(col)
    if token_hash == "md5_60":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown token_hash {token_hash!r}")


def minhash_coefficients(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic affine-permutation coefficients from a fixed LCG —
    public so SQL oracles can embed the identical constants."""
    rng_a, rng_b = [], []
    state = 42
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        rng_a.append(state % (_MERSENNE - 1) + 1)
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        rng_b.append(state % _MERSENNE)
    return rng_a, rng_b


def minhash_signature(
    docs: DataFrame,
    num_hashes: int = 32,
    n: int = 3,
    text_col: str = "text",
    token_hash: str = "xxhash64",
) -> DataFrame:
    """k-permutation MinHash over word-n-gram shingles.
    → (doc_id, sig array<long>). Deterministic seeded affine hashes of
    hash(shingle) modulo a Mersenne prime."""
    # explode → groupBy(min × k): ONE pass over the shingle rows with
    # map-side partial aggregation, instead of k array traversals per doc
    # (the old transform/array_min expression tree was the bench hotspot)
    sh = docs.select("doc_id", F.explode(_shingles(text_col, n)).alias("s"))
    h = F.pmod(token_hash64(F.col("s"), token_hash), F.lit(_MERSENNE))
    rng_a, rng_b = minhash_coefficients(num_hashes)
    mins = [
        F.min((h * F.lit(a) + F.lit(b)) % F.lit(_MERSENNE)).alias(f"_m{i}")
        for i, (a, b) in enumerate(zip(rng_a, rng_b))
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    sig = F.array(*[F.col(f"_m{i}") for i in range(num_hashes)])
    return agg.select("doc_id", sig.alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    max_bucket_size: int | None = None,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """Banded-LSH candidate generation + exact Jaccard verification.

    shingle → minhash → band → bucket-join → verify. The band
    bucket-join replaces the quadratic all-pairs comparison; candidates
    are verified with exact shingle Jaccard so the output is exact
    above ``threshold`` (up to LSH recall).
    → (doc_a, doc_b, jaccard)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signature(
        docs, num_hashes=num_hashes, n=n, text_col=text_col, token_hash=token_hash
    )
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[i * rows_per_band + j]
                                    for j in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    banded = _cap_buckets(banded, ["band", "bucket"], max_bucket_size, "minhash_lsh")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sh = docs.select("doc_id", _shingles(text_col, n).alias("sh"))
    verified = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


# -- SimHash ---------------------------------------------------------------


def simhash(
    docs: DataFrame,
    bits: int = 64,
    text_col: str = "text",
    token_hash: str = "xxhash64",
) -> DataFrame:
    """``bits``-bit SimHash over word tokens: sign-sum of per-token hash
    bits. → (doc_id, simhash long). Use bits ≤ 60 with
    ``token_hash="md5_60"`` (the hash only carries 60 bits).

    explode → groupBy with ``bits`` sum aggregates: one pass over the
    token rows with map-side partial aggregation (the old per-row
    F.aggregate fold walked every token array ``bits`` times)."""
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    # explode_outer keeps null-text docs (they hash to simhash 0, as before)
    tok = docs.select("doc_id", F.explode_outer(toks).alias("t"))
    h = token_hash64(F.col("t"), token_hash)
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_v{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sh = None
    for i in range(bits):
        b = F.when(F.col(f"_v{i}") > 0, F.lit(1).cast("long")).otherwise(0)
        term = F.shiftleft(b, i)
        sh = term if sh is None else sh.bitwiseOR(term)
    return agg.select("doc_id", sh.alias("simhash"))


def simhash_near_duplicates(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    max_bucket_size: int | None = None,
    bits: int = 64,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate generation blocks on ``max_hamming + 1`` contiguous bit
    chunks — by pigeonhole, any pair with ≤ max_hamming differing bits
    out of ``bits`` shares at least one exact chunk — then verifies
    with bit_count(xor). Chunk count is DERIVED from the threshold so
    recall is complete whenever each chunk keeps ≥ 2 bits.
    → (doc_a, doc_b, hamming)."""
    n_chunks = max_hamming + 1
    if n_chunks > bits // 2:
        raise ValueError(
            f"max_hamming must be <= {bits // 2 - 1} for {bits}-bit chunk blocking"
        )
    base, rem = divmod(bits, n_chunks)
    widths = [base + 1] * rem + [base] * (n_chunks - rem)
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    sh = simhash(docs, bits=bits, text_col=text_col, token_hash=token_hash)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        # mask after the arithmetic shift — kills the sign
                        # extension on the top chunk (bit 63 set ⇒ negative)
                        F.shiftright("simhash", offsets[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("val"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk", "cc.val")
    chunks = _cap_buckets(chunks, ["chunk", "val"], max_bucket_size, "simhash")
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), ["chunk", "val"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("sh_a"),
            F.col("y.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# -- embedding cosine near-dup ----------------------------------------------


def cosine(a, b) -> F.Column:
    """Cosine similarity of two array<float/double> columns — pure
    built-ins (zip_with dot / norms), reference semantics
    src/utils/llm_embeddings.py:387-402."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.85,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (reference dedup threshold 0.85,
    src/config.toml:99). Brute-force within optional blocks; the scale
    path is LSH bucketing (operators/similarity.py).
    → (doc_a, doc_b, cos_sim)."""
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")] + (
        [F.col(block_col).alias("blk")] if block_col else []
    )
    e = embeddings.select(*cols)
    keys = ["blk"] if block_col else []
    a = e.select(*keys, F.col("id").alias("doc_a"), F.col("v").alias("va"))
    b = e.select(*keys, F.col("id").alias("doc_b"), F.col("v").alias("vb"))
    pairs = a.join(b, keys) if keys else a.crossJoin(b)
    return (
        pairs.filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# -- clustering (union-find as connected components) -------------------------


def duplicate_clusters(
    spark: SparkSession, pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """Cluster duplicate pairs and pick the master = min id per cluster
    (reference union-find with min-master, src/dedup.py:231-281) —
    reuses the connected-components superstep (SURVEY.md G11).
    → (doc_id, master_id)."""
    from k2_18_spark.graph.components import connected_components

    edges = pairs.select(
        F.col(a_col).cast("string").alias("src_id"),
        F.col(b_col).cast("string").alias("dst_id"),
    )
    comp = connected_components(spark, edges)
    w = Window.partitionBy("component_id")
    return comp.select(
        F.col("id").alias("doc_id"),
        F.min("id").over(w).alias("master_id"),
    )
