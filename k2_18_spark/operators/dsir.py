"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): pick pretraining documents from a raw pool so the
selected set's hashed-n-gram distribution matches a small target
corpus (e.g. Wikipedia+books). The published pipeline is (1) featurize
every document as hashed n-gram counts, (2) fit two bag-of-ngrams
unigram models — target and raw — over the hashed buckets, (3) weight
each pool document by the log importance ratio
``Σ_gram cnt·(ln p_target(bucket) − ln p_raw(bucket))``, (4) resample
without replacement with probability ∝ the importance weight.

The reference engine has no data-selection stage (its corpus is a
fixed textbook, `src/utils/config.py`); this is a scale-path operator
for the 100 TB training-data pipeline the north rule targets.

Determinism contract (house style — every stochastic choice is
hash-derived, never RNG-state-derived):

- bucket(gram) = the top 60 bits of ``md5(gram)`` mod ``buckets`` —
  reproducible in any engine with md5 (the DuckDB oracle re-derives
  it bit-for-bit);
- resampling uses the Gumbel-top-k trick entirely in LOG space
  (Vieira 2014; Kool et al. ICML 2019): ``key = log_w − ln(−ln(u))``
  with ``u`` the md5-derived uniform in (0, 1], take the k largest —
  distributed as sampling without replacement ∝ ``exp(log_w)``, with
  no ``exp`` overflow for extreme weights and no RNG state.

Tokenization is the house ``[a-z0-9]+`` class over ``lower(text)``
(`operators/lmscore.py` — Spark and DuckDB agree byte-for-byte).

Scale shape: featurization is ONE explode of the n-gram stream + ONE
map-side-combinable (doc, bucket) groupBy — the word-count shape. Both
LMs are complete ``buckets``-row tables (buckets is a few thousand),
so the scoring joins are broadcasts; the per-doc rollup shuffles the
(doc, bucket) count table once on doc_id. Selection is one global
top-k window (rank truncation → per-partition top-k heap via Spark's
WindowGroupLimit). Zero Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ngram_rows(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(_id, gram) with multiplicity: space-joined runs of ``n``
    consecutive ``[a-z0-9]+`` tokens of the lowercased text.

    r6: grams build as zip_with concat chains — one string concat per
    position per level instead of the old per-position O(n) slice +
    array_join (higher-order functions evaluate interpreted, so the
    per-element constant factor dominates). zip_with pads the shorter
    shifted side with NULL and concat propagates it; the valid prefix
    is sliced off. Each intermediate is a named column so nothing
    re-evaluates per element (CollapseProject keeps multiply-referenced
    non-cheap producers staged)."""
    staged = docs.select(
        F.col(id_col).alias("_id"),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0
        ).alias("_toks"),
    )
    prev = "_toks"
    for k in range(1, n):
        shifted = F.slice(
            F.col("_toks"),
            k + 1,
            F.greatest(F.size("_toks") - k, F.lit(0)),
        )
        staged = staged.select(
            "*",
            F.zip_with(
                F.col(prev), shifted,
                lambda g, x: F.concat(g, F.lit(" "), x),
            ).alias(f"_raw{k + 1}"),
        )
        prev = f"_raw{k + 1}"
    grams = F.when(
        F.size("_toks") >= n,
        F.slice(F.col(prev), 1, F.size("_toks") - n + 1),
    ).otherwise(F.array().cast("array<string>"))
    return staged.select("_id", F.explode(grams).alias("gram"))


def _bucket(col, buckets: int):
    """Top 60 bits of md5, mod buckets — engine-portable hashing."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long"),
        F.lit(buckets),
    )


def hashed_ngram_counts(
    docs: DataFrame,
    n: int = 2,
    buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document hashed n-gram histogram → (id_col, bucket, cnt)."""
    rows = _ngram_rows(docs, n, id_col, text_col)
    return (
        rows.select("_id", _bucket(F.col("gram"), buckets).alias("bucket"))
        .groupBy("_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumnRenamed("_id", id_col)
    )


def _lm_from_bucket_counts(
    spark, counts: DataFrame, buckets: int, alpha: float
) -> DataFrame:
    """(bucket, c) occurrence counts → complete (bucket, logp) table
    of exactly ``buckets`` rows; logp = ln((c_b + α) / (T + α·B))."""
    full = spark.range(buckets).select(F.col("id").alias("bucket"))
    totals = counts.agg(F.sum("c").alias("t"))
    return (
        full.join(counts, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("t"), F.lit(0)) + F.lit(alpha * buckets))
            ).alias("logp"),
        )
    )


def train_hashed_lm(
    docs: DataFrame,
    n: int = 2,
    buckets: int = 4096,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Add-α-smoothed bag-of-ngrams model over the hashed buckets →
    a COMPLETE (bucket, logp) table of exactly ``buckets`` rows
    (unseen buckets carry the smoothing floor), so downstream joins
    never need an outer side. logp = ln((c_b + α) / (T + α·B))."""
    counts = (
        _ngram_rows(docs, n, id_col, text_col)
        .select(_bucket(F.col("gram"), buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _lm_from_bucket_counts(docs.sparkSession, counts, buckets, alpha)


def dsir_scores(
    docs: DataFrame,
    target_docs: DataFrame,
    n: int = 2,
    buckets: int = 4096,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Log importance weight of every pool document against the
    target distribution → (id_col, n_ngrams, log_w), log_w rounded at
    6 decimals (the house oracle contract). Documents with no n-gram
    (shorter than n tokens) carry log_w = 0 and survive to sampling
    with neutral weight."""
    tgt = train_hashed_lm(
        target_docs, n, buckets, alpha, id_col, text_col
    ).withColumnRenamed("logp", "lp_t")
    # NOTE (r6): deriving the raw LM from a persisted copy of `cnts`
    # was tried and measured SLOWER at the bench scale — caching the
    # ~|docs|·|grams/doc| (doc, bucket) table costs more than the slim
    # column-pruned second explode it saves. Kept as two passes.
    raw = train_hashed_lm(
        docs, n, buckets, alpha, id_col, text_col
    ).withColumnRenamed("logp", "lp_r")
    cnts = hashed_ngram_counts(docs, n, buckets, id_col, text_col)
    per_doc = (
        cnts.join(F.broadcast(tgt), "bucket")
        .join(F.broadcast(raw), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_ngrams"),
            F.sum(
                F.col("cnt") * (F.col("lp_t") - F.col("lp_r"))
            ).alias("w"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_ngrams"), F.lit(0)).alias("n_ngrams"),
            F.round(F.coalesce(F.col("w"), F.lit(0.0)), 6).alias("log_w"),
        )
    )


def dsir_sample(
    scored: DataFrame,
    k: int,
    seed: str = "dsir",
    id_col: str = "doc_id",
    weight_col: str = "log_w",
) -> DataFrame:
    """Deterministic importance resampling without replacement ∝
    exp(weight_col), via Gumbel-top-k in log space: per-row key =
    ``weight + g`` with Gumbel noise ``g = −ln(−ln(u))`` derived from
    ``md5(seed | id)``; the k largest keys win (id tie-break). Adds a
    ``priority`` column (the key, rounded 6dp) for verifiability."""
    h = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    u = (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("double") + 1.0
    ) / float(1 << 60)
    key = F.col(weight_col) - F.log(-F.log(u))
    w = Window.partitionBy(F.lit(1)).orderBy(
        key.desc(), F.col(id_col)
    )
    return (
        scored.withColumn("_key", key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            *scored.columns, F.round(F.col("_key"), 6).alias("priority")
        )
    )
