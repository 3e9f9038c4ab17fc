"""Corpus-trained unigram LM scoring — the CCNet quality signal.

CCNet (Wenzek et al. 2020) ranks Common-Crawl documents by language-
model perplexity and keeps the head/middle/tail buckets; Brown et al.
2020 (GPT-3) used the same shape as a quality classifier feature. The
full pipeline uses a KenLM 5-gram model (not installable here); the
distributed shape — train token statistics over the corpus, score
every document by mean negative log-probability, bucket per language
— is model-order independent, so this module implements the unigram
case end-to-end with exact semantics both engines can replay.

Tokenization: ``[a-z0-9]+`` runs of the lowercased text (both Spark
``regexp_extract_all`` and DuckDB agree on this class byte-for-byte).

Training (``train_unigram``): token → count over the whole corpus,
``logp = ln(count / total)`` (MLE). Scoring (``lm_score``): per doc,
``avg_neg_logp = −Σ logp(tok) / n_tokens`` counting multiplicity;
out-of-vocabulary tokens contribute ``unk_logp`` (default
``ln(1/(total + vocab))``, an add-one floor). ``perplexity =
exp(avg_neg_logp)``. ``ppl_bucket`` (optional, when ``n_buckets``):
CCNet's per-language terciles via ``ntile`` ordered by (rounded
score, id) — the id tie-break makes bucketing deterministic.

Scale shape: training is one explode (|corpus tokens| rows) + one
map-side-combinable groupBy(token) — exactly the word-count shape
Spark was built for; the model table is O(vocab). Scoring re-explodes
and joins tokens→model: Catalyst broadcasts the model when vocab is
small (the usual case — web vocab grows ~O(corpus^0.5), Heaps' law),
else shuffle-hash on the token key; the per-doc rollup then shuffles
|tokens| rows once on doc_id. Zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) with multiplicity — [a-z0-9]+ runs of lower(text)."""
    return docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0
            )
        ).alias("token"),
    )


def train_unigram(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unigram model → (token, count, logp) with logp = ln(count/total).

    The total is attached via a 1-row cross join (no driver action,
    no second pass)."""
    counts = (
        _tokens(docs, id_col, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    total = counts.agg(
        F.sum("count").alias("_total"), F.count(F.lit(1)).alias("_vocab")
    )
    return counts.crossJoin(F.broadcast(total)).select(
        "token",
        "count",
        F.log(F.col("count") / F.col("_total")).alias("logp"),
        "_total",
        "_vocab",
    )


def lm_score(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = None,
    n_buckets: int | None = None,
    unk_logp: float | None = None,
) -> DataFrame:
    """Score docs → (id[, lang], n_tokens, avg_neg_logp, perplexity
    [, ppl_bucket]).

    ``avg_neg_logp`` and ``perplexity`` are rounded to 6 decimals
    (perplexity computed FROM the rounded average, so both engines
    exponentiate identical doubles). Docs with zero tokens score 0.
    """
    toks = _tokens(docs, id_col, text_col)
    # totals ride in as a broadcast 1-row cross join, NOT from the
    # left-joined model columns — an OOV token's join miss would NULL
    # them and the unk term would silently drop out of the average
    totals = model.select("_total", "_vocab").limit(1)
    joined = toks.crossJoin(F.broadcast(totals)).join(
        model.select("token", "logp"), "token", "left"
    )
    unk = (
        F.lit(float(unk_logp))
        if unk_logp is not None
        else -F.log(F.col("_total") + F.col("_vocab"))
    )
    per_doc = joined.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            -F.avg(F.coalesce(F.col("logp"), unk)), 6
        ).alias("avg_neg_logp"),
    )
    extra = [F.col(lang_col)] if lang_col else []
    out = (
        docs.select(F.col(id_col).alias("_id"), *extra)
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            *([F.col(lang_col)] if lang_col else []),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("avg_neg_logp", F.lit(0.0)).alias("avg_neg_logp"),
            F.round(
                F.exp(F.coalesce("avg_neg_logp", F.lit(0.0))), 6
            ).alias("perplexity"),
        )
    )
    if n_buckets:
        part = [lang_col] if lang_col else []
        w = Window.partitionBy(*part).orderBy("avg_neg_logp", id_col)
        out = out.withColumn("ppl_bucket", F.ntile(n_buckets).over(w))
    return out
