"""TF-IDF statistics and BM25 scoring — retrieval-style ranking over
the corpus.

The standard lexical relevance stack (Robertson & Zaragoza 2009, the
BM25 Okapi form) used in training-data curation to rank corpus
documents against a probe query set ("how GPT-3-like is this page"),
build seed sets for classifier-based filtering (Brown et al. 2020),
and as the baseline retrieval layer next to the embedding ANN
operators (``operators/similarity.py``).

Deterministic semantics (DuckDB-replayable):
- tokens: ``[a-z0-9]+`` runs of ``lower(text)`` (the house
  tokenization — lmscore/bpe share it);
- ``df(t)`` = number of docs containing t; ``idf(t) = ln(1 + (N − df
  + 0.5)/(df + 0.5))`` (the non-negative BM25+ variant Lucene uses);
- ``bm25(d, q) = Σ_{t∈q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b +
  b·|d|/avgdl))`` with the standard k1=1.2, b=0.75;
- rounding at 6 decimals on the emitted scores.

Scale shape: ONE token explode + ONE map-side-combinable
groupBy(doc, token) for term frequencies; the document-frequency /
idf table is O(vocab) and joins back on the token key (broadcast when
small — Heaps' law — else shuffle-hash); scoring against a query
explodes only the query's terms (a semi-join keyed by token), so a
10-term query against 10^12 docs touches the posting rows of those
10 terms, not the corpus; the per-doc score rollup is one groupBy.
Everything codegen — no Python UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0
            )
        ).alias("token"),
    )


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (id, token, tf) with per-doc term counts."""
    return (
        _tokens(docs, id_col, text_col)
        .groupBy("_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumnRenamed("_id", id_col)
    )


def idf_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (token, df, idf): Lucene-style non-negative BM25 idf."""
    tf = term_frequencies(docs, id_col, text_col)
    n_docs = docs.select(F.count(F.lit(1)).alias("_n"))
    return (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            "df",
            F.log(
                F.lit(1.0)
                + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )


def bm25_score(
    docs: DataFrame,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, bm25, n_hit_terms): every doc scored against ``query``
    (docs sharing no query term score 0 with 0 hits).

    The idf/avgdl statistics are computed from ``docs`` itself (the
    self-corpus convention; pass a pre-filtered corpus to rank a
    subset against global stats).
    """
    q_terms = sorted(set(re.findall("[a-z0-9]+", query.lower())))
    tf = term_frequencies(docs, id_col, text_col)
    idf = idf_table(docs, id_col, text_col).filter(
        F.col("token").isin(q_terms)
    )
    dl = (
        _tokens(docs, id_col, text_col)
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("dl"))
    )
    avgdl = dl.select(F.avg("dl").alias("_avgdl"))
    hits = (
        tf.filter(F.col("token").isin(q_terms))
        .join(F.broadcast(idf), "token")
        .join(dl.withColumnRenamed("_id", id_col), id_col)
        .crossJoin(F.broadcast(avgdl))
        .select(
            id_col,
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1
                    * (
                        1
                        - b
                        + b * F.col("dl") / F.col("_avgdl")
                    )
                )
            ).alias("contrib"),
        )
        .groupBy(id_col)
        .agg(
            F.round(F.sum("contrib"), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_hit_terms"),
        )
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("bm25", F.lit(0.0)).alias("bm25"),
            F.coalesce("n_hit_terms", F.lit(0)).cast("long").alias(
                "n_hit_terms"
            ),
        )
    )
