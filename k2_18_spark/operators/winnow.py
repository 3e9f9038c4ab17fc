"""Winnowing document fingerprints — the MOSS local-sampling scheme.

Schleimer, Wilkerson & Aiken (SIGMOD 2003): hash every character
k-gram, slide a window of w consecutive hashes, and in each window
keep the minimum (rightmost on ties); record each selected (position,
hash) once. The guarantee that makes this the plagiarism/mirror
detector of choice: any shared substring of length ≥ w + k − 1
between two documents shares at least one selected fingerprint —
position-robust where MinHash shingles are whole-document and
SimHash is global. Density is ~2/(w+1) of all k-grams, so the
fingerprint set is a tunable-size sample.

Deterministic semantics (DuckDB-replayable):
- normalization: lowercase, every whitespace run collapsed to one
  space, trimmed (so formatting changes don't break matches);
- k-gram hash = md5 hex of the k-char substring (a STRING — only an
  ordering is needed, so no numeric conversion);
- window i (0-based) covers hash positions i..i+w−1; the selected
  entry is the minimum by (hash ASC, position DESC) — the rightmost
  minimal hash, the paper's tie rule;
- selections are deduplicated per (position, hash).

Scale shape: one row per k-gram (|chars| rows — the same explode
budget as the n-gram passes in operators/gopher.py) and ONE doc_id
shuffle whose sliding ROWS frame [−(w−1), 0] computes every window's
rightmost-min in a single sort — NOT an array-HOF formulation, which
Catalyst turns into O(n²·w) md5 re-evaluations per doc (element_at
over a transform-built array re-evaluates the array per access;
measured >10 min for 500 docs before the rewrite, 6 s after).
``shared_fingerprint_pairs`` then does ONE map-side-combinable
groupBy(hash) with the house ``max_bucket_size`` cap + logged drops
(the LSH-bucket idiom from operators/dedup.py) and counts shared
fingerprints per pair.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def _norm(text_col: str) -> Column:
    return F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, pos, fp): selected winnowing fingerprints. Docs shorter
    than w + k − 1 normalized chars yield no rows."""
    from pyspark.sql import Window

    t = _norm(text_col)
    # one row per k-gram — an array-HOF formulation (element_at over a
    # transform-built hash array) is a codegen trap: Catalyst re-
    # evaluates the array expression per access, going O(n²·w) md5
    # calls per doc (measured: 500 docs > 10 min). The explode +
    # sliding-frame form below is one md5 per gram and ONE doc_id
    # shuffle for the window.
    grams = (
        docs.select(F.col(id_col).alias("_id"), t.alias("_nt"))
        .select(
            "_id",
            "_nt",
            F.posexplode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.length("_nt") - k + 1, F.lit(0)),
                )
            ).alias("_ix", "i"),
        )
        .select(
            "_id",
            (F.col("i") - 1).cast("long").alias("pos"),
            F.md5(F.col("_nt").substr(F.col("i"), F.lit(k))).alias("fp"),
        )
    )
    # window s ends at hash position e = s + w − 1: the frame
    # [e−w+1, e] argmin by (fp ASC, pos DESC) is exactly the
    # rightmost-min pick of that window; positions < w−1 have no full
    # window ending there
    wspec = (
        Window.partitionBy("_id")
        .orderBy("pos")
        .rowsBetween(-(w - 1), 0)
    )
    picked = (
        grams.select(
            "_id",
            "pos",
            F.min(
                F.struct(
                    F.col("fp").alias("fp"),
                    (-F.col("pos")).alias("negpos"),
                )
            )
            .over(wspec)
            .alias("m"),
        )
        .filter(F.col("pos") >= w - 1)
        .select(
            "_id",
            (-F.col("m.negpos")).cast("long").alias("pos"),
            F.col("m.fp").alias("fp"),
        )
        .distinct()
    )
    return picked.withColumnRenamed("_id", id_col)


def shared_fingerprint_pairs(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_bucket_size: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id_a, id_b, shared): doc pairs sharing ≥ ``min_shared``
    distinct fingerprints. Fingerprints shared by more than
    ``max_bucket_size`` docs are dropped with a logged count (hub
    n-grams — boilerplate — would otherwise explode the pair join,
    the LSH-bucket guard)."""
    fps = winnow_fingerprints(docs, k, w, id_col, text_col).select(
        F.col(id_col).alias("_id"), "fp"
    ).distinct()
    sizes = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    dropped = sizes.filter(F.col("n") > max_bucket_size).count()
    if dropped:
        log.warning(
            "shared_fingerprint_pairs: dropping %d fingerprints shared by "
            "more than %d docs (their pairs lose those matches)",
            dropped,
            max_bucket_size,
        )
    kept = fps.join(
        sizes.filter(F.col("n") <= max_bucket_size).select("fp"), "fp"
    )
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
