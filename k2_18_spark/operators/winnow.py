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


def _doc_fingerprints(text: str, k: int, w: int) -> list:
    """Pure-Python winnowing of one normalized document — the same
    (hash ASC, position DESC) rightmost-min pick per window, deduped
    per (pos, fp). md5 is md5 in every engine, so the fingerprints are
    bit-identical to the old JVM formulation."""
    import hashlib
    import re

    nt = re.sub(r"\s+", " ", (text or "").lower(), flags=re.ASCII).strip(" ")
    n = len(nt) - k + 1
    if n < w:
        return []
    h = [
        hashlib.md5(nt[i : i + k].encode("utf-8")).hexdigest()
        for i in range(n)
    ]
    out = set()
    for e in range(w - 1, n):
        best_p = e
        best = h[e]
        for p in range(e - 1, e - w, -1):
            if h[p] < best:
                best, best_p = h[p], p
        out.add((best_p, best))
    return sorted(out)


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, pos, fp): selected winnowing fingerprints. Docs shorter
    than w + k − 1 normalized chars yield no rows.

    r6 rework (guide §2.4 + §4.2): the whole selection is per-document,
    so no shuffle is fundamentally required — the r5 plan exploded one
    row per k-gram (~|chars| rows, 653 MB shuffle at the sf0.1 bench),
    paid a per-doc sort for the sliding-frame window and a second
    exchange for the distinct. Now ONE Arrow-batched mapInPandas pass
    computes each document's fingerprints in CPython (hashlib.md5 —
    identical hex — plus an O(n·w) sliding min), shuffling nothing.
    Trade-off: a giant document's grams land on one task — bounded by
    max doc length, as in operators/gopher.py."""
    from typing import Iterator

    id_decl = f"`{id_col}` {docs.schema[id_col].dataType.simpleString()}"
    schema = f"{id_decl}, pos bigint, fp string"

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, poss, fps = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for pos, fp in _doc_fingerprints(text, k, w):
                    ids.append(did)
                    poss.append(pos)
                    fps.append(fp)
            yield pd.DataFrame({id_col: ids, "pos": poss, "fp": fps})

    return docs.select(id_col, text_col).mapInPandas(fn, schema)


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
