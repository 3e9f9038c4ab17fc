"""Cross-document substring deduplication — the Lee et al. 2021 pass.

"Deduplicating Training Data Makes Language Models Better" (Lee et
al. 2021) removes every substring of ≥ 50 tokens that appears more
than once ANYWHERE in the corpus (their ExactSubstr dedup). The
published implementation builds a monolithic suffix array — inherently
single-machine. The distributed re-expression here works on token
WINDOWS: a duplicated substring of length ≥ L contains (and is
covered by) duplicated L-token windows, so marking every token that
lies inside a window whose fingerprint occurs elsewhere in the corpus
removes exactly the ≥L-token duplicated spans (plus nothing else,
modulo md5 collisions at ~2^-64):

1. tokenize (``\\s+`` split, positions kept);
2. slide an L-token window over every doc (posexplode of the token
   array — |tokens| rows);
3. fingerprint each window with md5 over the joined tokens;
4. ONE map-side-combinable groupBy(fingerprint) marks fingerprints
   with corpus count > 1 (``keep_first`` retains the canonical
   minimum (doc, pos) occurrence, like the paper's variant that
   keeps one copy);
5. tokens covered by any duplicated window are dropped; survivors
   reassemble in order.

Scale shape: the explode is |corpus tokens| rows (each token appears
in ≤ L windows but windows are emitted once per START, so the window
table is exactly |tokens| rows); the fingerprint groupBy is the
word-count shape with map-side combine (duplicated windows collapse
before the shuffle — at 100 TB the whole premise is that duplication
is common); the mark-back join is shuffle-hash on the fingerprint
key; the final rebuild is one groupBy(doc). Everything codegen — no
Python UDFs, no suffix array, no driver state.

Output column semantics: ``text_dedup`` (surviving tokens joined by
single spaces — whitespace is normalized, the same contract as the
paper's token-level output), ``n_tokens`` / ``n_tokens_dropped``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicated_windows(
    docs: DataFrame,
    window_tokens: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Profiling pass → (fingerprint, n_occurrences, first_doc,
    first_pos): every L-token window fingerprint seen ≥ 2 times."""
    w = _windows(docs, window_tokens, id_col, text_col)
    return (
        w.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(F.struct("_id", "pos")).alias("first"),
        )
        .filter(F.col("n_occurrences") > 1)
        .select(
            F.col("fp").alias("fingerprint"),
            "n_occurrences",
            F.col("first._id").alias("first_doc"),
            F.col("first.pos").alias("first_pos"),
        )
    )


def _windows(docs, window_tokens, id_col, text_col):
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.filter(
            F.split(F.trim(F.col(text_col)), "\\s+"), lambda t: t != ""
        ).alias("w"),
    )
    return (
        toks.select(
            "_id",
            F.posexplode(
                F.when(
                    F.size("w") >= window_tokens,
                    F.transform(
                        F.sequence(
                            F.lit(0), F.size("w") - window_tokens
                        ),
                        lambda i: F.md5(
                            F.array_join(
                                F.slice("w", i + 1, window_tokens), " "
                            )
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("pos", "fp"),
        )
    )


def dedup_substrings(
    docs: DataFrame,
    window_tokens: int = 50,
    keep_first: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, text_dedup, n_tokens, n_tokens_dropped).

    Tokens covered by a corpus-duplicated L-token window are removed;
    with ``keep_first`` the canonical occurrence (minimum (doc, pos)
    window start per fingerprint) keeps its tokens.
    """
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.filter(
            F.split(F.trim(F.col(text_col)), "\\s+"), lambda t: t != ""
        ).alias("w"),
    )
    wins = _windows(docs, window_tokens, id_col, text_col)
    freq = wins.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.struct("_id", "pos")).alias("first"),
    )
    dup = wins.join(freq.filter(F.col("n") > 1), "fp")
    if keep_first:
        dup = dup.filter(
            F.struct("_id", "pos") != F.col("first")
        )
    # covered token ranges per doc: [pos, pos + L - 1] — merge via a
    # per-doc sorted interval fold (array_sort of starts, then one
    # aggregate pass), all codegen
    spans = dup.groupBy("_id").agg(
        F.array_sort(F.collect_list("pos")).alias("starts")
    )
    # token index t (0-based) is dropped iff some duplicated window
    # start s satisfies s ≤ t ≤ s + L − 1 — the (element, index)
    # transform form pairs each token with its position, survivors
    # keep document order
    kept = F.transform(
        F.filter(
            F.transform(
                F.col("w"),
                lambda tok, t: F.struct(
                    tok.alias("tok"),
                    F.exists(
                        F.col("starts"),
                        lambda s: (s <= t)
                        & (t <= s + window_tokens - 1),
                    ).alias("covered"),
                ),
            ),
            lambda st: ~st["covered"],
        ),
        lambda st: st["tok"],
    )
    return (
        toks.join(spans, "_id", "left")
        .withColumn(
            "starts",
            F.coalesce("starts", F.array().cast("array<int>")),
        )
        .withColumn("kept", kept)
        .select(
            F.col("_id").alias(id_col),
            F.array_join("kept", " ").alias("text_dedup"),
            F.size("w").cast("long").alias("n_tokens"),
            (F.size("w") - F.size("kept")).cast("long").alias(
                "n_tokens_dropped"
            ),
        )
    )
