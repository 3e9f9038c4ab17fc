"""C4-style document quality filtering — the published rule set.

``operators/textstats.quality_features`` SCORES documents; this
module applies the C4 paper's hard FILTERS (Raffel et al. 2020,
§2.2, public) the way the released corpus was actually built —
line-level rules first, then document-level gates on what survives:

Line rules (a line is kept only if ALL hold):
- ends in terminal punctuation (. ! ? or closing quote after one)
- has ≥ ``min_line_words`` words (default 3)
- does not contain "javascript" (case-insensitive)
- does not contain curly braces (code/markup)
- is not a cookie/ToS boilerplate marker line ("lorem ipsum",
  "terms of use", "privacy policy", "cookie policy", "uses cookies")

Document gates (after line filtering):
- ≥ ``min_sentences`` kept lines (C4 used 3 paragraph-like lines)
- no kept line longer than ``max_line_chars``
- total kept words ≥ ``min_words``

Everything is codegen (split / filter / regexp / aggregate on the
exploded line table — the same explode-shape as
``operators/parclean``); no Python UDFs, so at 100 TB the pass runs
at scan speed with one per-doc aggregation shuffle. Returns per-doc
verdicts + the cleaned text so the filter composes with the
paragraph dedup and PII passes in one pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TERMINAL_RE = r'[.!?]["”’]?$'
BAD_MARKERS = [
    "lorem ipsum",
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "javascript",
]


def c4_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 3,
    min_sentences: int = 3,
    max_line_chars: int = 2000,
    min_words: int = 5,
) -> DataFrame:
    """Apply the C4 rule set → (id, text_clean, n_lines_kept,
    n_lines_dropped, n_words, keep boolean). ``text_clean`` joins the
    surviving lines; ``keep`` is the document gate verdict."""
    lower = F.lower(F.col("norm"))
    marker_hit = F.lit(False)
    for m in BAD_MARKERS:
        marker_hit = marker_hit | lower.contains(m)
    line_ok = (
        (F.col("norm").rlike(TERMINAL_RE))
        & (F.size(F.split(F.col("norm"), r"\s+")) >= min_line_words)
        & (~F.col("norm").contains("{"))
        & (~F.col("norm").contains("}"))
        & (~marker_hit)
    )
    lines = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias(
                "pos", "line"
            ),
        )
        .withColumn("norm", F.trim("line"))
        .filter(F.col("norm") != "")
        .withColumn("ok", line_ok)
    )
    agg = lines.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("ok"), F.struct("pos", "norm"))
                    )
                ),
                lambda s: s["norm"],
            ),
            "\n",
        ).alias("text_clean"),
        F.sum(F.col("ok").cast("long")).alias("n_lines_kept"),
        F.sum((~F.col("ok")).cast("long")).alias("n_lines_dropped"),
        F.sum(
            F.when(
                F.col("ok"), F.size(F.split(F.col("norm"), r"\s+"))
            ).otherwise(0)
        ).cast("long").alias("n_words"),
        F.max(
            F.when(F.col("ok"), F.length("norm")).otherwise(0)
        ).alias("_max_line"),
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(agg, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
            F.coalesce("n_lines_dropped", F.lit(0)).alias(
                "n_lines_dropped"
            ),
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            (
                (F.coalesce("n_lines_kept", F.lit(0)) >= min_sentences)
                & (F.coalesce("_max_line", F.lit(0)) <= max_line_chars)
                & (F.coalesce("n_words", F.lit(0)) >= min_words)
            ).alias("keep"),
        )
    )
