"""Paragraph-level corpus cleaning — the C4 / RefinedWeb passes.

LLM training pipelines clean web text BELOW document granularity:
C4 (Raffel et al. 2020) drops every repeated occurrence of a span
seen elsewhere in the corpus; RefinedWeb (Penedo et al. 2023) strips
per-site boilerplate lines (nav bars, cookie banners, copyright
footers) whose line-frequency within a host is high. Document-level
dedup (operators/dedup.py) cannot express either — the unit of
repetition is the line/paragraph, not the page.

Three operators over (id, text) with ``\\n``-separated lines:

- ``paragraph_frequency``: corpus-wide frequency per normalized
  (trimmed, non-empty) line — the profiling pass.
- ``dedup_paragraphs``: drop lines whose normalized form appears in
  ≥ ``min_repeat`` distinct docs; ``keep_first=True`` retains the
  canonical first occurrence (min (id, pos)), C4-style.
- ``boilerplate_lines`` / ``strip_boilerplate``: per-host line
  document-frequency; a line is boilerplate for a host with ≥
  ``min_docs`` docs when it occurs in ≥ ``min_frac`` of them.

Scale shape: one ``posexplode`` over the text (lines ≈ 10× docs, no
Python UDFs — split/trim/posexplode are codegen), one groupBy on the
normalized line (map-side partial aggregation collapses repeats
before the shuffle — exactly the hot path at 100 TB where the whole
point is that many lines repeat), one join back (Catalyst broadcasts
the frequency table when the repeated-line set is small, else
shuffle-hash on the line key), and one per-doc rebuild groupBy that
reassembles text in original line order via ``array_sort`` of
(pos, line) structs. Reassembly preserves each kept line BYTE-exact
(untrimmed); blank/whitespace-only lines are treated as formatting,
not paragraphs — they are neither counted nor kept.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lines(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, line, norm) for every non-blank line."""
    return (
        docs.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias(
                "pos", "line"
            ),
        )
        .withColumn("norm", F.trim("line"))
        .filter(F.col("norm") != "")
    )


def _rebuild(
    docs: DataFrame, kept: DataFrame, id_col: str, extra_cols: list | None = None
) -> DataFrame:
    """Reassemble cleaned text per doc (docs rows with no surviving
    lines keep an empty text_clean)."""
    agg = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                # collect_list skips NULLs: dropped lines vanish here
                # but still count below
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("dropped"), F.struct("pos", "line")
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_clean"),
        F.sum(F.when(F.col("dropped"), 0).otherwise(1)).alias("lines_kept"),
        F.sum(F.when(F.col("dropped"), 1).otherwise(0)).alias(
            "lines_dropped"
        ),
    )
    out = (
        docs.select(F.col(id_col).alias("_id"), *(extra_cols or []))
        .join(agg, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            *(extra_cols or []),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("lines_kept", F.lit(0)).cast("long").alias(
                "lines_kept"
            ),
            F.coalesce("lines_dropped", F.lit(0)).cast("long").alias(
                "lines_dropped"
            ),
        )
    )
    return out


def paragraph_frequency(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-wide profile → (line, n_docs, n_occurrences), keyed by
    the normalized (trimmed) line."""
    return (
        _lines(docs, id_col, text_col)
        .groupBy(F.col("norm").alias("line"))
        .agg(
            F.countDistinct("_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
    )


def dedup_paragraphs(
    docs: DataFrame,
    min_repeat: int = 2,
    keep_first: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style paragraph dedup → (id, text_clean, lines_kept,
    lines_dropped).

    A line occurrence is dropped when its normalized form appears in
    ≥ ``min_repeat`` distinct docs — except, with ``keep_first``, the
    canonical occurrence (minimum (id, pos), string order on ids)
    which survives so the corpus retains one copy of every paragraph.
    """
    lines = _lines(docs, id_col, text_col)
    freq = lines.groupBy("norm").agg(
        F.countDistinct("_id").alias("n_docs"),
        F.min(F.struct("_id", "pos")).alias("first"),
    )
    drop: Column = F.col("n_docs") >= min_repeat
    if keep_first:
        drop = drop & (
            F.struct("_id", "pos") != F.col("first")
        )
    marked = lines.join(freq, "norm").withColumn("dropped", drop)
    return _rebuild(docs, marked, id_col)


def boilerplate_lines(
    docs: DataFrame,
    host_col: str = "host",
    min_docs: int = 3,
    min_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-host boilerplate profile → (host, line, df_docs,
    host_docs, frac): lines occurring in ≥ min_frac of a host's ≥
    min_docs documents."""
    lines = _lines(
        docs.select(id_col, host_col, text_col), id_col, text_col
    ).join(
        docs.select(F.col(id_col).alias("_id"), host_col), "_id"
    )
    per_host = docs.groupBy(host_col).agg(
        F.countDistinct(id_col).alias("host_docs")
    )
    return (
        lines.groupBy(host_col, F.col("norm").alias("line"))
        .agg(F.countDistinct("_id").alias("df_docs"))
        .join(per_host, host_col)
        .withColumn(
            "frac", F.round(F.col("df_docs") / F.col("host_docs"), 6)
        )
        .filter(
            (F.col("host_docs") >= min_docs) & (F.col("frac") >= min_frac)
        )
        .select(host_col, "line", "df_docs", "host_docs", "frac")
    )


def strip_boilerplate(
    docs: DataFrame,
    host_col: str = "host",
    min_docs: int = 3,
    min_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove each host's boilerplate lines → (id, host, text_clean,
    lines_kept, lines_dropped)."""
    bp = boilerplate_lines(
        docs, host_col, min_docs, min_frac, id_col, text_col
    ).select(host_col, F.col("line").alias("norm"), F.lit(True).alias("_bp"))
    lines = _lines(
        docs.select(id_col, host_col, text_col), id_col, text_col
    ).join(docs.select(F.col(id_col).alias("_id"), host_col), "_id")
    marked = lines.join(bp, [host_col, "norm"], "left").withColumn(
        "dropped", F.coalesce("_bp", F.lit(False))
    )
    return _rebuild(docs, marked, id_col, extra_cols=[host_col])
