"""Structured Streaming ingest over Common-Crawl-style pages
(SURVEY.md §2.10 — upgraded from "batch checkpoints only").

The batch engine's text operators are pure column expressions
(operators/textstats.py), so the SAME definitions run unchanged as a
streaming query: readStream → stateless feature projection →
(optionally) watermarked stateful dedup / windowed aggregation →
writeStream with exactly-once parquet sinks via the streaming
checkpoint. This is the micro-batch mirror of the batch pipeline —
at 100 TB/day the identical code ingests the crawl incrementally
instead of re-scanning the corpus.

Stateful pieces and their scale behavior:
- ``stream_exact_dedup``: dropDuplicates on the content fingerprint
  WITH a watermark — state per distinct fingerprint is evicted once
  the event-time watermark passes, so state size is bounded by the
  dedup horizon, not the stream length.
- ``windowed_doc_counts``: per-source tumbling-window counts with
  late-data handling via the same watermark (append output mode only
  emits finalized windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k2_18_spark import schemas
from k2_18_spark.operators.textstats import (
    bpe_token_count,
    token_count,
)


def stream_pages(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of pages rows (url, warc_ts, html, text,
    lang). ``maxFilesPerTrigger`` bounds micro-batch size — the knob
    that keeps executor memory flat regardless of backlog."""
    reader = spark.readStream.schema(schemas.PAGES)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def stream_doc_features(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateless per-document features — the streaming mirror of the
    batch fingerprint/token-count operators (identical expressions, so
    batch and stream agree byte-for-byte on the same rows)."""
    text = F.col(text_col)
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return pages.select(
        "url",
        "warc_ts",
        text_col,
        token_count(text).cast("long").alias("n_ws_tokens"),
        bpe_token_count(text).cast("long").alias("n_bpe_tokens"),
        F.md5(norm).alias("fingerprint"),
        F.length(text).cast("long").alias("n_chars"),
    )


def stream_exact_dedup(
    features: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Exactly-once streaming dedup on the content fingerprint: the
    first document per fingerprint inside the watermark horizon
    survives; state for expired fingerprints is dropped by the
    watermark (bounded state — the streaming analogue of
    dedup.exact_duplicates).

    Uses ``dropDuplicatesWithinWatermark`` — plain ``dropDuplicates``
    on a key subset that excludes the event-time column never evicts
    its state (Spark only ages out state when the watermark column is
    part of the dedup keys), so it would grow one entry per distinct
    fingerprint forever."""
    return features.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )


def windowed_doc_counts(
    features: DataFrame,
    window: str = "10 minutes",
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Tumbling-window ingest stats with late-data handling:
    → (window, n_docs, n_tokens) finalized once the watermark passes."""
    return (
        features.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws_tokens").alias("n_tokens"),
        )
    )


def write_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "append",
    available_now: bool = True,
):
    """Parquet sink with the streaming checkpoint (exactly-once file
    commit log). ``available_now`` drains the current backlog and
    stops — the batch-like trigger used by tests and backfills; pass
    False for a continuously running micro-batch query."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
