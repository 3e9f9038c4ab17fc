"""WARC (ISO 28500 / WARC/1.0) record serialization and parsing — the
actual Common-Crawl container format, over the engine's pages shape
``(url, warc_ts, html binary, …)``.

The format (public spec, bigs at iipc/warc-specifications): a record is

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n …          (named fields, any order)
    \\r\\n                                   (end of header block)
    <Content-Length bytes of content>
    \\r\\n\\r\\n                              (record separator)

Common Crawl "response" records wrap an HTTP/1.1 response envelope
(status line + headers + body) as the content block, with
``Content-Type: application/http; msgtype=response``.

Design for 100 TB:

- **Serialization is pure column expressions** — header strings are
  built with ``concat`` over encoded parts and concatenated to the
  binary payload JVM-side (binary ``concat`` is codegen); no Python,
  no shuffle. ``WARC-Record-ID`` is derived from md5(url) so records
  are deterministic (real crawlers use UUIDs; determinism is what
  makes the round-trip oracle possible).
- **Parsing is an Arrow-batched ``mapInPandas``** over whole-file (or
  segment) blobs: one Python call per batch, records walked with
  ``bytes.find`` — no per-row Python, no regex on the payload. Blobs
  are parsed where they sit; only the (small) parsed metadata plus the
  payload the caller asked for move on.
- ``warc_files`` packs records into N concatenated file blobs the way
  a crawler writes .warc files (records never split across blobs), so
  the parser is exercised on multi-record inputs.

Strictness: malformed input raises ``WarcFormatError`` with the byte
offset (default), or with ``lenient=True`` stops at the first
malformed record in each blob and reports clean records only — the
crawl-recovery mode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CRLF = "\r\n"
_WARC_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


class WarcFormatError(ValueError):
    """Malformed WARC input (carries the blob byte offset)."""


def _utc_date(ts_col: str | Column) -> Column:
    """Render a timestamp as a WARC-Date UTC string independent of the
    session timezone (to_utc_timestamp(current_timezone()) makes the
    session-tz rendering show UTC wall time)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.date_format(
        F.to_utc_timestamp(c, F.current_timezone()), _WARC_DATE_FMT
    )


def to_warc_records(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
) -> DataFrame:
    """Serialize each page into one WARC/1.0 response record →
    (url, warc_record binary, record_length). Pure JVM expressions."""
    payload = F.col(payload_col)
    body_len = F.length(payload)  # bytes (binary column)
    http_head = F.concat(
        F.lit("HTTP/1.1 200 OK" + CRLF),
        F.lit("Content-Type: text/html; charset=UTF-8" + CRLF),
        F.lit("Content-Length: "),
        body_len.cast("string"),
        F.lit(CRLF + CRLF),
    )
    content_len = F.length(http_head) + body_len
    warc_head = F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit("WARC-Type: response" + CRLF),
        F.lit("WARC-Record-ID: <urn:md5:"),
        F.md5(F.encode(F.col(url_col), "UTF-8")),
        F.lit(">" + CRLF),
        F.lit("WARC-Date: "),
        _utc_date(ts_col),
        F.lit(CRLF),
        F.lit("WARC-Target-URI: "),
        F.col(url_col),
        F.lit(CRLF),
        F.lit("Content-Type: application/http; msgtype=response" + CRLF),
        F.lit("Content-Length: "),
        content_len.cast("string"),
        F.lit(CRLF + CRLF),
    )
    record = F.concat(
        F.encode(warc_head, "UTF-8"),
        F.encode(http_head, "UTF-8"),
        payload,
        F.encode(F.lit(CRLF + CRLF), "UTF-8"),
    )
    return pages.select(
        F.col(url_col).alias("url"),
        record.alias("warc_record"),
        F.length(record).cast("long").alias("record_length"),
    )


def warc_files(records: DataFrame, num_files: int) -> DataFrame:
    """Pack records into ``num_files`` concatenated .warc-style blobs →
    (file_id, n_records, data binary). Records are repartitioned to
    ``num_files`` partitions and concatenated per Arrow batch — a
    record is never split across blobs (a blob may be smaller than a
    full partition when Arrow splits batches; every blob is still a
    valid standalone WARC file)."""
    schema = StructType(
        [
            StructField("file_id", LongType()),
            StructField("n_records", LongType()),
            StructField("data", BinaryType()),
        ]
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        for b in batches:
            # NULL records (a NULL payload serializes to a NULL record)
            # are skipped, not crashed on — n_records counts real ones
            blobs = [bytes(x) for x in b["warc_record"] if x is not None]
            if blobs:
                yield pd.DataFrame(
                    {
                        "file_id": [pid],
                        "n_records": [len(blobs)],
                        "data": [b"".join(blobs)],
                    }
                )

    return records.repartition(num_files).mapInPandas(pack, schema)


_PARSE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("record_type", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_length", LongType()),
        StructField("http_status", LongType()),
        StructField("http_content_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def _parse_blob(blob: bytes, lenient: bool) -> list[tuple]:
    out = []
    pos, n = 0, len(blob)
    while pos < n:
        # skip inter-record padding (spec: CRLFCRLF separators)
        while pos < n and blob[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = blob.find(b"\r\n\r\n", pos)
        if head_end < 0 or not blob.startswith(b"WARC/", pos):
            if lenient:
                break
            raise WarcFormatError(f"no WARC header block at offset {pos}")
        lines = blob[pos:head_end].decode("utf-8", "replace").split(CRLF)
        if not lines[0].startswith("WARC/"):
            if lenient:
                break
            raise WarcFormatError(f"bad version line at offset {pos}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            if lenient:
                break
            raise WarcFormatError(f"missing Content-Length at offset {pos}")
        content_start = head_end + 4
        content_end = content_start + clen
        if content_end > n:
            if lenient:
                break
            raise WarcFormatError(
                f"truncated content at offset {content_start}"
            )
        content = blob[content_start:content_end]

        status: int | None = None
        http_ct: str | None = None
        payload = content
        if headers.get("content-type", "").startswith("application/http"):
            hh_end = content.find(b"\r\n\r\n")
            if hh_end >= 0:
                hlines = content[:hh_end].decode("utf-8", "replace").split(CRLF)
                parts = hlines[0].split(" ", 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for ln in hlines[1:]:
                    k, _, v = ln.partition(":")
                    if k.strip().lower() == "content-type":
                        http_ct = v.strip()
                payload = content[hh_end + 4 :]
        out.append(
            (
                headers.get("warc-target-uri"),
                headers.get("warc-type"),
                headers.get("warc-record-id"),
                headers.get("warc-date"),
                clen,
                status,
                http_ct,
                payload,
            )
        )
        pos = content_end
    return out


def parse_warc(
    files: DataFrame, data_col: str = "data", lenient: bool = False
) -> DataFrame:
    """Parse WARC blobs → one row per record:
    (url, record_type, record_id, warc_date, content_length,
    http_status, http_content_type, payload binary).

    HTTP response envelopes (``application/http``) are unwrapped:
    ``http_status``/``http_content_type`` from the status block,
    ``payload`` = the body; other record types pass content through
    with NULL http fields."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[tuple] = []
            for blob in b[data_col]:
                rows.extend(_parse_blob(bytes(blob), lenient))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _PARSE_SCHEMA.fields]
            )

    return files.mapInPandas(run, _PARSE_SCHEMA)
