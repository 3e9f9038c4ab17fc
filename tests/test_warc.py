"""WARC serialization/parsing (io/warc.py).

Round-trip over the synthesized pages table pins byte identity of
payloads; a hand-crafted literal file (warcinfo + response records,
exactly per ISO 28500 framing) pins the parser against the spec
independent of our own serializer; malformed inputs pin the
strict/lenient contract.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from k2_18_spark.io.warc import (
    WarcFormatError,
    parse_warc,
    to_warc_records,
    warc_files,
)
from k2_18_spark.pipeline.linkgraph import synth_pages


def _pages(spark, n=40):
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body text "), F.col("id").cast("string")).alias("text"),
        F.lit("en").alias("lang"),
    )
    return synth_pages(docs, n)


def test_roundtrip_byte_identity(spark):
    pages = _pages(spark).persist()
    recs = to_warc_records(pages)
    files = warc_files(recs, num_files=3)
    parsed = parse_warc(files)

    orig = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    got = {r["url"]: r for r in parsed.collect()}
    assert set(got) == set(orig)
    for url, row in got.items():
        assert bytes(row["payload"]) == orig[url], url
        assert row["record_type"] == "response"
        assert row["http_status"] == 200
        assert row["http_content_type"] == "text/html; charset=UTF-8"
        md5 = hashlib.md5(url.encode()).hexdigest()
        assert row["record_id"] == f"<urn:md5:{md5}>"
        assert row["warc_date"].endswith("Z") and "T" in row["warc_date"]
    pages.unpersist()


def test_files_pack_all_records(spark):
    recs = to_warc_records(_pages(spark, 30))
    files = warc_files(recs, num_files=4).persist()
    assert files.agg(F.sum("n_records")).collect()[0][0] == 30
    # each blob is itself a valid WARC file
    assert parse_warc(files).count() == 30
    files.unpersist()


_LITERAL = (
    b"WARC/1.0\r\n"
    b"WARC-Type: warcinfo\r\n"
    b"WARC-Record-ID: <urn:uuid:1>\r\n"
    b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
    b"Content-Type: application/warc-fields\r\n"
    b"Content-Length: 18\r\n"
    b"\r\n"
    b"software: test1.0\n"
    b"\r\n\r\n"
    b"WARC/1.0\r\n"
    b"WARC-Type: response\r\n"
    b"WARC-Record-ID: <urn:uuid:2>\r\n"
    b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
    b"WARC-Target-URI: https://x.example/a\r\n"
    b"Content-Type: application/http; msgtype=response\r\n"
    b"Content-Length: 80\r\n"
    b"\r\n"
    b"HTTP/1.1 404 Not Found\r\n"
    b"Content-Type: text/plain\r\n"
    b"Content-Length: 9\r\n"
    b"\r\n"
    b"not found"
    b"\r\n\r\n"
)


def _blob_df(spark, blob):
    return spark.createDataFrame([(0, blob)], "file_id long, data binary")


def test_literal_file_parses_per_spec(spark):
    rows = sorted(
        parse_warc(_blob_df(spark, _LITERAL)).collect(),
        key=lambda r: r["record_id"],
    )
    info, resp = rows
    assert info["record_type"] == "warcinfo"
    assert info["url"] is None and info["http_status"] is None
    assert bytes(info["payload"]) == b"software: test1.0\n"
    assert info["content_length"] == 18

    assert resp["record_type"] == "response"
    assert resp["url"] == "https://x.example/a"
    assert resp["http_status"] == 404
    assert resp["http_content_type"] == "text/plain"
    assert bytes(resp["payload"]) == b"not found"
    assert resp["warc_date"] == "2026-01-02T03:04:05Z"


def test_truncated_strict_raises_lenient_recovers(spark):
    truncated = _LITERAL[:-20]  # cuts into the response content
    with pytest.raises(Exception) as exc:
        parse_warc(_blob_df(spark, truncated)).collect()
    assert "WarcFormatError" in str(exc.value) or "truncated" in str(exc.value)
    rows = parse_warc(_blob_df(spark, truncated), lenient=True).collect()
    assert len(rows) == 1 and rows[0]["record_type"] == "warcinfo"


def test_garbage_strict_raises_lenient_empty(spark):
    garbage = b"HTTP/1.1 200 OK\r\n\r\nnot a warc"
    with pytest.raises(Exception):
        parse_warc(_blob_df(spark, garbage)).collect()
    assert parse_warc(_blob_df(spark, garbage), lenient=True).count() == 0
