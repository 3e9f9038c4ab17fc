"""Structured Streaming ingest (§2.10): the streaming pipeline must
agree with the batch operators on the same rows, dedup exactly on the
fingerprint within the watermark, and finalize windowed counts."""

import datetime

import pytest

from k2_18_spark import schemas
from k2_18_spark.streaming import (
    stream_doc_features,
    stream_exact_dedup,
    stream_pages,
    windowed_doc_counts,
    write_stream,
)


def _ts(minute):
    return datetime.datetime(2026, 1, 1, 12, minute, 0)


@pytest.fixture()
def pages_dir(spark, tmp_path):
    rows = [
        ("https://a.org/1", _ts(0), None, "alpha beta gamma", "en"),
        ("https://a.org/2", _ts(1), None, "alpha beta gamma", "en"),  # dup text
        ("https://b.org/1", _ts(2), None, "delta epsilon", "en"),
        ("https://b.org/2", _ts(12), None, "zeta eta theta iota", "en"),
    ]
    src = str(tmp_path / "pages")
    spark.createDataFrame(rows, schemas.PAGES).coalesce(1).write.parquet(src)
    return src


def test_stream_features_match_batch(spark, tmp_path, pages_dir):
    out = str(tmp_path / "features")
    ck = str(tmp_path / "ck1")
    q = write_stream(
        stream_doc_features(stream_pages(spark, pages_dir)), out, ck
    )
    q.awaitTermination()
    got = {r["url"]: r for r in spark.read.parquet(out).collect()}
    assert len(got) == 4
    assert got["https://a.org/1"]["n_ws_tokens"] == 3
    assert got["https://b.org/2"]["n_bpe_tokens"] == 4
    # identical text → identical fingerprint (streaming == batch exprs)
    assert (
        got["https://a.org/1"]["fingerprint"]
        == got["https://a.org/2"]["fingerprint"]
    )
    assert got["https://a.org/1"]["fingerprint"] != got["https://b.org/1"]["fingerprint"]


def test_stream_exact_dedup(spark, tmp_path, pages_dir):
    out = str(tmp_path / "deduped")
    ck = str(tmp_path / "ck2")
    q = write_stream(
        stream_exact_dedup(
            stream_doc_features(stream_pages(spark, pages_dir))
        ),
        out,
        ck,
    )
    q.awaitTermination()
    rows = spark.read.parquet(out).collect()
    # one of the two identical-text docs dropped, three fingerprints kept
    assert len(rows) == 3
    assert len({r["fingerprint"] for r in rows}) == 3


def test_windowed_counts_finalize(spark, tmp_path, pages_dir):
    out = str(tmp_path / "counts")
    ck = str(tmp_path / "ck3")
    q = write_stream(
        windowed_doc_counts(
            stream_doc_features(stream_pages(spark, pages_dir)),
            window="10 minutes",
            watermark="0 seconds",
        ),
        out,
        ck,
    )
    q.awaitTermination()
    got = {
        (r["window"]["start"].minute): (r["n_docs"], r["n_tokens"])
        for r in spark.read.parquet(out).collect()
    }
    # 12:00-12:10 window (3 docs) finalizes once the 12:12 row advances
    # the watermark past it; the 12:10-12:20 window stays open (append
    # mode emits only closed windows)
    assert got == {0: (3, 8)}
