"""Extractor parity tests (F1/F2/F8): byte-identical text per url on
the synthetic pages table; NFC + script/style semantics; pass-through
byte parity on the reference's own fixture corpus."""

import unicodedata
from pathlib import Path

from pyspark.sql import functions as F

from k2_18_spark.functions.text import (
    create_slug,
    decode_bytes,
    extract_udf,
    preprocess_text,
)
from k2_18_spark.io.synth import pages_table

FIXTURE_HTML = Path(__file__).resolve().parents[1] / "fixtures" / "html"


def test_preprocess_removes_script_and_style():
    html = "<p>keep</p><script>var x=1;</script><p>mid</p><style>a{}</style><p>end</p>"
    out = preprocess_text(html)
    assert "var x=1" not in out and "<script" not in out
    assert "a{}" not in out and "<style" not in out
    assert "<p>keep</p>" in out and "<p>mid</p>" in out and "<p>end</p>" in out


def test_preprocess_preserves_non_script_bytes_exactly():
    html = "<h1>Τίτλος</h1>\n<p>text &amp; more</p>\n<script>x</script>tail"
    out = preprocess_text(html)
    assert out == unicodedata.normalize(
        "NFC", "<h1>Τίτλος</h1>\n<p>text &amp; more</p>\ntail"
    )


def test_preprocess_passthrough_without_markers():
    md = "# Header\n\nplain *markdown* text <b>bold</b>\n"
    assert preprocess_text(md) == md


def test_preprocess_nfc_normalization():
    decomposed = "éclair"  # e + combining acute
    assert preprocess_text(decomposed) == unicodedata.normalize("NFC", decomposed)


def test_preprocess_nested_and_unclosed():
    html = "<p>a</p><script>if (x<style) {}</script><p>b</p>"
    out = preprocess_text(html)
    assert "<p>a</p>" in out and "<p>b</p>" in out
    html2 = "<p>a</p><script>never closed"
    out2 = preprocess_text(html2)
    assert out2 == "<p>a</p>"


def test_preprocess_case_insensitive_markers():
    html = "<p>x</p><SCRIPT>bad()</SCRIPT>"
    out = preprocess_text(html)
    assert "bad()" not in out


def test_decode_fallback_chain():
    assert decode_bytes("привет".encode("utf-8")) == "привет"
    assert decode_bytes("привет".encode("cp1251")) == "привет"
    # cp1251 accepts nearly any byte string, so it wins before latin1
    # (same as the reference chain, src/slicer.py:230-241)
    assert decode_bytes(b"\xff\xfe caf\xe9") == b"\xff\xfe caf\xe9".decode("cp1251")
    # 0x98 is undefined in cp1251 → falls through to latin1
    assert decode_bytes(b"\x98abc") == b"\x98abc".decode("latin1")


def test_reference_fixture_passthrough_byte_parity():
    """The reference corpus files contain no script/style → the
    extractor must return them byte-identical after NFC (which is a
    no-op for already-NFC text)."""
    for p in FIXTURE_HTML.iterdir():
        raw = p.read_text(encoding="utf-8")
        assert preprocess_text(raw) == unicodedata.normalize("NFC", raw), p.name


def test_create_slug_reference_examples():
    # docstring examples, src/slicer.py:137-143
    assert create_slug("Алгоритмы и Структуры.txt") == "algoritmy_i_struktury"
    assert create_slug("My Course Chapter 1.md") == "my_course_chapter_1"
    assert create_slug("python-basics.html") == "python-basics"


def test_extract_udf_byte_identical_per_url(spark):
    """north_rule per-row invariant: the pandas-UDF extraction equals
    the expected `text` column byte-for-byte for every url."""
    pages = pages_table(spark, num_pages=120)
    checked = pages.select(
        "url",
        (extract_udf(F.col("html")) == F.col("text")).alias("ok"),
    )
    bad = checked.filter(~F.col("ok")).count()
    assert bad == 0
    assert checked.count() == 120
