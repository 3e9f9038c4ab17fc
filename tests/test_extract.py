"""Extractor parity tests (F1/F2/F8): byte-identical text per url on
the synthetic pages table; NFC + script/style semantics; pass-through
byte parity on the reference's own fixture corpus."""

import unicodedata
from pathlib import Path

import pytest

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


# -- adversarial extractor parity corpus (F1) ---------------------------------
# Each case: (html_in, expected_output_of_our_span_cut, bs4_divergence).
# bs4_divergence=None ⇒ BeautifulSoup(html.parser) + decompose +
# str(soup) — the reference extractor, src/slicer.py:163-203 — would
# produce the SAME bytes (both use the stdlib html.parser tokenizer, so
# element boundaries agree; bs4 only differs where its TREE
# re-serialization alters bytes outside the removed elements).
# Non-None values document the exact expected byte difference.
ADVERSARIAL_CASES = [
    ("simple", "a<script>var x=1;</script>b", "ab", None),
    (
        "nested_script",
        "a<script>x<script>y</script>z</script>b",
        "az</script>b",
        "bs4 drops the stray unmatched '</script>' end tag during "
        "re-serialization -> 'azb'; the span-cut preserves the raw bytes",
    ),
    ("unclosed_script_eof", "keep<script>runs to eof", "keep", None),
    (
        "unclosed_style_then_text",
        "k1<style>.x{color:red}\nmore css",
        "k1",
        None,
    ),
    (
        "end_tag_in_script_attr",
        'a<script type="</script>">body</script>b',
        "ab",
        None,  # same stdlib tokenizer decides the element boundary
    ),
    (
        "marker_in_nonscript_attr",
        'x<div data-t="<script>alert(1)</script>">y</div>z',
        'x<div data-t="<script>alert(1)</script>">y</div>z',
        None,  # no script ELEMENT exists; bs4 serializes the attr unchanged
    ),
    (
        "comment_wrapped",
        "q<!-- <script>x</script> -->w",
        "q<!-- <script>x</script> -->w",
        None,  # comments are opaque to both
    ),
    (
        "cdata_wrapped",
        "q<![CDATA[<script>x</script>]]>w",
        "q<![CDATA[<script>x</script>]]>w",
        None,  # unknown_decl / CData node round-trips
    ),
    ("case_insensitive", "a<SCRIPT>X</sCrIpT>b<STYLE>c</Style>d", "abd", None),
    (
        "attrs_multiline",
        'a<script\n  src="x.js"\n  defer>\nbody()\n</script>\nb',
        "a\nb",
        None,
    ),
    ("self_closing", "a<script/>b<script>real</script>c", "abc", None),
    (
        "whitespace_end_tag",
        "a<style>.c{}</ style>b</style>c",
        "ab</style>c",
        "html.parser closes the style element at '</ style>' (its CDATA "
        "scanner allows whitespace); bs4 additionally drops the now-stray "
        "'</style>' -> 'abc'",
    ),
    ("nfc_passthrough_no_tags", "café no tags", "café no tags", None),
    (
        "cyrillic_around_script",
        "Текст<script>код</script>конец",
        "Текстконец",
        None,
    ),
    ("two_blocks", "a<script>1</script>m<style>2</style>z", "amz", None),
    ("style_then_script", "a<style>s</style><script>q</script>b", "ab", None),
    (
        "single_quoted_attr_elsewhere",
        "s<div class='a'><script>x</script></div>t",
        "s<div class='a'></div>t",
        "bs4 re-serializes EVERY tag: attribute quotes normalize to "
        "double -> 's<div class=\"a\"></div>t'; the span-cut keeps "
        "untouched markup byte-identical instead",
    ),
    (
        "entity_in_text",
        "A&nbsp;B<script>x</script>C",
        "A&nbsp;B C".replace(" C", "C"),
        "bs4 (convert_charrefs) decodes '&nbsp;' to U+00A0 and does not "
        "re-escape it on output; the span-cut preserves the literal "
        "entity bytes",
    ),
]


@pytest.mark.parametrize(
    "name,html,expected,bs4_note",
    ADVERSARIAL_CASES,
    ids=[c[0] for c in ADVERSARIAL_CASES],
)
def test_preprocess_adversarial(name, html, expected, bs4_note):
    got = preprocess_text(html)
    assert got == expected, (name, got)
    # invariant of the span-cut design: every output byte appears in the
    # NFC-normalized input in order (we only ever DELETE spans)
    import unicodedata as _ud

    norm = _ud.normalize("NFC", html)
    pos = 0
    for ch in got:
        pos = norm.find(ch, pos)
        assert pos != -1, (name, "output byte not from input", ch)
        pos += 1
    # bs4_note is documentation: non-None cases are the enumerated,
    # bounded divergences vs the bs4-backed reference extractor


def test_extractor_parity_fixture_in_sync():
    """fixtures/extractor_parity.jsonl is the standalone replay corpus
    for a bs4-equipped environment (VERDICT r03 task 8) — keep it in
    lockstep with ADVERSARIAL_CASES."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "fixtures", "extractor_parity.jsonl"
    )
    with open(path) as fh:
        rows = [json.loads(line) for line in fh]
    assert [
        (r["name"], r["html"], r["expected_span_cut"], r["bs4_divergence"])
        for r in rows
    ] == ADVERSARIAL_CASES


def _bs4_reference_extract(html: str) -> str:
    """The reference extractor verbatim-in-semantics
    (src/slicer.py:163-203): NFC normalize; when a script/style marker
    is present, parse with BeautifulSoup(html.parser), decompose those
    elements, re-serialize."""
    import unicodedata

    from bs4 import BeautifulSoup  # noqa: F401

    text = unicodedata.normalize("NFC", html)
    low = text.lower()
    if "<script" not in low and "<style" not in low:
        return text
    soup = BeautifulSoup(text, "html.parser")
    for tag in soup(["script", "style"]):
        tag.decompose()
    return str(soup)


def test_bs4_reference_replay():
    """Skipped-by-default in this sandbox (bs4 absent): replays the
    parity corpus against the REAL bs4-backed reference extractor.
    Cases with bs4_divergence=None must be byte-identical; non-None
    cases document the expected difference and must differ."""
    pytest.importorskip("bs4")
    for name, html, expected, note in ADVERSARIAL_CASES:
        ref = _bs4_reference_extract(html)
        if note is None:
            assert ref == expected, (name, ref)
        else:
            assert ref != expected, (name, "documented divergence vanished")


def test_preprocess_adversarial_batch_udf(spark):
    """The same corpus through the vectorized UDF path (extract_udf):
    batch results byte-equal the scalar function."""
    from k2_18_spark.functions.text import preprocess_text_udf

    df = spark.createDataFrame(
        [(c[0], c[1]) for c in ADVERSARIAL_CASES], "name string, text string"
    )
    got = {
        r["name"]: r["out"]
        for r in df.select(
            "name", preprocess_text_udf("text").alias("out")
        ).collect()
    }
    for name, html, expected, _ in ADVERSARIAL_CASES:
        assert got[name] == expected, name
