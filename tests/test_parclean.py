"""Paragraph-level corpus cleaning (operators/parclean.py)."""

from pyspark.sql import functions as F

from k2_18_spark.operators.parclean import (
    boilerplate_lines,
    dedup_paragraphs,
    paragraph_frequency,
    strip_boilerplate,
)

DOCS = [
    # host A: shared nav + copyright, distinct bodies
    ("d1", "A", "NAV HOME\nalpha body one\n  promo offer \nCOPY 2026"),
    ("d2", "A", "NAV HOME\nbeta body two\nCOPY 2026"),
    ("d3", "A", "NAV HOME\ngamma body three\n\nCOPY 2026"),
    # host B: its own nav; shares the cross-host promo line
    ("d4", "B", "B-NAV\ndelta body four\npromo offer\nCOPY 2026"),
    ("d5", "B", "B-NAV\nepsilon body five"),
    # whitespace-only text
    ("d6", "B", "   \n\n"),
]


def _docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id string, host string, text string"
    )


def test_paragraph_frequency(spark):
    freq = {
        r["line"]: (r["n_docs"], r["n_occurrences"])
        for r in paragraph_frequency(_docs(spark)).collect()
    }
    assert freq["NAV HOME"] == (3, 3)
    assert freq["COPY 2026"] == (4, 4)
    assert freq["promo offer"] == (2, 2)  # trimmed form unifies d1/d4
    assert freq["alpha body one"] == (1, 1)
    assert "" not in freq  # blank lines are not paragraphs


def test_dedup_paragraphs_keep_first(spark):
    out = {
        r["doc_id"]: r
        for r in dedup_paragraphs(_docs(spark), min_repeat=2).collect()
    }
    # d1 is the canonical first for NAV/promo/COPY -> keeps everything
    assert out["d1"]["text_clean"] == (
        "NAV HOME\nalpha body one\n  promo offer \nCOPY 2026"
    )
    assert out["d1"]["lines_dropped"] == 0
    # d2 loses both repeated lines, keeps its unique body
    assert out["d2"]["text_clean"] == "beta body two"
    assert (out["d2"]["lines_kept"], out["d2"]["lines_dropped"]) == (1, 2)
    # d4 loses promo + COPY (first copies live in d1), keeps B-NAV (first)
    assert out["d4"]["text_clean"] == "B-NAV\ndelta body four"
    # blank-only doc survives with empty clean text
    assert out["d6"]["text_clean"] == ""
    assert (out["d6"]["lines_kept"], out["d6"]["lines_dropped"]) == (0, 0)


def test_dedup_paragraphs_drop_all(spark):
    out = {
        r["doc_id"]: r
        for r in dedup_paragraphs(
            _docs(spark), min_repeat=2, keep_first=False
        ).collect()
    }
    assert out["d1"]["text_clean"] == "alpha body one"
    assert out["d1"]["lines_dropped"] == 3
    assert out["d4"]["text_clean"] == "delta body four"
    # repeated-in-3-docs line gone everywhere
    for r in out.values():
        assert "NAV HOME" not in r["text_clean"]


def test_boilerplate_lines_threshold(spark):
    bp = {
        (r["host"], r["line"]): r
        for r in boilerplate_lines(
            _docs(spark), min_docs=3, min_frac=0.6
        ).collect()
    }
    assert ("A", "NAV HOME") in bp
    assert bp[("A", "NAV HOME")]["frac"] == 1.0
    assert ("A", "COPY 2026") in bp
    # promo: 1/3 of host A docs -> below min_frac
    assert ("A", "promo offer") not in bp
    # host B has 3 docs (d6 counts) -> B-NAV in 2/3 >= 0.6
    assert bp[("B", "B-NAV")]["df_docs"] == 2
    assert bp[("B", "B-NAV")]["host_docs"] == 3
    # bodies are never boilerplate
    assert not any("body" in k[1] for k in bp)


def test_strip_boilerplate(spark):
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(
            _docs(spark), min_docs=3, min_frac=0.6
        ).collect()
    }
    assert out["d1"]["text_clean"] == "alpha body one\n  promo offer "
    assert out["d1"]["host"] == "A"
    assert out["d5"]["text_clean"] == "epsilon body five"
    # boilerplate is PER HOST: COPY 2026 is boilerplate in A (3/3)
    # but not in B (1/3 docs), so d4 only loses B-NAV
    assert out["d4"]["lines_dropped"] == 1
    assert out["d4"]["text_clean"] == (
        "delta body four\npromo offer\nCOPY 2026"
    )
    assert len(out) == 6


def test_clean_roundtrip_no_repeats_is_identity(spark):
    docs = spark.createDataFrame(
        [("x", "h", "one\ntwo\nthree"), ("y", "h", "four\nfive")],
        "doc_id string, host string, text string",
    )
    out = {
        r["doc_id"]: r["text_clean"]
        for r in dedup_paragraphs(docs, min_repeat=2).collect()
    }
    assert out == {"x": "one\ntwo\nthree", "y": "four\nfive"}
