"""Gopher quality + repetition filters (operators/gopher.py) vs an
independent pure-python replica, plus threshold behavior and the
F.transform arity regression."""

import re
from collections import Counter

import pytest

from k2_18_spark.operators.gopher import (
    gopher_filter,
    gopher_quality,
    gopher_repetition,
)

DOCS = [
    # 0: clean long doc, passes everything
    (
        0,
        "The quick brown fox jumps over the lazy dog and then runs to "
        "the barn with a happy bark that echoes over the quiet field "
        "of wheat and corn while the farmer waves to the dog and the "
        "fox before they be gone into the woods to have a rest with "
        "friends of the forest that welcome them home tonight.",
    ),
    # 1: repeated lines + dominant 2-gram
    (
        1,
        "intro line stands first\nrepeat me now\nrepeat me now\n"
        "hot dog hot dog hot dog hot dog stand\nfinal line ends",
    ),
    # 2: bullets + ellipsis + symbols
    (
        2,
        "- first bullet\n- second bullet\nplain line here...\n"
        "hash ## tags # here\nshort tail…",
    ),
    # 3: repeated 5-gram run
    (
        3,
        "alpha beta gamma delta epsilon alpha beta gamma delta epsilon "
        "alpha beta gamma delta epsilon closing words here now",
    ),
    # 4: whitespace-only
    (4, "   \n  \n"),
    # 5: line whose index-digit chars could be eaten by the F.trim
    # arity bug (index 3 line ends in '3')
    (5, "l0\nl1\nl2\nrow 3\ntail"),
]


def _py_quality(text):
    ws = [w for w in re.split(r"\s+", text.strip()) if w]
    lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
    nw, nl = len(ws), len(lines)
    mean_wl = round(sum(len(w) for w in ws) / nw, 6) if nw else 0.0
    n_sym = text.count("#") + text.count("...") + text.count("…")
    symbol_ratio = round(n_sym / nw, 6) if nw else 0.0
    bullet = (
        round(
            sum(ln.startswith(("-", "*", "•")) for ln in lines) / nl, 6
        )
        if nl
        else 0.0
    )
    ell = (
        round(sum(ln.endswith(("...", "…")) for ln in lines) / nl, 6)
        if nl
        else 0.0
    )
    alpha = (
        round(sum(bool(re.search("[A-Za-z]", w)) for w in ws) / nw, 6)
        if nw
        else 0.0
    )
    lw = [w.lower() for w in ws]
    stop = sum(
        s in lw
        for s in ("the", "be", "to", "of", "and", "that", "have", "with")
    )
    return nw, mean_wl, symbol_ratio, bullet, ell, alpha, stop


def _py_repetition(text, top_ns=(2, 3, 4), dup_ns=(5, 6, 7, 8, 9, 10)):
    ws = [w for w in re.split(r"\s+", text.strip()) if w]
    lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
    nl = len(lines)
    lc = sum(len(ln) for ln in lines)
    c = Counter(lines)
    dup_line_frac = round((nl - len(c)) / nl, 6) if nl else 0.0
    dup_chars = sum((k - 1) * len(ln) for ln, k in c.items() if k > 1)
    dup_line_char_frac = round(dup_chars / lc, 6) if lc else 0.0
    tc = len(" ".join(ws))
    out = {
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
    }
    for n in top_ns:
        grams = Counter(
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        )
        if grams and tc:
            mx = max(grams.values())
            g = min(g for g, k in grams.items() if k == mx)
            out[f"top{n}gram_char_frac"] = round(mx * len(g) / tc, 6)
        else:
            out[f"top{n}gram_char_frac"] = 0.0
    for n in dup_ns:
        grams = Counter(
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        )
        d = sum((k - 1) * len(g) for g, k in grams.items() if k > 1)
        out[f"dup{n}gram_char_frac"] = round(d / tc, 6) if tc else 0.0
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_quality_matches_replica(spark, docs_df):
    rows = {r.doc_id: r for r in gopher_quality(docs_df).collect()}
    for did, text in DOCS:
        nw, mwl, sym, bul, ell, alpha, stop = _py_quality(text)
        r = rows[did]
        assert r.n_words == nw, did
        assert r.mean_word_len == pytest.approx(mwl, abs=1e-9), did
        assert r.symbol_ratio == pytest.approx(sym, abs=1e-9), did
        assert r.bullet_frac == pytest.approx(bul, abs=1e-9), did
        assert r.ellipsis_frac == pytest.approx(ell, abs=1e-9), did
        assert r.alpha_frac == pytest.approx(alpha, abs=1e-9), did
        assert r.stopword_hits == stop, did


def test_repetition_matches_replica(spark, docs_df):
    rows = {r.doc_id: r for r in gopher_repetition(docs_df).collect()}
    for did, text in DOCS:
        exp = _py_repetition(text)
        r = rows[did]
        for k, v in exp.items():
            assert getattr(r, k) == pytest.approx(v, abs=1e-9), (did, k)


def test_trim_arity_regression(spark):
    """Doc 5's 4th line is 'row 3' — under the F.transform(…, F.trim)
    arity bug the array index (3) became the trim-character set and
    ate the trailing '3'. Line char totals must be exact."""
    df = spark.createDataFrame([DOCS[5]], "doc_id long, text string")
    r = gopher_repetition(df).collect()[0]
    exp = _py_repetition(DOCS[5][1])
    assert r.dup_line_char_frac == pytest.approx(
        exp["dup_line_char_frac"], abs=1e-9
    )
    assert r.dup_line_frac == pytest.approx(exp["dup_line_frac"], abs=1e-9)


def test_keep_flags(spark, docs_df):
    out = {r.doc_id: r for r in gopher_filter(docs_df).collect()}
    # doc 0: 59 words ≥ 50, clean → passes quality; no repetition
    assert out[0].keep_quality and out[0].keep_repetition and out[0].keep
    # doc 1: dup lines 2/5 > 0.3 fails repetition; word count < 50
    # fails quality
    assert not out[1].keep_quality and not out[1].keep_repetition
    # doc 4: empty after trim → 0 words → fails quality, trivially
    # passes repetition
    assert not out[4].keep_quality and out[4].keep_repetition
    for did in out:
        assert out[did].keep == (
            out[did].keep_quality and out[did].keep_repetition
        )


def test_custom_ns_subset(spark, docs_df):
    out = gopher_repetition(docs_df, top_ns=(2,), dup_ns=(5,))
    assert "top2gram_char_frac" in out.columns
    assert "top3gram_char_frac" not in out.columns
    assert "dup6gram_char_frac" not in out.columns
    rows = {r.doc_id: r for r in out.collect()}
    exp = _py_repetition(DOCS[3][1], top_ns=(2,), dup_ns=(5,))
    assert rows[3].dup5gram_char_frac == pytest.approx(
        exp["dup5gram_char_frac"], abs=1e-9
    )
