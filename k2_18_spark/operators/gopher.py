"""Gopher-style document quality + repetition filters.

The second canonical web-corpus rule set next to C4
(operators/c4_filters.py): Gopher (Rae et al. 2021, "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", §A1.1)
keeps a document only if it passes (a) scalar quality gates — word
count, mean word length, symbol ratios, bullet/ellipsis line
fractions, alphabetic-word fraction, stop-word hits — and (b)
repetition gates — duplicate-line fractions and the character mass of
over-represented word n-grams. The reference has no corpus-filter
surface; this is a web-scale addition over ``documents``-shaped rows.

Semantics here are deterministic, well-defined variants of the
published rules (the paper does not pin tie-breaks or overlap
counting; implementations differ — e.g. DataTrove marks character
positions for duplicate n-grams, which is not order-independent in a
distributed engine):

quality (``gopher_quality``):
- ``n_words`` over ``\\s+`` tokens of the trimmed text;
- ``mean_word_len`` = total token chars / tokens;
- ``symbol_ratio`` = (# of ``#`` or ellipsis tokens-or-suffixes) /
  words — here: count of ``#`` chars + count of ``...``/``…``
  occurrences, over words;
- ``bullet_frac`` / ``ellipsis_frac``: fraction of non-blank lines
  starting with a bullet (``-``, ``*``, ``•``) / ending with an
  ellipsis;
- ``alpha_frac``: fraction of words containing ≥1 ASCII letter;
- ``stopword_hits``: how many of the 8 Gopher stop words (the, be,
  to, of, and, that, have, with) occur as lowercase tokens.

repetition (``gopher_repetition``):
- ``dup_line_frac`` = (lines − distinct lines) / lines over trimmed
  non-blank lines;
- ``dup_line_char_frac`` = chars in occurrences beyond each line's
  first / total line chars;
- ``top{2,3,4}gram_char_frac`` = count(top n-gram) · len(top n-gram)
  / total text chars, top = max count with lexicographically-smallest
  tie-break;
- ``dup{5..10}gram_char_frac`` = Σ over n-grams seen k>1 times of
  (k−1)·len(n-gram) / total text chars.

``keep`` applies the published thresholds (parameterized).

Scale shape (r6 rework, optimization guide §4.2): the whole pass is
per-document — ZERO shuffles are fundamentally required — so both
gates run as ONE Arrow-batched ``mapInPandas`` over (id, text), with
the n-gram counting in CPython ``Counter``s instead of Catalyst
higher-order functions. Measured motivation: the r5 plan exploded
~9 n-gram sizes × |words| rows per doc and shuffled them through a
(doc, n, gram) groupBy (309 MB, 17-30 s at the sf0.1 bench); an
intermediate all-codegen rewrite (array_sort + run-length folds,
exchange-free) still spent its time in interpreted HOF evaluation
(~5.2 s/20k docs on 8 cores). Per guide §4.2 the batch-Python tier
wins when JVM per-row expression work is the bottleneck; only
(id, text) crosses the Arrow boundary, and heavy init is none.

Float parity contract (the DuckDB oracle hashes these doubles): every
fraction is ``round(int_numerator / int_denominator, 6)`` — the
division is one IEEE-754 double op (identical in Java/Python/DuckDB)
and the rounding replicates Spark's ``F.round`` (BigDecimal HALF_UP
over the shortest round-trip decimal representation) via
``Decimal(repr(x)).quantize(..., ROUND_HALF_UP)``.
"""

from __future__ import annotations

import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal
from typing import Iterator

from pyspark.sql import DataFrame

STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: published Gopher thresholds (§A1.1)
QUALITY_DEFAULTS = dict(
    min_words=50,
    max_words=100_000,
    min_mean_word_len=3.0,
    max_mean_word_len=10.0,
    max_symbol_ratio=0.1,
    max_bullet_frac=0.9,
    max_ellipsis_frac=0.3,
    min_alpha_frac=0.8,
    min_stopword_hits=2,
)
REPETITION_DEFAULTS = dict(
    max_dup_line_frac=0.3,
    max_dup_line_char_frac=0.2,
    max_top_ngram_char_frac={2: 0.2, 3: 0.18, 4: 0.16},
    max_dup_ngram_char_frac={
        5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10
    },
)

# Java \s is ASCII-only — match it exactly (Python \s is unicode-aware
# by default); Spark's trim()/F.trim strips 0x20 spaces only
_WS = re.compile(r"\s+", re.ASCII)
_ALPHA = re.compile(r"[A-Za-z]", re.ASCII)
_SIX = Decimal("0.000001")


def _round6(x: float) -> float:
    """Spark F.round(col, 6) parity: HALF_UP on the shortest
    round-trip decimal repr (Java BigDecimal.valueOf semantics)."""
    return float(Decimal(repr(x)).quantize(_SIX, rounding=ROUND_HALF_UP))


def _words(text: str) -> list[str]:
    return [w for w in _WS.split(text.strip(" ")) if w]


def _lines(text: str) -> list[str]:
    return [s for s in (ln.strip(" ") for ln in text.split("\n")) if s]


def _quality_stats(text: str) -> tuple:
    ws = _words(text)
    lines = _lines(text)
    nw, nl = len(ws), len(lines)
    word_chars = sum(len(w) for w in ws)
    mean_wl = _round6(word_chars / nw) if nw else 0.0
    n_sym = (
        text.count("#") + text.count("...") + text.count("…")
    )
    symbol_ratio = _round6(n_sym / nw) if nw else 0.0
    bullets = sum(ln.startswith(("-", "*", "•")) for ln in lines)
    ell_lines = sum(ln.endswith(("...", "…")) for ln in lines)
    bullet_frac = _round6(bullets / nl) if nl else 0.0
    ellipsis_frac = _round6(ell_lines / nl) if nl else 0.0
    alpha = sum(1 for w in ws if _ALPHA.search(w))
    alpha_frac = _round6(alpha / nw) if nw else 0.0
    lw = set(w.lower() for w in ws)
    stop_hits = sum(s in lw for s in STOPWORDS)
    return (
        nw, mean_wl, symbol_ratio, bullet_frac, ellipsis_frac,
        alpha_frac, stop_hits,
    )


def _quality_keep(row: tuple, t: dict) -> bool:
    nw, mwl, sym, bul, ell, alpha, stop = row
    return (
        t["min_words"] <= nw <= t["max_words"]
        and t["min_mean_word_len"] <= mwl <= t["max_mean_word_len"]
        and sym <= t["max_symbol_ratio"]
        and bul <= t["max_bullet_frac"]
        and ell <= t["max_ellipsis_frac"]
        and alpha >= t["min_alpha_frac"]
        and stop >= t["min_stopword_hits"]
    )


def _repetition_stats(text: str, top_ns: tuple, dup_ns: tuple) -> list:
    ws = _words(text)
    lines = _lines(text)
    nl = len(lines)
    lc = sum(len(ln) for ln in lines)
    c = Counter(lines)
    dup_line_frac = _round6((nl - len(c)) / nl) if nl else 0.0
    dup_chars = sum((k - 1) * len(ln) for ln, k in c.items() if k > 1)
    dup_line_char_frac = _round6(dup_chars / lc) if lc else 0.0
    # text_chars basis = whitespace-normalized join length (see module
    # doc); computed arithmetically to skip building the joined string
    tc = sum(len(w) for w in ws) + max(len(ws) - 1, 0) if ws else 0
    out = [dup_line_frac, dup_line_char_frac]
    nw = len(ws)
    all_ns = sorted(set(top_ns) | set(dup_ns))
    grams_by_n: dict[int, Counter] = {}
    for n in all_ns:
        grams_by_n[n] = Counter(
            " ".join(ws[i : i + n]) for i in range(nw - n + 1)
        )
    for n in top_ns:
        grams = grams_by_n[n]
        if grams and tc:
            mx = max(grams.values())
            g = min(g for g, k in grams.items() if k == mx)
            out.append(_round6(mx * len(g) / tc))
        else:
            out.append(0.0)
    for n in dup_ns:
        if tc:
            d = sum(
                (k - 1) * len(g)
                for g, k in grams_by_n[n].items()
                if k > 1
            )
            out.append(_round6(d / tc))
        else:
            out.append(0.0)
    return out


def _rep_keep(vals: list, top_ns: tuple, dup_ns: tuple, t: dict) -> bool:
    i = 0
    ok = (
        vals[i] <= t["max_dup_line_frac"]
        and vals[i + 1] <= t["max_dup_line_char_frac"]
    )
    i = 2
    for n in top_ns:
        ok = ok and vals[i] <= t["max_top_ngram_char_frac"][n]
        i += 1
    for n in dup_ns:
        ok = ok and vals[i] <= t["max_dup_ngram_char_frac"][n]
        i += 1
    return ok


def _quality_schema(id_decl: str) -> str:
    return (
        f"{id_decl}, n_words bigint, mean_word_len double, "
        "symbol_ratio double, bullet_frac double, ellipsis_frac double, "
        "alpha_frac double, stopword_hits bigint, keep_quality boolean"
    )


def _rep_schema(id_decl: str, top_ns: tuple, dup_ns: tuple) -> str:
    cols = ["dup_line_frac double", "dup_line_char_frac double"]
    cols += [f"top{n}gram_char_frac double" for n in top_ns]
    cols += [f"dup{n}gram_char_frac double" for n in dup_ns]
    return f"{id_decl}, " + ", ".join(cols) + ", keep_repetition boolean"


def _id_decl(docs: DataFrame, id_col: str) -> str:
    return f"`{id_col}` {docs.schema[id_col].dataType.simpleString()}"


def gopher_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **thresholds,
) -> DataFrame:
    """Scalar quality gates → (id, n_words, mean_word_len,
    symbol_ratio, bullet_frac, ellipsis_frac, alpha_frac,
    stopword_hits, keep_quality). One Arrow-batched scan, no shuffle."""
    t = {**QUALITY_DEFAULTS, **thresholds}

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                q = _quality_stats(text or "")
                rows.append((did, *q, _quality_keep(q, t)))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_words", "mean_word_len", "symbol_ratio",
                    "bullet_frac", "ellipsis_frac", "alpha_frac",
                    "stopword_hits", "keep_quality",
                ],
            )

    return docs.select(id_col, text_col).mapInPandas(
        fn, _quality_schema(_id_decl(docs, id_col))
    )


def gopher_repetition(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6, 7, 8, 9, 10),
    **thresholds,
) -> DataFrame:
    """Repetition gates → (id, dup_line_frac, dup_line_char_frac,
    top{n}gram_char_frac…, dup{n}gram_char_frac…, keep_repetition).
    One Arrow-batched scan, no shuffle (see module doc)."""
    t = {**REPETITION_DEFAULTS, **thresholds}
    top_ns = tuple(top_ns)
    dup_ns = tuple(dup_ns)
    rep_cols = (
        ["dup_line_frac", "dup_line_char_frac"]
        + [f"top{n}gram_char_frac" for n in top_ns]
        + [f"dup{n}gram_char_frac" for n in dup_ns]
    )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                vals = _repetition_stats(text or "", top_ns, dup_ns)
                rows.append(
                    (did, *vals, _rep_keep(vals, top_ns, dup_ns, t))
                )
            yield pd.DataFrame(
                rows, columns=[id_col, *rep_cols, "keep_repetition"]
            )

    return docs.select(id_col, text_col).mapInPandas(
        fn, _rep_schema(_id_decl(docs, id_col), top_ns, dup_ns)
    )


def gopher_filter(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Combined Gopher gate — quality + repetition + ``keep`` in ONE
    Arrow-batched pass (the r5 plan computed two full scans and joined
    them back on the id; per-doc stats need neither the join nor its
    exchanges — guide §2.4)."""
    tq = dict(QUALITY_DEFAULTS)
    tr = dict(REPETITION_DEFAULTS)
    top_ns = (2, 3, 4)
    dup_ns = (5, 6, 7, 8, 9, 10)
    rep_cols = (
        ["dup_line_frac", "dup_line_char_frac"]
        + [f"top{n}gram_char_frac" for n in top_ns]
        + [f"dup{n}gram_char_frac" for n in dup_ns]
    )
    q_schema = _quality_schema(_id_decl(docs, id_col))
    r_cols = _rep_schema("x int", top_ns, dup_ns).split(", ", 1)[1]
    schema = f"{q_schema}, {r_cols}, keep boolean"

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                q = _quality_stats(text)
                kq = _quality_keep(q, tq)
                vals = _repetition_stats(text, top_ns, dup_ns)
                kr = _rep_keep(vals, top_ns, dup_ns, tr)
                rows.append((did, *q, kq, *vals, kr, kq and kr))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_words", "mean_word_len", "symbol_ratio",
                    "bullet_frac", "ellipsis_frac", "alpha_frac",
                    "stopword_hits", "keep_quality", *rep_cols,
                    "keep_repetition", "keep",
                ],
            )

    return docs.select(id_col, text_col).mapInPandas(fn, schema)
