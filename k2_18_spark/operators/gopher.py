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

Scale shape: quality is pure codegen column expressions (split +
higher-order filter/aggregate — zero shuffles, zero Python).
Repetition builds every n-gram size in ONE pass — the word array is
transformed per n and the structs concatenated, so the text is
exploded once — then ONE groupBy on ``(doc_id, n, gram)`` with
map-side partial counts (repeats collapse before the shuffle; that is
the hot path at 100 TB where repetition is precisely what's common),
and a per-doc rollup that Catalyst keeps in the same hash
partitioning chain. No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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


def _words(text_col: str) -> Column:
    """Whitespace tokens of the trimmed text (no empty tokens)."""
    return F.filter(
        F.split(F.trim(F.col(text_col)), "\\s+"), lambda w: w != ""
    )


def _lines(text_col: str) -> Column:
    """Trimmed non-blank lines.

    The trim MUST be a one-arg lambda: ``F.trim`` itself has an
    optional second parameter (the trim-character set), so passing it
    to ``F.transform`` binds the (element, index) form and the array
    index becomes the set of characters to strip.
    """
    return F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != "",
    )


def gopher_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **thresholds,
) -> DataFrame:
    """Scalar quality gates → (id, n_words, mean_word_len,
    symbol_ratio, bullet_frac, ellipsis_frac, alpha_frac,
    stopword_hits, keep_quality). Pure codegen, no shuffle."""
    t = {**QUALITY_DEFAULTS, **thresholds}
    w = _words(text_col)
    lines = _lines(text_col)
    n_words = F.size(w)
    n_lines = F.size(lines)
    word_chars = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_wl = F.when(n_words > 0, F.round(word_chars / n_words, 6)).otherwise(
        F.lit(0.0)
    )
    n_hash = F.length(F.col(text_col)) - F.length(
        F.replace(F.col(text_col), F.lit("#"), F.lit(""))
    )
    # ellipsis occurrences: count non-overlapping '...' plus '…'
    n_ell = (
        F.floor(
            (
                F.length(F.col(text_col))
                - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
            )
            / 3
        )
        + F.length(F.col(text_col))
        - F.length(F.replace(F.col(text_col), F.lit("…"), F.lit("")))
    )
    symbol_ratio = F.when(
        n_words > 0, F.round((n_hash + n_ell) / n_words, 6)
    ).otherwise(F.lit(0.0))
    bullets = F.size(
        F.filter(
            lines,
            lambda ln: ln.startswith("-")
            | ln.startswith("*")
            | ln.startswith("•"),
        )
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda ln: ln.endswith("...") | ln.endswith("…"))
    )
    bullet_frac = F.when(
        n_lines > 0, F.round(bullets / n_lines, 6)
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0, F.round(ellipsis_lines / n_lines, 6)
    ).otherwise(F.lit(0.0))
    alpha_words = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
    alpha_frac = F.when(
        n_words > 0, F.round(alpha_words / n_words, 6)
    ).otherwise(F.lit(0.0))
    lw = F.transform(w, F.lower)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in STOPWORDS]),
            lambda s: F.array_contains(lw, s),
        )
    )
    out = docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.cast("long").alias("stopword_hits"),
    )
    keep = (
        (F.col("n_words") >= t["min_words"])
        & (F.col("n_words") <= t["max_words"])
        & (F.col("mean_word_len") >= t["min_mean_word_len"])
        & (F.col("mean_word_len") <= t["max_mean_word_len"])
        & (F.col("symbol_ratio") <= t["max_symbol_ratio"])
        & (F.col("bullet_frac") <= t["max_bullet_frac"])
        & (F.col("ellipsis_frac") <= t["max_ellipsis_frac"])
        & (F.col("alpha_frac") >= t["min_alpha_frac"])
        & (F.col("stopword_hits") >= t["min_stopword_hits"])
    )
    return out.withColumn("keep_quality", keep)


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

    One explode of all n-gram sizes + one (doc, n, gram) groupBy with
    map-side combine; line stats ride along codegen-side.
    """
    t = {**REPETITION_DEFAULTS, **thresholds}
    lines = _lines(text_col)
    n_lines = F.size(lines)
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    # per-doc line stats without a shuffle: aggregate over the
    # distinct lines, summing (count-1)*len via two passes of the
    # array — O(L·distinct) comparisons per doc, fine at ~10² lines;
    # the n-gram path below is the one that must (and does) shuffle.
    dlines = F.array_distinct(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        F.round((n_lines - F.size(dlines)) / n_lines, 6),
    ).otherwise(F.lit(0.0))
    dup_line_chars = F.aggregate(
        dlines,
        F.lit(0).cast("long"),
        lambda acc, d: acc
        + (
            F.size(F.filter(lines, lambda ln: ln == d)) - F.lit(1)
        )
        * F.length(d),
    )
    dup_line_char_frac = F.when(
        line_chars > 0, F.round(dup_line_chars / line_chars, 6)
    ).otherwise(F.lit(0.0))

    base = docs.select(
        F.col(id_col).alias("_id"),
        _words(text_col).alias("w"),
        dup_line_frac.alias("dup_line_frac"),
        dup_line_char_frac.alias("dup_line_char_frac"),
    )
    # total chars basis for the n-gram fractions: the words joined by
    # single spaces (whitespace-normalized text length) — identical in
    # the SQL oracle
    base = base.withColumn(
        "text_chars", F.length(F.array_join("w", " ")).cast("long")
    )

    all_ns = sorted(set(top_ns) | set(dup_ns))

    def _gram_fn(n: int):
        # one-arg lambda via a factory: a `lambda i, n=n` default-arg
        # closure has ARITY 2, which F.transform silently binds as its
        # (element, index) form — n would become the array index
        return lambda i: F.struct(
            F.lit(n).alias("n"),
            F.array_join(F.slice("w", i + 1, n), " ").alias("gram"),
        )

    gram_arrays = [
        F.when(
            F.size("w") >= n,
            F.transform(F.sequence(F.lit(0), F.size("w") - n), _gram_fn(n)),
        ).otherwise(F.array().cast("array<struct<n:int,gram:string>>"))
        for n in all_ns
    ]
    grams = base.select(
        "_id", F.explode(F.concat(*gram_arrays)).alias("g")
    ).select("_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    counts = grams.groupBy("_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = counts.groupBy("_id").agg(
        # top gram per n: max count, lexicographically-smallest gram
        # on ties — min(struct(-c, gram)) orders by count desc then
        # gram asc in ONE aggregate, no second pass over the counts
        *[
            F.min(
                F.when(
                    F.col("n") == n,
                    F.struct(
                        (-F.col("c")).alias("negc"),
                        F.col("gram").alias("gram"),
                    ),
                )
            ).alias(f"_pick{n}")
            for n in top_ns
        ],
        *[
            F.sum(
                F.when(
                    (F.col("n") == n) & (F.col("c") > 1),
                    (F.col("c") - 1) * F.length("gram"),
                ).otherwise(F.lit(0))
            ).alias(f"_dup{n}_chars")
            for n in dup_ns
        ],
    )
    out = base.join(per_doc, "_id", "left")
    cols = [
        F.col("_id"),
        F.col("dup_line_frac"),
        F.col("dup_line_char_frac"),
    ]
    for n in top_ns:
        cols.append(
            F.when(
                F.col("text_chars") > 0,
                F.round(
                    F.coalesce(
                        (-F.col(f"_pick{n}.negc"))
                        * F.length(F.col(f"_pick{n}.gram")),
                        F.lit(0),
                    )
                    / F.col("text_chars"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias(f"top{n}gram_char_frac")
        )
    for n in dup_ns:
        cols.append(
            F.when(
                F.col("text_chars") > 0,
                F.round(
                    F.coalesce(F.col(f"_dup{n}_chars"), F.lit(0))
                    / F.col("text_chars"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias(f"dup{n}gram_char_frac")
        )
    out = out.select(*cols).withColumnRenamed("_id", id_col)
    keep: Column = (
        F.col("dup_line_frac") <= t["max_dup_line_frac"]
    ) & (F.col("dup_line_char_frac") <= t["max_dup_line_char_frac"])
    for n in top_ns:
        keep = keep & (
            F.col(f"top{n}gram_char_frac")
            <= t["max_top_ngram_char_frac"][n]
        )
    for n in dup_ns:
        keep = keep & (
            F.col(f"dup{n}gram_char_frac")
            <= t["max_dup_ngram_char_frac"][n]
        )
    return out.withColumn("keep_repetition", keep)


def gopher_filter(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Combined Gopher gate → quality ⋈ repetition + ``keep``."""
    q = gopher_quality(docs, id_col, text_col)
    r = gopher_repetition(docs, id_col, text_col)
    return q.join(r, id_col).withColumn(
        "keep", F.col("keep_quality") & F.col("keep_repetition")
    )
