"""Text-analysis operators over a documents table (SURVEY.md §2.8 +
training-data-pipeline additions): language-ID heuristic, quality
scoring, token counting, fingerprinting.

All pure built-in column expressions — JVM-side, whole-stage codegen,
zero Python in the hot path. Each has an exact ANSI-SQL oracle (see
__spark_entry__.oracle_sql)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny marker-word sets per language for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "que"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
}

TOKEN_REGEX = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"  # BPE-ish: words + punct marks
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def _tokens(text: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def _count_word(text: Column, word: str) -> Column:
    """Occurrences of ``word`` as a whitespace-delimited token."""
    return F.size(F.filter(_tokens(text), lambda t: t == F.lit(word)))


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: alnum runs + individual punctuation marks.

    Stands in for the reference's tiktoken o200k_base counter
    (src/utils/tokenizer.py:14-35 — tiktoken is unavailable in this
    environment; divergence documented)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    quality features + a composite score."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_stop = sum((_count_word(t, w) for w in STOPWORDS), F.lit(0))
    tok_len_sum = F.aggregate(
        _tokens(t), F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(tok_len_sum / F.greatest(n_tokens, F.lit(1)), 6).alias("mean_word_len"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language guess: argmax language by marker-token
    count, ties and all-zero → 'und'."""
    t = F.col(text_col)
    scores = [
        sum((_count_word(t, w) for w in words), F.lit(0)).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]
    scored = docs.select("doc_id", *scores)
    langs = list(LANG_MARKERS)
    best_score = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    guess = F.lit("und")
    # first language (in fixed order) achieving the max, if max > 0
    for lang in reversed(langs):
        guess = F.when(
            (F.col(f"score_{lang}") == best_score) & (best_score > 0), F.lit(lang)
        ).otherwise(guess)
    return scored.select(
        "doc_id", *[F.col(f"score_{lang}") for lang in langs], guess.alias("lang_guess")
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the lowercased,
    whitespace-normalized text (portable across engines)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))
