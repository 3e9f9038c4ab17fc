"""Windowed document slicing (SURVEY.md F3–F7, §3.2).

Reference pipeline (src/slicer.py:255-398 + src/utils/tokenizer.py):
tokenize incrementally, cut windows of ``max_tokens`` with a
soft-boundary search of ±``soft_boundary_max_shift`` tokens choosing
the highest-priority safe cut (header > paragraph > sentence > line >
phrase > word), emit (text, token_start, token_end) per slice, global
sequential slice ids over files in lexicographic url order.

Tokenizer divergence (documented): the reference counts tiktoken
o200k_base tokens; tiktoken is unavailable here, so tokens are BPE-ish
regex tokens (alnum runs + single punctuation marks). Window/boundary
logic is semantics-faithful.

Spark realization: documents are independent → ``applyInPandas``
grouped by url (sequential within a document, parallel across
documents — exactly the parallelism the reference's issue analysis
says is safe, docs/issues/20260117-*:30-55). Slice numbering is a
deterministic ``row_number`` over (url, slice_index).
"""

from __future__ import annotations

import re


import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from k2_18_spark.functions.text import create_slug

TOKEN_RE = re.compile(r"[A-Za-z0-9_Ѐ-ӿ]+|[^\sA-Za-z0-9_Ѐ-ӿ]")

# boundary priorities, best first (reference tokenizer.py:250-360)
_BOUNDARY_PATTERNS = [
    re.compile(r"\n#{1,6} "),       # markdown header
    re.compile(r"\n\s*\n"),          # paragraph break
    re.compile(r"[.!?][)\"']?\s"),  # sentence end
    re.compile(r"\n"),               # line break
    re.compile(r"[,;:]\s"),          # phrase boundary
]


def _tokenize(text: str) -> list[tuple[int, int]]:
    """→ list of (start_char, end_char) per token."""
    return [(m.start(), m.end()) for m in TOKEN_RE.finditer(text)]


def slice_text(
    text: str,
    max_tokens: int = 15000,
    soft_boundary_max_shift: int = 500,
) -> list[tuple[str, int, int]]:
    """→ [(slice_text, token_start, token_end)] covering the document.

    token_end is exclusive. Boundary search scans the ±shift token
    window around the hard target and picks the best (priority,
    distance-to-target) cut; no candidate → hard cut at the target
    (reference extended-shift fallback simplified to the hard cut)."""
    tokens = _tokenize(text)
    n = len(tokens)
    if n == 0:
        return []
    out = []
    start = 0
    while start < n:
        target = start + max_tokens
        if target >= n:
            out.append((text[tokens[start][0]:], start, n))
            break
        lo = max(start + 1, target - soft_boundary_max_shift)
        hi = min(n - 1, target + soft_boundary_max_shift)
        # char window in which a boundary may end a slice: a cut at
        # token index k means the slice ends before tokens[k]
        cut = None
        best = None
        win_start_char = tokens[lo][0]
        win_end_char = tokens[hi][1]
        window_text = text[win_start_char:win_end_char]
        for prio, pat in enumerate(_BOUNDARY_PATTERNS):
            for m in pat.finditer(window_text):
                cut_char = win_start_char + m.end()
                # token index whose start >= cut_char
                k = _bisect_token(tokens, cut_char, lo, hi)
                if k is None or k <= start:
                    continue
                score = prio * 1000 + abs(k - target)
                if best is None or score < best:
                    best = score
                    cut = k
            if cut is not None:
                break  # higher priorities win outright
        if cut is None:
            cut = target  # hard cut
        out.append((text[tokens[start][0]:tokens[cut - 1][1]], start, cut))
        start = cut
    return out


def _bisect_token(tokens, cut_char: int, lo: int, hi: int) -> int | None:
    import bisect

    starts = [t[0] for t in tokens[lo : hi + 1]]
    i = bisect.bisect_left(starts, cut_char)
    k = lo + i
    if k < lo or k > hi:
        return None
    return k


SLICE_SCHEMA = (
    "source_file string, slug string, slice_index long, text string, "
    "slice_token_start long, slice_token_end long"
)


def slice_documents(
    pages: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    max_tokens: int = 15000,
    soft_boundary_max_shift: int = 500,
) -> DataFrame:
    """pages → slices table (reference schema, src/slicer.py:470-478).

    Output: (id, order, source_file, slug, text, slice_token_start,
    slice_token_end) with globally sequential ids in (url, slice)
    order — the deterministic equivalent of the reference's global
    counter over lexicographic file order."""

    def slice_group(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, row in pdf.iterrows():
            url = row[url_col]
            slug = create_slug(url)
            text = row[text_col] or ""
            for i, (stext, t0, t1) in enumerate(
                slice_text(text, max_tokens, soft_boundary_max_shift)
            ):
                rows.append((url, slug, i, stext, t0, t1))
        return pd.DataFrame(
            rows,
            columns=[
                "source_file",
                "slug",
                "slice_index",
                "text",
                "slice_token_start",
                "slice_token_end",
            ],
        )

    sliced = pages.select(url_col, text_col).groupBy(url_col).applyInPandas(
        slice_group, schema=SLICE_SCHEMA
    )
    w = Window.orderBy("source_file", "slice_index")
    return sliced.select(
        F.format_string("slice_%03d", F.row_number().over(w)).alias("id"),
        F.row_number().over(w).cast("long").alias("order"),
        "source_file",
        "slug",
        "text",
        "slice_token_start",
        "slice_token_end",
    )
