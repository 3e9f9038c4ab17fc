"""Windowed document slicing (SURVEY.md F3–F7, §3.2).

Reference pipeline (src/slicer.py:255-398 + src/utils/tokenizer.py):
tokenize incrementally, cut windows of ``max_tokens`` with a
soft-boundary search of ±``soft_boundary_max_shift`` tokens choosing
the best (priority, distance) SAFE cut, where safety mirrors
``is_safe_cut_position`` (src/utils/tokenizer.py:667-901): never cut
mid-word / URL / markdown link / HTML tag / $-formula / ```-code block
/ list / table. If no safe boundary exists in the window, the search
widens up to 30% of the window in steps of 10 tokens — forward first,
then backward — and finally forces a cut at target+shift
(``find_safe_token_boundary_with_fallback``, tokenizer.py:561-664).

Boundary candidate classes (find_boundary_candidates,
tokenizer.py:250-360), best first:
1 before HTML/markdown/text headers · 2 before subheaders, after
paragraphs, after code-block ends · 3 after sentences (abbreviation-
aware) · 4 after lines · 5 after phrases · 6 between words.

Tokenizer divergence (documented): the reference counts tiktoken
o200k_base tokens; tiktoken is unavailable here, so tokens are BPE-ish
regex tokens (alnum runs + single punctuation marks). Window/boundary
logic is semantics-faithful; like the reference, the safety counters
are window-local in the candidate stage and document-global in the
extended-shift stage.

Spark realization: documents are independent → ``applyInPandas``
grouped by url (sequential within a document, parallel across
documents — exactly the parallelism the reference's issue analysis
says is safe, docs/issues/20260117-*:30-55). Global slice numbering is
two-phase: per-url slice counts are range-partitioned by url and
turned into per-url offsets with one tiny driver aggregate over the
per-PARTITION totals — no single-task global sort over the slice table
(the |urls|-sized count table is the only thing ordered, in parallel
per range partition).
"""

from __future__ import annotations

import bisect
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from k2_18_spark.functions.text import create_slug

TOKEN_RE = re.compile(r"[A-Za-z0-9_Ѐ-ӿ]+|[^\sA-Za-z0-9_Ѐ-ӿ]")

# candidate classes — (priority, regex, cut at match END?) where a
# lookahead pattern cuts BEFORE the construct (reference
# tokenizer.py:283-360)
_CANDIDATE_CLASSES = [
    (1, re.compile(r"(?:^|\n)(?=<h[1-6][^>]*>)"), 0),
    (1, re.compile(r"(?:^|\n)(?=#{1,6}\s+)"), 0),
    (
        1,
        re.compile(
            r"(?:^|\n)(?=(?:Глава|Параграф|Часть|Chapter|Section|Раздел|Урок|Тема)\s+)",
            re.IGNORECASE,
        ),
        0,
    ),
    (2, re.compile(r"(?:^|\n)(?=#{2,4}\s+)"), 0),
    (2, re.compile(r"\n\n+"), 0),
    (2, re.compile(r"```\s*\n"), 0),
    (3, re.compile(r"[.!?]\s+"), 0),
    (4, re.compile(r"\n"), 0),
    (5, re.compile(r"[,;:]\s+"), 0),
    (6, re.compile(r"\s+"), 0),
]

_ABBREVS = (
    "Dr", "Mr", "Mrs", "Ms", "Prof", "St", "vs", "etc", "т.д", "т.п", "и.д", "и.п",
)

_URL_TAIL = re.compile(r"https?://[^\s\)>\]]*$")
_URL_HEAD = re.compile(r"^[^\s\)>\]]+")

_LIST_PATTERNS = [
    re.compile(p)
    for p in (
        r"^\d+\.\s+", r"^  \d+\.\s+", r"^  [a-z]\.\s+", r"^\t\d+\.\s+",
        r"^\t[a-z]\.\s+", r"^[-*+]\s+", r"^  [-*+]\s+", r"^\t[-*+]\s+",
        r"^•\s+", r"^  •\s+",
    )
]
_TABLE_SEP = re.compile(r"^\s*\|[\s\-:]+\|")
_TABLE_ROW = re.compile(r"^\s*\|.*\|")


def _tokenize(text: str) -> list[tuple[int, int]]:
    """→ list of (start_char, end_char) per token."""
    return [(m.start(), m.end()) for m in TOKEN_RE.finditer(text)]


# -- safe-cut guards (F6) — reference is_safe_cut_position ------------------


def _inside_url(before: str, after: str) -> bool:
    return bool(_URL_TAIL.search(before) and after and _URL_HEAD.match(after))


def _inside_markdown_link(before: str, after: str) -> bool:
    if before.count("[") - before.count("]") > 0:
        return True
    if before.endswith("]") and after.startswith("("):
        return True
    if "](h" in before[-10:] or (
        before.endswith("](") and before.count("(") - before.count(")") > 0
    ):
        return True
    return False


def _inside_list(before: str, after: str) -> bool:
    if not before or not after:
        return False
    lines_before = before.split("\n")[-3:]
    first_after = after.split("\n", 1)[0]
    for line in lines_before:
        if any(p.match(line) for p in _LIST_PATTERNS):
            if any(p.match(first_after) for p in _LIST_PATTERNS):
                return True
    return False


def _inside_table(before: str, after: str) -> bool:
    if not before or not after:
        return False
    lines_before = before.split("\n")[-5:]
    lines_after = after.split("\n")[:5]
    has_before = any(
        _TABLE_SEP.match(x) or _TABLE_ROW.match(x) for x in lines_before
    )
    has_after = any(
        _TABLE_SEP.match(x) or _TABLE_ROW.match(x) for x in lines_after
    )
    if has_before and has_after:
        return True
    html_before = before[-200:]
    return html_before.count("<table") - html_before.count("</table>") > 0


def _is_safe_cut(before: str, after: str) -> bool:
    """Reference is_safe_cut_position (tokenizer.py:667-727): all eight
    structure-integrity checks must pass."""
    if before and after and before[-1].isalnum() and after[0].isalnum():
        return False  # mid-word
    if _inside_url(before, after):
        return False
    if _inside_markdown_link(before, after):
        return False
    if before.rfind("<") > before.rfind(">"):
        return False  # inside HTML tag
    if before.count("$") % 2 == 1:
        return False  # inside $…$ formula
    if before.count("```") % 2 == 1:
        return False  # inside code block
    if _inside_list(before, after):
        return False
    if _inside_table(before, after):
        return False
    return True


def _boundary_quality(before: str) -> float:
    """Reference evaluate_boundary_quality (tokenizer.py:903-978):
    score for the no-candidate fallback scan, lower = better."""
    ctx = before[-50:]
    if re.search(r"</h[1-6]>\s*$", ctx, re.IGNORECASE):
        return 1.0
    if re.search(r"\n#{1,6}\s+.*$", ctx):
        return 1.0
    if re.search(r"\n(?:Глава|Chapter|Раздел)\s+.*$", ctx, re.IGNORECASE):
        return 1.0
    if ctx.endswith("\n\n"):
        return 5.0
    if re.search(r"[.!?]\s*$", ctx):
        return 10.0
    if ctx.endswith("\n"):
        return 15.0
    if re.search(r"[,;]\s*$", ctx):
        return 20.0
    if ctx.endswith(" "):
        return 50.0
    return 100.0


def _find_candidates(
    window: str, target_char: int, max_char_shift: int
) -> list[tuple[int, int]]:
    """→ [(char_pos, priority)] sorted by priority*1000 + char distance,
    top 50 (reference find_boundary_candidates, tokenizer.py:250-360)."""
    lo = max(0, target_char - max_char_shift)
    hi = min(len(window), target_char + max_char_shift)
    out = []
    for prio, pat, _ in _CANDIDATE_CLASSES:
        for m in pat.finditer(window):
            pos = m.end()
            if not (lo <= pos <= hi):
                continue
            if prio == 3 and window[max(0, m.start() - 10):m.start()].endswith(
                _ABBREVS
            ):
                continue
            out.append((prio * 1000 + abs(pos - target_char), pos, prio))
    out.sort()
    return [(pos, prio) for _, pos, prio in out[:50]]


def _find_boundary(
    text: str,
    tokens: list[tuple[int, int]],
    target: int,
    max_shift: int,
) -> tuple[int, str]:
    """Stage 1+2 of the reference search (find_safe_token_boundary,
    tokenizer.py:364-559): candidate scan, then all-positions fallback.
    → (token cut position, boundary_type)."""
    n = len(tokens)
    start_pos = max(0, target - max_shift)
    end_pos = min(n, target + max_shift)
    win0 = tokens[start_pos][0]
    win1 = tokens[end_pos][1] if end_pos < n else len(text)
    window = text[win0:win1]
    # local char offset of each cut position start_pos..end_pos (a cut at
    # k falls BEFORE token k; k == n is the end of the document)
    cut_chars = [
        (tokens[k][0] - win0) if k < n else len(window)
        for k in range(start_pos, end_pos + 1)
    ]
    target_char = cut_chars[target - start_pos]

    best_pos, best_score, best_type = target, float("inf"), "none"
    for char_pos, prio in _find_candidates(window, target_char, max_shift * 4):
        # snap to the nearest token cut (reference nearest-boundary walk)
        i = bisect.bisect_left(cut_chars, char_pos)
        if i >= len(cut_chars):
            i = len(cut_chars) - 1
        elif i > 0 and (cut_chars[i] - char_pos) > (char_pos - cut_chars[i - 1]):
            i -= 1
        k = start_pos + i
        if abs(k - target) > max_shift:
            continue
        before, after = window[: cut_chars[i]], window[cut_chars[i]:]
        if not _is_safe_cut(before, after):
            continue
        score = prio * 1000 + abs(k - target)
        if score < best_score:
            best_score, best_pos, best_type = score, k, "candidate"
    if best_type != "none":
        return best_pos, best_type

    # all-positions fallback within the window
    for i, cc in enumerate(cut_chars):
        k = start_pos + i
        if abs(k - target) > max_shift:
            continue
        before, after = window[:cc], window[cc:]
        if not _is_safe_cut(before, after):
            continue
        score = _boundary_quality(before) + abs(k - target) * 0.1
        if score < best_score:
            best_score, best_pos, best_type = score, k, "fallback"
    return best_pos, best_type


def _find_boundary_with_fallback(
    text: str,
    tokens: list[tuple[int, int]],
    target: int,
    max_shift: int,
    max_tokens: int,
) -> int:
    """Stage 3: extended shift up to 30% of the window in steps of 10 —
    forward then backward, document-global safety — else force the cut
    at target+shift (reference tokenizer.py:561-664)."""
    n = len(tokens)
    best_pos, best_type = _find_boundary(text, tokens, target, max_shift)
    if best_type != "none":
        return best_pos

    def full_safe(k: int) -> bool:
        c = tokens[k][0] if k < n else len(text)
        return _is_safe_cut(text[:c], text[c:])

    extended = int(max_tokens * 0.3)
    for offset in range(max_shift + 1, extended, 10):
        k = min(n, target + offset)
        if k < n and full_safe(k):
            return k
    for offset in range(max_shift + 1, extended, 10):
        k = max(0, target - offset)
        if k > 0 and full_safe(k):
            return k
    return min(n, target + max_shift)


def slice_text(
    text: str,
    max_tokens: int = 15000,
    soft_boundary_max_shift: int = 500,
) -> list[tuple[str, int, int]]:
    """→ [(slice_text, token_start, token_end)] covering the document.

    token_end is exclusive. Mirrors the reference window loop
    (src/slicer.py:255-398) over regex tokens."""
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
        cut = _find_boundary_with_fallback(
            text, tokens, target, soft_boundary_max_shift, max_tokens
        )
        cut = max(cut, start + 1)
        if cut >= n:
            out.append((text[tokens[start][0]:], start, n))
            break
        out.append((text[tokens[start][0]:tokens[cut - 1][1]], start, cut))
        start = cut
    return out


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
    offsets = _url_offsets(sliced)
    return (
        sliced.join(offsets, "source_file")
        .select(
            F.format_string(
                "slice_%03d", (F.col("offset") + F.col("slice_index") + 1)
            ).alias("id"),
            (F.col("offset") + F.col("slice_index") + 1).cast("long").alias("order"),
            "source_file",
            "slug",
            "text",
            "slice_token_start",
            "slice_token_end",
        )
    )


def _url_offsets(sliced: DataFrame) -> DataFrame:
    """Two-phase global numbering: → (source_file, offset) where offset
    is the number of slices in all lexicographically-earlier urls.

    Phase 1: per-url counts, range-partitioned and cumulated PER
    PARTITION (parallel windows). Phase 2: one driver aggregate over
    the per-partition totals (numPartitions rows) broadcast back as
    partition offsets. No single-task sort ever touches a table bigger
    than the distinct-url count / partition."""
    counts = (
        sliced.groupBy("source_file")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .repartitionByRange("source_file")
        .withColumn("pid", F.spark_partition_id())
    )
    # eager localCheckpoint, not persist: correctness depends on the pid
    # assignment surviving until the downstream join — a recompute after
    # executor loss would re-sample repartitionByRange boundaries and
    # silently shift per-partition offsets (same guard as dense_vertex_ids)
    counts = counts.localCheckpoint(eager=True)
    part_totals = (
        counts.groupBy("pid").agg(F.sum("cnt").alias("tot")).collect()
    )
    running, part_offset = 0, {}
    for r in sorted(part_totals, key=lambda r: r["pid"]):
        part_offset[r["pid"]] = running
        running += r["tot"]
    w = (
        Window.partitionBy("pid")
        .orderBy("source_file")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = F.coalesce(F.sum("cnt").over(w), F.lit(0))
    # zero-arg create_map() can't be indexed by an int key (void map)
    if part_offset:
        mapping = F.create_map(
            *[F.lit(x) for kv in part_offset.items() for x in kv]
        )
    else:
        mapping = F.lit(None).cast("map<int,long>")
    offsets = counts.select(
        "source_file",
        (base + F.coalesce(mapping[F.col("pid")], F.lit(0)))
        .cast("long")
        .alias("offset"),
    ).localCheckpoint(eager=True)
    counts.unpersist()  # offsets is materialized; drop the pid blocks
    return offsets
