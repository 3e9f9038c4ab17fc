"""Safe-cut guards (F6) + extended-shift fallback (F7) + two-phase
global slice numbering — reference semantics from
src/utils/tokenizer.py:250-978 (candidate classes, is_safe_cut_position,
find_safe_token_boundary_with_fallback)."""

from k2_18_spark import schemas
from k2_18_spark.pipeline.slicer import (
    _is_safe_cut,
    slice_documents,
    slice_text,
)


def test_url_never_split_when_window_sees_it():
    words = (
        ["tok"] * 95
        + ["see https://example.org/a/very/long/path/item?q=1&r=2 now"]
        + ["tok"] * 60
    )
    text = " ".join(words)
    slices = slice_text(text, max_tokens=100, soft_boundary_max_shift=6)
    url = "https://example.org/a/very/long/path/item?q=1&r=2"
    assert sum(1 for s in slices if url in s[0]) == 1
    # coverage invariant holds
    for prev, cur in zip(slices, slices[1:]):
        assert cur[1] == prev[2]


def test_code_block_not_cut_when_window_covers_fence():
    body = (
        ("alpha " * 90)
        + "\n```\ncode line one\ncode line two\n```\n"
        + ("beta " * 80)
    )
    slices = slice_text(body, max_tokens=100, soft_boundary_max_shift=30)
    for s in slices:
        assert s[0].count("```") % 2 == 0, s[0][-60:]


def test_markdown_link_not_cut():
    body = ("alpha " * 96) + "[a link with words](https://x.org/path) " + (
        "beta " * 60
    )
    slices = slice_text(body, max_tokens=100, soft_boundary_max_shift=10)
    for s in slices:
        assert s[0].count("[") == s[0].count("]"), s[0][-40:]


def test_is_safe_cut_checks():
    # mid-word
    assert not _is_safe_cut("abc", "def")
    assert _is_safe_cut("abc ", "def")
    # URL
    assert not _is_safe_cut("see https://x.org/a", "b/c more")
    # markdown link
    assert not _is_safe_cut("intro [label", "](https://x) tail")
    assert not _is_safe_cut("intro [label]", "(https://x) tail")
    # html tag
    assert not _is_safe_cut("text <div class='x'", "> more")
    # formula / code block parity
    assert not _is_safe_cut("cost is $x + ", "y$ dollars")
    assert not _is_safe_cut("code:\n```\nfoo ", "bar\n``` done")
    # table
    assert not _is_safe_cut("| a | b |\n|---|---|\n| 1 ", "| 2 |\n| 3 | 4 |\n")


def test_formula_not_cut_when_window_covers_opening_dollar():
    """$…$ span straddling the target: when the shift window includes
    the opening $, every in-formula position is unsafe (odd $ parity in
    the window prefix — reference is_inside_formula), so the cut lands
    outside and the formula stays within one slice. Like the reference,
    the guards are window-local: a window starting INSIDE the formula
    cannot see the opening $ and may cut it (documented divergence-free
    parity with tokenizer.py:364-559)."""
    body = ("word " * 92) + "$ " + ("sym " * 14) + "$ " + ("tail " * 80)
    slices = slice_text(body, max_tokens=100, soft_boundary_max_shift=30)
    assert sum(s[2] - s[1] for s in slices) == slices[-1][2]
    for prev, cur in zip(slices, slices[1:]):
        assert cur[1] == prev[2]
    assert sum(1 for s in slices if s[0].count("$") == 2) == 1
    assert all(s[0].count("$") in (0, 2) for s in slices)


def test_two_phase_numbering_matches_global_sort(spark):
    rows = [
        (f"https://x.org/doc{i:02d}", None, None, "para one. " * (50 + 17 * i), "en")
        for i in range(9)
    ]
    pages = spark.createDataFrame(rows, schemas.PAGES)
    got = (
        slice_documents(pages, max_tokens=40, soft_boundary_max_shift=8)
        .orderBy("order")
        .collect()
    )
    # orders are 1..N with ids formatted from them
    assert [r["order"] for r in got] == list(range(1, len(got) + 1))
    assert got[0]["id"] == "slice_001"
    # numbering follows (url, slice_index) lexicographic order exactly
    keys = [(r["source_file"], r["slice_token_start"]) for r in got]
    assert keys == sorted(keys)


def test_slice_documents_empty_input(spark):
    """Zero pages → zero slices (the two-phase numbering must not choke
    on an empty per-partition offset map)."""
    pages = spark.createDataFrame([], schemas.PAGES)
    assert slice_documents(pages).count() == 0
