"""Text extraction / slug / decode UDFs (SURVEY.md F1, F2, S2).

Reference behaviors (src/slicer.py):
- ``preprocess_text`` (:163-203): NFC normalize; if a ``<script`` or
  ``<style`` marker is present (case-insensitive), remove those
  elements INCLUDING content; otherwise pass through unchanged.
- encoding fallback (:230-241): utf-8 → cp1251 → latin1.
- ``create_slug`` (:120-160): strip extension → transliterate →
  lower → spaces/dots → ``_``.

Environment note: the reference uses BeautifulSoup(html.parser) and
unidecode; neither library exists in this sandbox, so removal is
implemented as *span-cutting* over the original string via the stdlib
html.parser — every byte outside the removed script/style elements is
preserved exactly (bs4 re-serialization quirks on malformed HTML, e.g.
auto-closing unclosed tags, are NOT replicated; divergence documented
in SURVEY §7). Transliteration covers the Cyrillic table the reference
corpus exercises + NFKD accent folding.

All entry points are vectorized pandas UDFs (input_hint: no per-row
Python at the DataFrame API level — the Python logic runs once per
Arrow batch).
"""

from __future__ import annotations

import re
import unicodedata
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_MARKER_RE = re.compile(r"<script|<style", re.IGNORECASE)


class _SpanCollector(HTMLParser):
    """Record absolute [start, end) spans of script/style elements."""

    def __init__(self, text: str):
        super().__init__(convert_charrefs=False)
        self.text = text
        self.spans: list[tuple[int, int]] = []
        self._stack: list[int] = []
        # line-start offsets for getpos() → absolute offset conversion
        self._line_starts = [0]
        for m in re.finditer("\n", text):
            self._line_starts.append(m.end())

    def _abs(self) -> int:
        line, col = self.getpos()
        return self._line_starts[line - 1] + col

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in ("script", "style"):
            self._stack.append(self._abs())

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in ("script", "style"):
            start = self._abs()
            end = self.text.find(">", start)
            self.spans.append((start, end + 1 if end != -1 else len(self.text)))

    def handle_endtag(self, tag: str) -> None:
        if tag in ("script", "style") and self._stack:
            start = self._stack.pop()
            if not self._stack:  # outermost close wins for nested tags
                gt = self.text.find(">", self._abs())
                end = gt + 1 if gt != -1 else len(self.text)
                self.spans.append((start, end))

    def close(self) -> None:
        super().close()
        while self._stack:  # unclosed script/style runs to EOF
            self.spans.append((self._stack.pop(), len(self.text)))


def preprocess_text(text: str) -> str:
    """NFC + script/style removal (reference src/slicer.py:163-203)."""
    if not isinstance(text, str):
        raise ValueError("Input parameter must be a string")
    normalized = unicodedata.normalize("NFC", text)
    if not _MARKER_RE.search(normalized):
        return normalized
    parser = _SpanCollector(normalized)
    try:
        parser.feed(normalized)
        parser.close()
    except Exception:
        return normalized  # unparseable → pass through
    if not parser.spans:
        return normalized
    spans = sorted(parser.spans)
    out = []
    cursor = 0
    for start, end in spans:
        if start >= cursor:
            out.append(normalized[cursor:start])
            cursor = max(cursor, end)
        else:
            cursor = max(cursor, end)
    out.append(normalized[cursor:])
    return "".join(out)


def decode_bytes(raw: bytes | None) -> str | None:
    """utf-8 → cp1251 → latin1 decode chain (src/slicer.py:230-241)."""
    if raw is None:
        return None
    for enc in ("utf-8", "cp1251"):
        try:
            return raw.decode(enc)
        except UnicodeDecodeError:
            continue
    return raw.decode("latin1")


# Cyrillic → Latin transliteration (GOST-ish, matches unidecode for the
# characters in the reference corpus).
_CYR = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "e",
    "ж": "zh", "з": "z", "и": "i", "й": "i", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "kh", "ц": "ts", "ч": "ch", "ш": "sh", "щ": "shch",
    "ъ": "", "ы": "y", "ь": "", "э": "e", "ю": "iu", "я": "ia",
}


def _translit(s: str) -> str:
    out = []
    for ch in s:
        low = ch.lower()
        if low in _CYR:
            t = _CYR[low]
            out.append(t.capitalize() if ch.isupper() and t else t)
        elif ord(ch) < 128:
            out.append(ch)
        else:
            # NFKD accent folding for Latin-ish characters
            folded = unicodedata.normalize("NFKD", ch)
            out.append("".join(c for c in folded if ord(c) < 128))
    return "".join(out)


def create_slug(filename: str) -> str:
    """Reference src/slicer.py:120-160 semantics."""
    name = filename.rsplit("/", 1)[-1]
    if "." in name:
        name = name.rsplit(".", 1)[0]
    return _translit(name).lower().replace(" ", "_").replace(".", "_")


# -- pandas UDFs --------------------------------------------------------------

@F.pandas_udf(StringType())
def preprocess_text_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: preprocess_text(t) if t is not None else None)


@F.pandas_udf(StringType())
def decode_udf(raw: pd.Series) -> pd.Series:
    return raw.map(decode_bytes)


@F.pandas_udf(StringType())
def extract_udf(raw: pd.Series) -> pd.Series:
    """html binary → extracted text (decode chain + preprocess)."""
    return raw.map(
        lambda b: preprocess_text(decode_bytes(b)) if b is not None else None
    )


@F.pandas_udf(StringType())
def slug_udf(filenames: pd.Series) -> pd.Series:
    return filenames.map(lambda s: create_slug(s) if s is not None else None)
