"""PII scrubbing — the redaction pass every public webtext corpus
ships with (C4 removed pages on a blocklist; The Pile / RefinedWeb /
Dolma mask emails, IPs and phone numbers in place).

Pure-codegen ``regexp_replace`` / ``regexp_count`` — no Python UDFs,
so the scrub runs inside whole-stage codegen at full scan speed; at
100 TB this pass is I/O-bound, exactly as it should be. Patterns are
deliberately conservative (high precision over recall — a corpus pass
that mangles code/markup hurts more than a missed digit run) and are
written in the regex subset where Java (Spark) and RE2 (DuckDB's
``regexp_replace``) agree, so the driver oracle can replicate the
scrub byte-for-byte:

- ``EMAIL``: user@host.tld with a 2+-alpha TLD
- ``IPV4``: four dot-separated 1-3 digit octets, word-bounded
- ``PHONE``: international-ish +CC digit runs, or 3-3-4 dashed/dotted
  US-style numbers, length-bounded

Masks are fixed tokens (``<EMAIL>`` etc.) rather than format-
preserving fakes: downstream tokenizers see one stable special token,
and the scrub is idempotent (a second pass is a no-op).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: pattern, mask — applied in order (email first: an email contains
#: digit runs a later pattern might otherwise nibble at)
EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE = r"\+\d{7,15}\b|\b\d{3}[-.]\d{3}[-.]\d{4}\b"

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", EMAIL, "<EMAIL>"),
    ("ipv4", IPV4, "<IP>"),
    ("phone", PHONE, "<PHONE>"),
]


def _scrubbed(col: Column) -> Column:
    out = col
    for _, pat, mask in PII_PATTERNS:
        out = F.regexp_replace(out, pat, mask)
    return out


def scrub_pii(
    docs: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed"
) -> DataFrame:
    """Mask PII in ``text_col`` → input columns + ``out_col`` +
    ``n_<kind>`` match counts per kind (counted BEFORE masking, on
    the same precedence order — an IP inside an email is counted as
    email only)."""
    out = docs
    cur = F.col(text_col)
    for kind, pat, mask in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(cur, F.lit(pat)).cast("long")
        )
        cur = F.regexp_replace(cur, pat, mask)
    return out.withColumn(out_col, cur)


def pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus rollup → one row per PII kind (kind, n_docs, n_matches):
    how dirty is the corpus, which is the number a pipeline gate
    alerts on."""
    scrubbed = scrub_pii(docs, text_col)
    rows = [
        scrubbed.agg(
            F.lit(kind).alias("kind"),
            F.sum((F.col(f"n_{kind}") > 0).cast("long")).alias("n_docs"),
            F.sum(f"n_{kind}").alias("n_matches"),
        )
        for kind, _, _ in PII_PATTERNS
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
