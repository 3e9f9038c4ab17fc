"""robots.txt parsing and URL permission matching per RFC 9309 (the
Robots Exclusion Protocol) — crawl politeness over a per-host robots
table, the gate every Common-Crawl-style frontier runs before fetch.

Semantics implemented (RFC 9309 §2, verified against the RFC's own
examples in tests):

- groups: one or more ``User-agent`` lines followed by rules; a group
  matches a crawler by case-insensitive product-token comparison; the
  group with the LONGEST matching token wins, ``*`` is the fallback;
  multiple groups for the same agent merge
- rules: ``Allow`` / ``Disallow`` path patterns with ``*`` (any chars)
  and ``$`` (end anchor); empty ``Disallow:`` means allow-all
- matching: the rule with the longest PATTERN (octet length, per RFC)
  wins; on a tie between allow and disallow, allow wins; no matching
  rule → allowed (crawl-by-default)
- extras: ``Crawl-delay`` (de-facto standard, not in the RFC) and
  ``Sitemap`` lines are surfaced; comments (``#``) and unknown lines
  ignored

Scale shape: robots.txt is per-HOST — a ~10^7-row side table next to a
~10^12-row frontier. :func:`parse_robots` explodes each host's file
into rule rows once (Arrow-batched ``mapInPandas``); :func:`match_
allowed` joins the frontier to the per-host rule ARRAY (a groupBy of
the small table, broadcastable) and settles longest-match per URL in
one vectorized pandas UDF — rules move to URLs, never the reverse,
and the frontier shuffles zero times when the rule side broadcasts.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_RULES_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("rule_type", StringType()),  # allow | disallow
        StructField("pattern", StringType()),
        StructField("pattern_len", LongType()),
        StructField("crawl_delay", DoubleType()),
    ]
)

_SITEMAP_SCHEMA = StructType(
    [StructField("host", StringType()), StructField("sitemap", StringType())]
)


def _select_group(text: str, user_agent: str) -> tuple[list, float | None]:
    """Parse one robots.txt → (rules for ``user_agent``, crawl_delay).

    Returns [(rule_type, pattern)] for the best-matching group(s) per
    RFC group selection (longest token match; '*' fallback; groups for
    the same agent merge)."""
    ua = user_agent.lower()
    groups: dict[str, list] = {}       # token -> [(type, pattern)]
    delays: dict[str, float] = {}      # token -> crawl-delay
    current: list[str] = []            # tokens of the open group
    saw_rule = True                    # a UA line after rules opens a new group
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if saw_rule:
                current = []
                saw_rule = False
            tok = val.lower()
            current.append(tok)
            groups.setdefault(tok, [])
        elif key in ("allow", "disallow"):
            saw_rule = True
            if key == "disallow" and val == "":
                continue  # empty Disallow: allow-all (no rule)
            for tok in current:
                groups.setdefault(tok, []).append((key, val))
        elif key == "crawl-delay":
            saw_rule = True
            try:
                for tok in current:
                    delays[tok] = float(val)
            except ValueError:
                pass
        # sitemap and unknown keys don't close a group per the RFC

    # group selection: longest token that is a prefix-token match of ua
    best_tok, best_len = None, -1
    for tok in groups:
        if tok != "*" and tok in ua and len(tok) > best_len:
            best_tok, best_len = tok, len(tok)
    if best_tok is None and "*" in groups:
        best_tok = "*"
    if best_tok is None:
        return [], None
    return groups[best_tok], delays.get(best_tok)


def _pattern_regex(pattern: str) -> re.Pattern:
    """RFC pattern → anchored regex: '*' = any chars, trailing '$' =
    end anchor, everything else literal; match from path start."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(p) for p in body.split("*"))
    return re.compile("^" + rx + ("$" if anchored else ""))


def match_path(rules: list[tuple[str, str]], path: str) -> bool:
    """Longest-match verdict for one path against [(type, pattern)].
    Exposed for tests and driver-side use; the distributed path is
    :func:`match_allowed`."""
    best_len, best_allow = -1, True
    for rtype, pattern in rules:
        if _pattern_regex(pattern).match(path):
            plen = len(pattern)
            allow = rtype == "allow"
            if plen > best_len or (plen == best_len and allow):
                best_len, best_allow = plen, allow
    return best_allow


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """Explode per-host robots.txt into rule rows for ``user_agent`` →
    (host, rule_type, pattern, pattern_len, crawl_delay). Hosts whose
    file yields no applicable rules emit nothing (crawl-by-default)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for host, text in zip(b[host_col], b[text_col]):
                rules, delay = _select_group(text or "", user_agent)
                for rtype, pattern in rules:
                    rows.append((host, rtype, pattern, len(pattern), delay))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _RULES_SCHEMA.fields]
            )

    return robots.mapInPandas(run, _RULES_SCHEMA)


def sitemaps(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """All Sitemap lines → (host, sitemap). Sitemap is group-independent
    per the RFC."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for host, text in zip(b[host_col], b[text_col]):
                for raw in (text or "").splitlines():
                    line = raw.split("#", 1)[0].strip()
                    k, _, v = line.partition(":")
                    if k.strip().lower() == "sitemap" and v.strip():
                        rows.append((host, v.strip()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _SITEMAP_SCHEMA.fields]
            )

    return robots.mapInPandas(run, _SITEMAP_SCHEMA)


def match_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Add ``allowed`` (bool) to a frontier of URLs by RFC longest-match
    against a :func:`parse_robots` rule table.

    The rule table is grouped to one array row per host and (by
    default) broadcast, so the frontier never shuffles; the verdict is
    settled per Arrow batch in one pandas UDF with a per-batch compiled-
    regex cache. URLs for hosts with no rules are allowed."""
    from k2_18_spark.functions.urls import url_host, url_path, url_query

    per_host = rules.groupBy("host").agg(
        F.collect_list(F.struct("rule_type", "pattern")).alias("host_rules")
    )
    if broadcast_rules:
        per_host = F.broadcast(per_host)

    # rules match against path + optional query (REP convention:
    # "Disallow: /*?print=1" must work), with empty path as "/"
    path = F.when(url_path(url_col) == "", "/").otherwise(url_path(url_col))
    q = url_query(url_col)
    with_host = urls.withColumn("_host", url_host(url_col)).withColumn(
        "_path",
        F.when(q == "", path).otherwise(F.concat(path, F.lit("?"), q)),
    )
    joined = with_host.join(per_host, with_host["_host"] == per_host["host"], "left")

    schema = StructType(
        joined.drop("host", "host_rules", "_host", "_path").schema.fields
        + [StructField("allowed", BooleanType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, re.Pattern] = {}

        def rx(p: str) -> re.Pattern:
            if p not in cache:
                cache[p] = _pattern_regex(p)
            return cache[p]

        for b in batches:
            verdicts = []
            for rules_arr, path in zip(b["host_rules"], b["_path"]):
                if rules_arr is None or (
                    isinstance(rules_arr, float) and pd.isna(rules_arr)
                ) or len(rules_arr) == 0:
                    verdicts.append(True)
                    continue
                best_len, best_allow = -1, True
                for r in rules_arr:
                    rtype, pattern = r["rule_type"], r["pattern"]
                    if rx(pattern).match(path):
                        plen = len(pattern)
                        allow = rtype == "allow"
                        if plen > best_len or (plen == best_len and allow):
                            best_len, best_allow = plen, allow
                verdicts.append(best_allow)
            out = b.drop(columns=["host", "host_rules", "_host", "_path"])
            out["allowed"] = verdicts
            yield out

    return joined.mapInPandas(run, schema)
