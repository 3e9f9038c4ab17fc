"""Cross-document substring dedup (operators/substring_dedup.py) vs a
pure-python replica; keep-first canonicality, within-doc repeats,
short-doc immunity."""

import hashlib
import re
from collections import defaultdict

import pytest

from k2_18_spark.operators.substring_dedup import (
    dedup_substrings,
    duplicated_windows,
)


def _py_dedup(docs, L, keep_first=True):
    toks = {d: [t for t in re.split(r"\s+", s.strip()) if t] for d, s in docs}
    wins = defaultdict(list)  # fp -> [(doc, pos)]
    for d, ws in toks.items():
        for i in range(len(ws) - L + 1):
            fp = hashlib.md5(" ".join(ws[i : i + L]).encode()).hexdigest()
            wins[fp].append((d, i))
    out = {}
    covered = {d: set() for d in toks}
    for fp, occ in wins.items():
        if len(occ) < 2:
            continue
        first = min(occ)
        for d, p in occ:
            if keep_first and (d, p) == first:
                continue
            covered[d].update(range(p, p + L))
    for d, ws in toks.items():
        kept = [w for t, w in enumerate(ws) if t not in covered[d]]
        out[d] = (" ".join(kept), len(ws), len(ws) - len(kept))
    return out


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


SHARED = "one two three four five six seven eight nine ten"


def _mk_docs():
    return [
        (0, "a0 b0 " + SHARED + " z0 y0"),
        (1, "a1 b1 c1 " + SHARED + " z1"),           # shared at offset 3
        (2, "self rep " + SHARED + " mid " + SHARED),  # twice in one doc
        (3, "tiny doc below window size"),
        (4, "wholly unique words without any repetition at all here now"),
    ]


@pytest.mark.parametrize("keep_first", [True, False])
def test_replica_parity(spark, keep_first):
    docs = _mk_docs()
    exp = _py_dedup(docs, 8, keep_first=keep_first)
    got = {
        r.doc_id: (r.text_dedup, r.n_tokens, r.n_tokens_dropped)
        for r in dedup_substrings(
            _df(spark, docs), window_tokens=8, keep_first=keep_first
        ).collect()
    }
    assert got == exp


def test_keep_first_retains_canonical_copy(spark):
    docs = _mk_docs()
    got = {
        r.doc_id: r
        for r in dedup_substrings(
            _df(spark, docs), window_tokens=8
        ).collect()
    }
    # doc 0 holds the minimum (doc, pos) for every duplicated window →
    # keeps its full text
    assert got[0].n_tokens_dropped == 0
    assert SHARED in got[0].text_dedup
    # doc 1 loses exactly the 10 shared tokens
    assert got[1].n_tokens_dropped == 10
    assert SHARED not in got[1].text_dedup
    assert got[1].text_dedup == "a1 b1 c1 z1"


def test_within_doc_repeat_dropped(spark):
    docs = _mk_docs()
    got = {
        r.doc_id: r
        for r in dedup_substrings(
            _df(spark, docs), window_tokens=8
        ).collect()
    }
    # doc 2 repeats the span internally: both occurrences duplicated
    # elsewhere → both dropped (doc 0 owns the canonical copy)
    assert got[2].n_tokens_dropped == 20
    assert "one" not in got[2].text_dedup.split()


def test_short_and_unique_docs_untouched(spark):
    docs = _mk_docs()
    got = {
        r.doc_id: r
        for r in dedup_substrings(
            _df(spark, docs), window_tokens=8
        ).collect()
    }
    for d in (3, 4):
        assert got[d].n_tokens_dropped == 0
        assert got[d].text_dedup == docs[d][1]


def test_duplicated_windows_profile(spark):
    docs = _mk_docs()
    prof = duplicated_windows(
        _df(spark, docs), window_tokens=8
    ).collect()
    # shared span of 10 tokens → 3 in-span windows, each seen in docs
    # 0, 1 and twice in doc 2; plus boundary windows shared only
    # between doc 2's two in-doc occurrences
    by_n = defaultdict(int)
    for r in prof:
        by_n[r.n_occurrences] += 1
    assert by_n[4] == 3  # the three fully-in-span windows
    for r in prof:
        assert r.first_doc == 0 or r.n_occurrences == 2
