"""Winnowing (operators/winnow.py): python-replica parity, the
shared-substring guarantee, whitespace robustness, hub-fingerprint
cap, short-doc immunity."""

import hashlib
import re

from k2_18_spark.operators.winnow import (
    shared_fingerprint_pairs,
    winnow_fingerprints,
)


def _py_winnow(text, k=5, w=4):
    nt = re.sub(r"\s+", " ", text.lower()).strip()
    hashes = [
        hashlib.md5(nt[i : i + k].encode()).hexdigest()
        for i in range(len(nt) - k + 1)
    ]
    sel = set()
    for s in range(0, len(hashes) - w + 1):
        win = [(hashes[s + j], -(s + j)) for j in range(w)]
        fp, negpos = min(win)
        sel.add((-negpos, fp))
    return sel


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


DOCS = [
    (0, "The quick brown fox jumps over the lazy dog by the river"),
    (1, "PREFIX words then the quick brown fox jumps over the lazy dog"),
    (2, "unrelated content entirely: gamma delta epsilon zeta eta"),
    (3, "tiny"),
    (4, "Spaced    out\n\twhitespace   version of unrelated content"),
]


def test_replica_parity(spark):
    got = {}
    for r in winnow_fingerprints(_df(spark, DOCS), k=5, w=4).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for did, text in DOCS:
        exp = _py_winnow(text)
        assert got.get(did, set()) == exp, did


def test_shared_substring_guarantee(spark):
    """Docs 0 and 1 share a substring far longer than w+k-1 = 8 →
    they MUST share at least one fingerprint (the winnowing
    guarantee)."""
    fps = winnow_fingerprints(_df(spark, DOCS), k=5, w=4)
    sets = {}
    for r in fps.collect():
        sets.setdefault(r.doc_id, set()).add(r.fp)
    assert sets[0] & sets[1]
    assert not (sets[0] & sets[2])


def test_whitespace_normalization(spark):
    """Reformatting whitespace must not change the fingerprint set."""
    a = "alpha beta gamma delta epsilon zeta"
    b = "alpha    beta\n\ngamma\tdelta  epsilon zeta"
    fps = winnow_fingerprints(
        _df(spark, [(0, a), (1, b)]), k=5, w=4
    )
    sets = {}
    for r in fps.collect():
        sets.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    assert sets[0] == sets[1]


def test_short_docs_yield_nothing(spark):
    fps = winnow_fingerprints(_df(spark, [(0, "tiny")]), k=5, w=4)
    assert fps.count() == 0


def test_pairs_and_bucket_cap(spark):
    pairs = {
        (r.id_a, r.id_b): r.shared
        for r in shared_fingerprint_pairs(
            _df(spark, DOCS), k=5, w=4, min_shared=2
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    # docs 2 and 4 share the literal substring "unrelated content"
    # (> w+k-1 chars) — the guarantee surfaces them too
    assert set(pairs) <= {(0, 1), (2, 4)}
    assert (2, 4) in pairs
    # cap of 0 drops every fingerprint → no pairs survive
    none = shared_fingerprint_pairs(
        _df(spark, DOCS), k=5, w=4, min_shared=1, max_bucket_size=1
    )
    assert none.count() == 0
