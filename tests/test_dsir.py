"""DSIR importance resampling (operators/dsir.py) vs a pure-Python
replica of the whole pipeline — hashed-bucket featurization, add-α
bag-of-ngrams LMs, log importance weights, Gumbel-top-k selection —
plus the behavioral guarantee the method exists for: the sample is
enriched in target-like documents."""

import hashlib
import math
import re

import pytest

from k2_18_spark.operators.dsir import (
    dsir_sample,
    dsir_scores,
    hashed_ngram_counts,
    train_hashed_lm,
)

B = 64  # buckets — small so collisions are exercised


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


POOL = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "zx9 qq7 blorp zz zz zz blorp"),
    (4, "qq7 zx9 zx9 blorp qq7"),
    (5, "the cat and the dog"),
    (6, "on the mat sat the cat"),
    (7, "hi"),                       # 1 token → no bigram
    (8, ""),                         # empty → no bigram
    (9, "the mat and the log"),
    (10, "blorp zz qq7 zx9"),
]
TARGET = [POOL[0], POOL[1], POOL[4]]   # "the cat/dog ..." docs


def _grams(text, n=2):
    toks = re.findall(r"[a-z0-9]+", text.lower())
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def _bkt(gram):
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % B


def _lm(rows, alpha=1.0):
    c = {}
    for _i, t in rows:
        for g in _grams(t):
            b = _bkt(g)
            c[b] = c.get(b, 0) + 1
    tot = sum(c.values())
    return {
        b: math.log((c.get(b, 0) + alpha) / (tot + alpha * B))
        for b in range(B)
    }


def _scores(pool, target, alpha=1.0):
    lt, lr = _lm(target, alpha), _lm(pool, alpha)
    out = {}
    for i, t in pool:
        grams = _grams(t)
        w = sum(lt[_bkt(g)] - lr[_bkt(g)] for g in grams)
        out[i] = (len(grams), round(w, 6))
    return out


def _u(h):
    return (int(h[:15], 16) + 1.0) / float(1 << 60)


def _sample(scores, k, seed="dsir"):
    keyed = []
    for i, (_n, w) in scores.items():
        u = _u(hashlib.md5(f"{seed}|{i}".encode()).hexdigest())
        keyed.append((w - math.log(-math.log(u)), i))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    return {i: round(key, 6) for key, i in keyed[:k]}


def test_hashed_counts_match_replica(spark):
    got = {
        (r["doc_id"], r["bucket"]): r["cnt"]
        for r in hashed_ngram_counts(_docs(spark, POOL), buckets=B).collect()
    }
    want = {}
    for i, t in POOL:
        for g in _grams(t):
            key = (i, _bkt(g))
            want[key] = want.get(key, 0) + 1
    assert got == want


def test_lm_is_complete_and_matches_replica(spark):
    got = {
        r["bucket"]: r["logp"]
        for r in train_hashed_lm(_docs(spark, TARGET), buckets=B).collect()
    }
    want = _lm(TARGET)
    assert set(got) == set(range(B))
    assert all(abs(got[b] - want[b]) < 1e-12 for b in range(B))


def test_scores_match_replica(spark):
    got = {
        r["doc_id"]: (r["n_ngrams"], r["log_w"])
        for r in dsir_scores(
            _docs(spark, POOL), _docs(spark, TARGET), buckets=B
        ).collect()
    }
    assert got == _scores(POOL, TARGET)
    assert got[7] == (0, 0.0) and got[8] == (0, 0.0)  # no-bigram docs


def test_sample_matches_replica_and_is_deterministic(spark):
    scored = dsir_scores(_docs(spark, POOL), _docs(spark, TARGET), buckets=B)
    got = {
        r["doc_id"]: r["priority"]
        for r in dsir_sample(scored, k=4, seed="s").collect()
    }
    assert got == _sample(_scores(POOL, TARGET), 4, "s")
    again = {
        r["doc_id"]: r["priority"]
        for r in dsir_sample(scored, k=4, seed="s").collect()
    }
    assert again == got
    other = {
        r["doc_id"] for r in dsir_sample(scored, k=4, seed="t").collect()
    }
    assert other  # a different seed still returns k rows


def test_sample_enriches_target_like_docs(spark):
    """The point of DSIR: with strongly separated vocabularies, the
    selected half of the pool is dominated by target-like docs."""
    tgt_words = "alpha beta gamma delta epsilon zeta".split()
    spam_words = "x1 y2 z3 w4 v5 u6".split()

    def mk(i, words):
        return (i, " ".join(words[(i + j) % len(words)] for j in range(12)))

    pool = [mk(i, tgt_words) for i in range(30)] + [
        mk(100 + i, spam_words) for i in range(30)
    ]
    target = [mk(1000 + i, tgt_words) for i in range(10)]
    scored = dsir_scores(
        _docs(spark, pool), _docs(spark, target), buckets=256
    )
    picked = {r["doc_id"] for r in dsir_sample(scored, k=20).collect()}
    target_like = sum(1 for i in picked if i < 100)
    assert target_like >= 16  # ≥80% of the selected 20
