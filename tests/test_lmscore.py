"""Unigram LM scoring (operators/lmscore.py) vs a pure-python
replica; OOV floor, empty docs, bucket determinism."""

import math
import re
from collections import Counter

import pytest

from k2_18_spark.operators.lmscore import lm_score, train_unigram

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the dog ran to the cat", "en"),
    (2, "un gato y un perro", "es"),
    (3, "", "en"),
    (4, "cat cat cat cat", "en"),
]


def _toks(text):
    return re.findall("[a-z0-9]+", text.lower())


def _py_model(docs):
    c = Counter(t for _, text, _ in docs for t in _toks(text))
    total = sum(c.values())
    return c, total


def _py_score(text, c, total, unk=None):
    toks = _toks(text)
    if not toks:
        return 0, 0.0
    if unk is None:
        unk = -math.log(total + len(c))
    lps = [math.log(c[t] / total) if t in c else unk for t in toks]
    return len(toks), round(-sum(lps) / len(lps), 6)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string"
    )


def test_train_counts_and_logp(spark, docs_df):
    m = {r.token: r for r in train_unigram(docs_df).collect()}
    c, total = _py_model(DOCS)
    assert {t: r["count"] for t, r in m.items()} == dict(c)
    for t, r in m.items():
        assert r.logp == pytest.approx(math.log(c[t] / total), abs=1e-12)
        assert r._total == total and r._vocab == len(c)


def test_score_matches_replica(spark, docs_df):
    model = train_unigram(docs_df)
    rows = {r.doc_id: r for r in lm_score(docs_df, model).collect()}
    c, total = _py_model(DOCS)
    for did, text, _ in DOCS:
        n, s = _py_score(text, c, total)
        assert rows[did].n_tokens == n, did
        assert rows[did].avg_neg_logp == pytest.approx(s, abs=1e-9), did
        assert rows[did].perplexity == pytest.approx(
            round(math.exp(s), 6), abs=1e-6
        ), did


def test_oov_uses_unk_floor(spark, docs_df):
    """Score a doc whose tokens are absent from the model: the add-one
    floor must apply to every OOV token (regression: totals must not
    come from the left-joined model columns)."""
    model = train_unigram(docs_df)
    new = spark.createDataFrame(
        [(99, "zebra quux the", "en")], "doc_id long, text string, lang string"
    )
    r = lm_score(new, model).collect()[0]
    c, total = _py_model(DOCS)
    n, s = _py_score("zebra quux the", c, total)
    assert r.n_tokens == 3
    assert r.avg_neg_logp == pytest.approx(s, abs=1e-9)
    # explicit unk override
    r2 = lm_score(new, model, unk_logp=-20.0).collect()[0]
    n2, s2 = _py_score("zebra quux the", c, total, unk=-20.0)
    assert r2.avg_neg_logp == pytest.approx(s2, abs=1e-9)


def test_empty_doc_scores_zero(spark, docs_df):
    model = train_unigram(docs_df)
    r = {x.doc_id: x for x in lm_score(docs_df, model).collect()}[3]
    assert r.n_tokens == 0
    assert r.avg_neg_logp == 0.0 and r.perplexity == 1.0


def test_buckets_per_lang_deterministic(spark, docs_df):
    model = train_unigram(docs_df)
    a = lm_score(docs_df, model, lang_col="lang", n_buckets=2)
    b = lm_score(docs_df, model, lang_col="lang", n_buckets=2)
    ra = sorted((r.doc_id, r.ppl_bucket) for r in a.collect())
    rb = sorted((r.doc_id, r.ppl_bucket) for r in b.collect())
    assert ra == rb
    by_doc = dict(ra)
    # es partition has one doc → bucket 1
    assert by_doc[2] == 1
    # en partition: 4 docs → two per bucket, ordered by score
    en_scores = {
        r.doc_id: r.avg_neg_logp
        for r in a.filter("lang = 'en'").collect()
    }
    order = sorted(en_scores, key=lambda d: (en_scores[d], d))
    assert [by_doc[d] for d in order] == [1, 1, 2, 2]
