"""BM25 / TF-IDF (operators/bm25.py) vs a pure-python replica; zero
scores for disjoint docs, absent query terms, idf monotonicity."""

import math
import re
from collections import Counter, defaultdict

import pytest

from k2_18_spark.operators.bm25 import bm25_score, idf_table, term_frequencies

DOCS = [
    (0, "spark shuffles the hash join across the cluster"),
    (1, "a hash join beats a sort merge join on small tables"),
    (2, "entirely unrelated prose about gardens and rain"),
    (3, "join join join hash hash scan"),
]


def _py_bm25(docs, query, k1=1.2, b=0.75):
    toks = {d: re.findall("[a-z0-9]+", t.lower()) for d, t in docs}
    n = len(docs)
    df = Counter()
    for d, ts in toks.items():
        for t in set(ts):
            df[t] += 1
    avgdl = sum(len(ts) for ts in toks.values()) / n
    q = sorted(set(re.findall("[a-z0-9]+", query.lower())))
    out = {}
    for d, ts in toks.items():
        tf = Counter(ts)
        s, h = 0.0, 0
        for t in q:
            if tf[t] == 0 or df[t] == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf[t] * (k1 + 1)) / (
                tf[t] + k1 * (1 - b + b * len(ts) / avgdl)
            )
            h += 1
        out[d] = (round(s, 6), h)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_replica(spark, docs_df):
    q = "hash join gardens zzznope"
    got = {
        r.doc_id: (r.bm25, r.n_hit_terms)
        for r in bm25_score(docs_df, q).collect()
    }
    exp = _py_bm25(DOCS, q)
    for d in exp:
        assert got[d][1] == exp[d][1], d
        assert got[d][0] == pytest.approx(exp[d][0], abs=1e-9), d


def test_disjoint_doc_scores_zero(spark, docs_df):
    got = {
        r.doc_id: r
        for r in bm25_score(docs_df, "hash join scan").collect()
    }
    assert got[2].bm25 == 0.0 and got[2].n_hit_terms == 0
    assert got[3].bm25 > got[0].bm25  # heavier tf, shorter doc


def test_absent_query_term_contributes_nothing(spark, docs_df):
    a = {
        r.doc_id: r.bm25
        for r in bm25_score(docs_df, "hash join").collect()
    }
    b = {
        r.doc_id: r.bm25
        for r in bm25_score(docs_df, "hash join qqqabsent").collect()
    }
    assert a == b


def test_idf_monotone_in_rarity(spark, docs_df):
    idf = {r.token: (r.df, r.idf) for r in idf_table(docs_df).collect()}
    # 'join' (3 docs) is more common than 'scan' (1 doc)
    assert idf["join"][0] == 3 and idf["scan"][0] == 1
    assert idf["scan"][1] > idf["join"][1] > 0


def test_term_frequencies(spark, docs_df):
    tf = {
        (r.doc_id, r.token): r.tf
        for r in term_frequencies(docs_df).collect()
    }
    assert tf[(3, "join")] == 3 and tf[(3, "hash")] == 2
    assert tf[(0, "the")] == 2
