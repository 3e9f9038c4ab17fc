"""Mixture sampling + sequence packing (operators/mixing.py)."""

import hashlib

import pytest

from k2_18_spark.operators.mixing import (
    _threshold_hex,
    pack_sequences,
    stratified_sample,
)


def _docs(spark, n=200):
    rows = [
        (i, ["web", "code", "books"][i % 3], f"doc {i}") for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id int, source string, text string")


def _expected_copies(i, rate, seed="mix"):
    whole = int(rate)
    draw = hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:15]
    return whole + (1 if draw < _threshold_hex(rate - whole) else 0)


def test_stratified_sample_exact_replica(spark):
    rates = {"web": 0.5, "code": 2.3, "books": 0.0}
    out = stratified_sample(_docs(spark), rates).collect()
    got: dict[int, int] = {}
    for r in out:
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + 1
        assert r["copy"] < got[r["doc_id"]]
    for i in range(200):
        want = _expected_copies(i, rates[["web", "code", "books"][i % 3]])
        assert got.get(i, 0) == want, i
    # books fully dropped; every code doc kept at least twice
    assert not any(i % 3 == 2 for i in got)
    assert all(got[i] >= 2 for i in got if i % 3 == 1)


def test_stratified_sample_rate_statistics(spark):
    n = 3000
    docs = spark.createDataFrame(
        [(i, "web", "t") for i in range(n)],
        "doc_id int, source string, text string",
    )
    cnt = stratified_sample(docs, {"web": 1.5}).count()
    assert abs(cnt / n - 1.5) < 0.05  # expected copies = rate


def test_stratified_default_rate(spark):
    out = stratified_sample(
        _docs(spark), {"web": 0.0}, default_rate=1.0
    ).collect()
    ids = {r["doc_id"] for r in out}
    assert ids == {i for i in range(200) if i % 3 != 0}
    assert len(out) == len(ids)  # default 1.0 = exactly one copy


def test_pack_sequences_greedy_exact(spark):
    rows = [
        (0, "a", 400), (1, "a", 500), (2, "a", 200),  # [0,1] then [2..]
        (3, "a", 300), (4, "a", 2000),                # oversized alone
        (5, "a", 100),
        (6, "b", 1024), (7, "b", 1),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, host string, n_tokens int")
    out = {
        (r["host"], r["seq_id"]): r
        for r in pack_sequences(
            docs, budget=1024, part_col="host"
        ).collect()
    }
    assert out[("a", 0)]["doc_ids"] == "0>1"
    assert out[("a", 0)]["n_tokens"] == 900
    assert out[("a", 1)]["doc_ids"] == "2>3"
    assert out[("a", 2)]["doc_ids"] == "4"  # oversized alone
    assert out[("a", 2)]["n_tokens"] == 2000
    assert out[("a", 3)]["doc_ids"] == "5"
    assert out[("b", 0)]["doc_ids"] == "6"
    assert out[("b", 1)]["doc_ids"] == "7"
    # hard budget invariant except single oversized docs
    for r in out.values():
        assert r["n_tokens"] <= 1024 or r["n_docs"] == 1


def test_pack_sequences_no_partition(spark):
    docs = spark.createDataFrame(
        [(i, 300) for i in range(7)], "doc_id int, n_tokens int"
    )
    out = sorted(
        pack_sequences(docs, budget=1000).collect(),
        key=lambda r: r["seq_id"],
    )
    assert [r["doc_ids"] for r in out] == ["0>1>2", "3>4>5", "6"]
    assert all(r["_part"] == "all" for r in out)


@pytest.mark.parametrize("budget", [1, 999])
def test_pack_sequences_totals_preserved(spark, budget):
    docs = spark.createDataFrame(
        [(i, 10 + i) for i in range(50)], "doc_id int, n_tokens int"
    )
    out = pack_sequences(docs, budget=budget).collect()
    assert sum(r["n_docs"] for r in out) == 50
    assert sum(r["n_tokens"] for r in out) == sum(10 + i for i in range(50))
