"""BPE training (operators/bpe.py): the canonical Sennrich corpus,
python-replica parity, early stop, segmentation semantics."""

import re
from collections import Counter

from k2_18_spark.operators.bpe import apply_bpe, train_bpe, word_vocab


def _py_bpe(texts, rounds):
    words = Counter(
        w for t in texts for w in re.findall("[a-z0-9]+", t.lower())
    )
    vocab = {w: " " + " ".join(w) + " " for w in words}
    merges = []
    for r in range(rounds):
        pairs = Counter()
        for w, sym in vocab.items():
            syms = sym.split()
            for a, b in zip(syms, syms[1:]):
                pairs[f"{a} {b}"] += words[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pair, c = best
        merged = pair.replace(" ", "")
        merges.append((r, pair, merged, c))
        vocab = {
            w: s.replace(f" {pair} ", f" {merged} ")
            for w, s in vocab.items()
        }
    return merges


def test_sennrich_example(spark):
    text = (
        "low low low low low lower lower newest newest newest newest "
        "newest newest widest widest widest"
    )
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    merges = train_bpe(spark, docs, rounds=6)
    assert merges == [
        (0, "e s", "es", 9),
        (1, "es t", "est", 9),
        (2, "l o", "lo", 7),
        (3, "lo w", "low", 7),
        (4, "e w", "ew", 6),
        (5, "ew est", "ewest", 6),
    ]


def test_replica_parity(spark):
    texts = [
        "the cat batted the mat and the rat sat on that mat",
        "a tattered banner flapped as matters scattered",
        "batter better butter bitter patter matter 012 012 0121",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = train_bpe(spark, docs, rounds=10)
    exp = _py_bpe(texts, 10)
    assert got == exp


def test_early_stop_when_nothing_repeats(spark):
    docs = spark.createDataFrame(
        [(0, "ab cd ef")], "doc_id long, text string"
    )
    merges = train_bpe(spark, docs, rounds=5)
    assert merges == []  # every pair count is 1 → no merge learned


def test_apply_bpe_segments_with_learned_merges(spark):
    text = "aaa aaa aaa banana banana"
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    merges = train_bpe(spark, docs, rounds=3)
    exp = _py_bpe([text], 3)
    assert merges == exp
    out = apply_bpe(
        spark.createDataFrame(
            [(1, "aaa banana unseen")], "doc_id long, text string"
        ),
        merges,
    ).collect()[0]
    # python replay of segmentation on the probe words
    def seg(w):
        s = " " + " ".join(w) + " "
        for _, pair, merged, _ in merges:
            s = s.replace(f" {pair} ", f" {merged} ")
        return s.split()

    exp_tokens = seg("aaa") + seg("banana") + seg("unseen")
    assert list(out.tokens) == exp_tokens
    assert out.n_tokens == len(exp_tokens)


def test_word_vocab_counts(spark):
    docs = spark.createDataFrame(
        [(0, "Big big BIG words Words"), (1, "words!")],
        "doc_id long, text string",
    )
    got = {r.word: r.n for r in word_vocab(docs).collect()}
    assert got == {"big": 3, "words": 3}
