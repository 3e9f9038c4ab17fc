"""C4 rule-set filtering (operators/c4_filters.py)."""

from k2_18_spark.operators.c4_filters import c4_filter


def _run(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    return {r["doc_id"]: r for r in c4_filter(docs, **kw).collect()}


def test_line_rules(spark):
    out = _run(
        spark,
        [
            (
                1,
                "This line ends properly.\n"
                "short one.\n"                      # < 3 words
                "no terminal punctuation here\n"
                "Click here to enable javascript now.\n"
                "function f() { return 1; }\n"
                "We value your privacy policy here.\n"
                'He said "stop!"\n'                  # quote after ! is ok
                "Is this a real question?",
            )
        ],
    )
    r = out[1]
    assert r["text_clean"] == (
        'This line ends properly.\nHe said "stop!"\nIs this a real question?'
    )
    assert r["n_lines_kept"] == 3
    assert r["n_lines_dropped"] == 5
    assert r["keep"]  # 3 kept lines, enough words


def test_document_gates(spark):
    out = _run(
        spark,
        [
            (1, "One good sentence here.\nAnother good sentence here."),
            (2, "A good sentence number one.\nGood sentence two follows it."
                "\nAnd a third closes it out."),
            (3, ""),
        ],
    )
    assert not out[1]["keep"]          # only 2 sentences
    assert out[2]["keep"]
    assert not out[3]["keep"]
    assert out[3]["text_clean"] == ""


def test_max_line_chars_gate(spark):
    long_line = "word " * 500 + "end."
    rows = [(1, "Good sentence number one.\nGood sentence number two."
             "\n" + long_line)]
    out = _run(spark, rows, max_line_chars=100)
    assert not out[1]["keep"]  # the long line survives line rules but
    # trips the doc gate
    out2 = _run(spark, rows, max_line_chars=5000)
    assert out2[1]["keep"]


def test_lorem_ipsum_and_word_count(spark):
    out = _run(
        spark,
        [
            (1, "Lorem ipsum dolor sit amet.\nReal text sentence one."
                "\nReal text sentence two.\nReal text sentence three."),
        ],
    )
    r = out[1]
    assert "Lorem" not in r["text_clean"]
    assert r["n_lines_kept"] == 3
    assert r["n_words"] == 12
    assert r["keep"]
