"""PII scrubbing (functions/pii.py)."""

from k2_18_spark.functions.pii import pii_stats, scrub_pii


def _docs(spark):
    rows = [
        (1, "contact bob.smith+x@mail.example.co.uk or call 555-123-4567"),
        (2, "server at 10.0.255.3 and backup at 192.168.1.1"),
        (3, "intl +4915112345678 now; version 1.2.3 stays"),
        (4, "no pii here, just text with numbers 12345"),
        (5, "a@b.io mailed c@d.org from 8.8.8.8"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_scrub_masks_and_counts(spark):
    out = {r["doc_id"]: r for r in scrub_pii(_docs(spark)).collect()}
    assert out[1]["text_scrubbed"] == "contact <EMAIL> or call <PHONE>"
    assert (out[1]["n_email"], out[1]["n_phone"]) == (1, 1)
    assert out[2]["text_scrubbed"] == "server at <IP> and backup at <IP>"
    assert out[2]["n_ipv4"] == 2
    # version strings are not IPs (three octets only), +CC runs are phones
    assert out[3]["text_scrubbed"] == "intl <PHONE> now; version 1.2.3 stays"
    assert out[4]["text_scrubbed"] == out[4]["text"]
    assert out[5]["text_scrubbed"] == "<EMAIL> mailed <EMAIL> from <IP>"
    assert out[6]["text_scrubbed"] == ""


def test_scrub_idempotent(spark):
    once = scrub_pii(_docs(spark)).select(
        "doc_id", "text_scrubbed"
    ).withColumnRenamed("text_scrubbed", "text")
    twice = {
        r["doc_id"]: r["text_scrubbed"] for r in scrub_pii(once).collect()
    }
    first = {
        r["doc_id"]: r["text_scrubbed"]
        for r in scrub_pii(_docs(spark)).collect()
    }
    assert twice == first


def test_email_precedence_over_digits(spark):
    # the numeric local-part of an email must not leak a phone match
    docs = spark.createDataFrame(
        [(1, "reach 555-123-4567@relay.example.com today")],
        "doc_id int, text string",
    )
    r = scrub_pii(docs).collect()[0]
    assert r["text_scrubbed"] == "reach <EMAIL> today"
    assert (r["n_email"], r["n_phone"]) == (1, 0)


def test_pii_stats_rollup(spark):
    got = {
        r["kind"]: (r["n_docs"], r["n_matches"])
        for r in pii_stats(_docs(spark)).collect()
    }
    assert got["email"] == (2, 3)
    assert got["ipv4"] == (2, 3)
    assert got["phone"] == (2, 2)
