"""Pages → hyperlink link-graph pipeline (pipeline/linkgraph.py).

The north-rule input shape: (url, warc_ts, html binary, text, lang).
Verifies distributed synthesis, the vectorized extractor on the binary
column (byte-for-byte vs the pure-python reference chain), JVM-side
edge mining vs the arithmetic link rules, NULL propagation, and that
the mining stage stays out of Python.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from k2_18_spark.functions.text import decode_bytes, preprocess_text
from k2_18_spark.pipeline.linkgraph import (
    LINK_RULE_EVEN,
    LINK_RULES,
    PAGE_URL_PREFIX,
    mine_links,
    pages_link_pipeline,
    synth_pages,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=i, text=f"body words {i} alpha beta", lang="en")
        for i in range(30)
    ]
    rows[7] = Row(doc_id=7, text=None, lang="en")  # NULL-text page
    return spark.createDataFrame(rows)


def _expected_links(i: int, n: int) -> list[int]:
    out = [(i * m + o) % n for m, o in LINK_RULES]
    if i % 2 == 0:
        m, o = LINK_RULE_EVEN
        out.append((i * m + o) % n)
    return out


def test_schema_matches_input_hint(spark, docs):
    pages = synth_pages(docs, 30)
    assert [(f.name, f.dataType.simpleString()) for f in pages.schema.fields] == [
        ("url", "string"),
        ("warc_ts", "timestamp"),
        ("html", "binary"),
        ("text", "string"),
        ("lang", "string"),
    ]


def test_extracted_text_byte_identical_per_url(spark, docs):
    pages, _ = pages_link_pipeline(spark, docs, 30)
    got = {r["url"]: r["text"] for r in pages.select("url", "text").collect()}
    raw = {
        r["url"]: r["html"]
        for r in synth_pages(docs, 30).select("url", "html").collect()
    }
    assert len(got) == 30
    for url, html in raw.items():
        if html is None:
            assert got[url] is None
            continue
        expect = preprocess_text(decode_bytes(bytes(html)))
        assert got[url] == expect, url
        assert "<script" not in got[url] and "<style" not in got[url]


def test_mined_edges_match_link_rules(spark, docs):
    _, edges = pages_link_pipeline(spark, docs, 30)
    got = sorted(
        (r["src_id"], r["dst_id"])
        for r in edges.select("src_id", "dst_id").collect()
    )
    want = sorted(
        (f"{PAGE_URL_PREFIX}{i}", f"{PAGE_URL_PREFIX}{j}")
        for i in range(30)
        if i != 7  # NULL text → no html → no outbound links
        for j in _expected_links(i, 30)
    )
    assert got == want
    types = edges.select("edge_type", "weight").distinct().collect()
    assert [(r[0], r[1]) for r in types] == [("HYPERLINK", 1.0)]


def test_mining_stage_is_jvm_only(spark, docs):
    # extraction is a pandas UDF by design; the mining stage ON TOP of an
    # already-extracted text column must not add any Python evaluation
    pages = synth_pages(docs, 30).withColumn(
        "text", F.col("html").cast("string")
    )
    plan = mine_links(pages)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_null_text_propagates(spark, docs):
    pages, edges = pages_link_pipeline(spark, docs, 30)
    row = pages.filter(F.col("url") == f"{PAGE_URL_PREFIX}7").first()
    assert row["text"] is None and row["html"] is None
    assert edges.filter(F.col("src_id") == f"{PAGE_URL_PREFIX}7").count() == 0
    # but page 7 still receives inbound links
    assert edges.filter(F.col("dst_id") == f"{PAGE_URL_PREFIX}7").count() > 0


def test_run_linkgraph_script(tmp_path):
    """spark-submit entry point (scripts/run_linkgraph.py) end-to-end at
    tiny scale: synthesize → extract → mine → 4 graph metrics, resumable
    checkpoint dir populated with lineage rows."""
    import json
    import subprocess
    import sys
    import os

    out = tmp_path / "lg_out"
    ck = tmp_path / "lg_ck"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_MASTER="local[4]")
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "scripts", "run_linkgraph.py"),
            "--synthetic", "500",
            "--out", str(out),
            "--checkpoint", str(ck),
            "--lpa-rounds", "3",
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["pages"] == 500
    # link rules emit 2 links always + 1 on even ids = 2.5 per page
    assert summary["edges"] == 1250
    assert (out / "edges").exists() and (out / "pagerank").exists()
    assert (out / "components").exists() and (out / "lpa").exists()
    # lineage written for the checkpointed superstep loops
    assert any(ck.rglob("*.parquet"))


# --- anchor-text mining + per-target rollup (mine_anchors/anchor_topk) ----

from k2_18_spark.pipeline.linkgraph import (  # noqa: E402
    anchor_topk,
    extract_text,
    mine_anchors,
)


def _expected_anchors(n: int, docs_rows):
    """(src, dst, anchor) triples from the link rules + _anchor form."""
    out = []
    for i, has_text in docs_rows:
        if not has_text:
            continue
        for dst in _expected_links(i, n):
            out.append((i, dst, f"t{(i + dst) % 5}"))
    return out


def test_mined_anchors_match_rules(spark, docs):
    pages = extract_text(synth_pages(docs, 30, varied_anchors=True))
    got = sorted(
        (r["src_id"], r["dst_id"], r["anchor"])
        for r in mine_anchors(pages).collect()
    )
    want = sorted(
        (PAGE_URL_PREFIX + str(s), PAGE_URL_PREFIX + str(d), a)
        for s, d, a in _expected_anchors(30, [(i, i != 7) for i in range(30)])
    )
    assert got == want


def test_default_anchor_is_constant_r(spark, docs):
    # varied_anchors=False must keep the original constant anchor text
    # (byte-identity of the default synthesis, which the pages_* oracle
    # checksums depend on)
    pages = extract_text(synth_pages(docs, 30))
    anchors = {r["anchor"] for r in mine_anchors(pages).collect()}
    assert anchors == {"r"}


def test_anchor_topk_hand_case(spark):
    rows = [
        ("s1", "d1", "alpha"), ("s2", "d1", "alpha"), ("s3", "d1", "alpha"),
        ("s4", "d1", "beta"), ("s5", "d1", "beta"),
        ("s6", "d1", "gamma"), ("s7", "d1", "delta"),
        ("s1", "d2", "solo"),
    ]
    an = spark.createDataFrame(rows, "src_id string, dst_id string, anchor string")
    got = {
        (r["url"], r["rnk"]): (r["anchor"], r["cnt"], r["n_anchors"], r["n_texts"])
        for r in anchor_topk(an, k=3).collect()
    }
    # top-3 for d1: alpha(3), beta(2), then count-1 tie broken by text asc
    assert got[("d1", 1)] == ("alpha", 3, 7, 4)
    assert got[("d1", 2)] == ("beta", 2, 7, 4)
    assert got[("d1", 3)] == ("delta", 1, 7, 4)
    assert got[("d2", 1)] == ("solo", 1, 1, 1)
    assert len(got) == 4


def test_anchor_rollup_totals_conserve_mass(spark, docs):
    pages = extract_text(synth_pages(docs, 30, varied_anchors=True))
    an = mine_anchors(pages)
    n_links = an.count()
    top = anchor_topk(an, k=100)  # k past every group size → full rollup
    agg = top.groupBy("url").agg(
        F.sum("cnt").alias("s"), F.first("n_anchors").alias("n")
    )
    assert agg.filter(F.col("s") != F.col("n")).count() == 0
    assert top.agg(F.sum("cnt")).collect()[0][0] == n_links


def test_anchor_mining_is_jvm_only(spark, docs):
    pages = extract_text(synth_pages(docs, 30, varied_anchors=True))
    plan = mine_anchors(pages)._jdf.queryExecution().executedPlan().toString()
    # the extractor UDF is the only Python stage; mining adds none
    assert plan.count("ArrowEvalPython") <= 1
    assert "BatchEvalPython" not in plan
