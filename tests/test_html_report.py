"""HTML report sink (S9): self-contained artifact with the reference's
minified embedded-JSON data island (viz/graph2html.py:268-527)."""

import json
import re

import pytest

from k2_18_spark.io import fixtures
from k2_18_spark.io.html_report import write_html_report


def test_html_report_roundtrip(spark, tmp_path):
    from k2_18_spark.pipeline.metrics import compute_all_metrics

    nodes, edges, _ = fixtures.load_fixture(spark, "test_realistic_mini")
    nm, em, summary = compute_all_metrics(spark, nodes, edges)
    out = str(tmp_path / "report.html")
    write_html_report(
        nm, em, out, title="mini <graph>",
        meta={"num_clusters": summary["num_clusters"]},
    )
    doc = open(out, encoding="utf-8").read()
    # self-contained: no external fetches
    assert "http://" not in doc and "https://" not in doc
    # the data island round-trips and carries every node and edge
    m = re.search(
        r'<script type="application/json" id="graph-data">(.*)</script>',
        doc, re.S,
    )
    payload = json.loads(m.group(1).replace("<\\/", "</"))
    assert len(payload["nodes"]) == nodes.count()
    assert len(payload["edges"]) == edges.count()
    assert payload["_meta"]["title"] == "mini <graph>"
    # server-side tables render without JS
    assert "Top" in doc and "Cluster sizes" in doc
    # title is escaped in markup
    assert "mini &lt;graph&gt;" in doc


def test_html_report_guard(spark, tmp_path):
    nodes = spark.createDataFrame(
        [(f"n{i}",) for i in range(30)], "id string"
    )
    edges = spark.createDataFrame([], "src_id string, dst_id string")
    with pytest.raises(RuntimeError, match="trim"):
        write_html_report(nodes, edges, str(tmp_path / "x.html"), max_collect=10)
