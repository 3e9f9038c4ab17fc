"""Self-contained HTML report sink (SURVEY.md S9).

Reference: viz/graph2html.py:268-527 — Jinja2 template + the graph
JSON minified (``ensure_ascii=False, separators=(",", ":")``) and
EMBEDDED into one self-contained HTML file (no external fetches when
``embed_libraries`` is on). The interactive vis-network layer is
presentation; what this sink reproduces is the data engineering:

- collect the (trimmed, ≤ ``max_collect``) metrics graph,
- build the LearningChunkGraph-shaped payload with ``_meta``,
- embed it minified in a ``<script type="application/json">`` data
  island exactly like the reference embeds ``graph_data``,
- render summary + top-node tables server-side so the artifact is
  readable with zero JavaScript.

Like the reference (and the demo-path generator) this is a driver-side
presentation step over the trimmed subgraph — a hard guard refuses
untrimmed inputs.
"""

from __future__ import annotations

import html as _html
import json
import os

from pyspark.sql import DataFrame

_PAGE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>{title}</title>
<style>
body {{ font-family: sans-serif; margin: 2rem; color: #222; }}
table {{ border-collapse: collapse; margin: 1rem 0; }}
th, td {{ border: 1px solid #bbb; padding: 0.3rem 0.7rem; text-align: left; }}
th {{ background: #eee; }}
caption {{ font-weight: bold; text-align: left; padding: 0.3rem 0; }}
</style>
</head>
<body>
<h1>{title}</h1>
{summary_table}
{top_table}
{cluster_table}
<script type="application/json" id="graph-data">{graph_json}</script>
</body>
</html>
"""


def _table(caption: str, headers: list[str], rows: list[tuple]) -> str:
    if not rows:
        return ""
    head = "".join(f"<th>{_html.escape(str(h))}</th>" for h in headers)
    body = "".join(
        "<tr>" + "".join(f"<td>{_html.escape(str(v))}</td>" for v in r) + "</tr>"
        for r in rows
    )
    return (
        f"<table><caption>{_html.escape(caption)}</caption>"
        f"<tr>{head}</tr>{body}</table>"
    )


def write_html_report(
    nodes: DataFrame,
    edges: DataFrame,
    path: str,
    title: str = "Knowledge Graph Report",
    meta: dict | None = None,
    top_k: int = 20,
    max_collect: int = 5000,
) -> str:
    """Write a self-contained HTML report; → the written path.

    ``nodes`` is a metrics-enriched node table (compute_all_metrics
    output or any subset of its columns); ``edges`` the edge table.
    The embedded JSON is minified with the reference's separators so a
    consumer of the reference's data island can switch unchanged."""
    n = nodes.count()
    if n > max_collect:
        raise RuntimeError(
            f"HTML report is a driver-side presentation sink; trim the "
            f"graph below {max_collect} nodes first (got {n})"
        )
    node_rows = [r.asDict(recursive=True) for r in nodes.collect()]
    edge_rows = [r.asDict(recursive=True) for r in edges.collect()]
    payload = {
        "nodes": node_rows,
        "edges": edge_rows,
        "_meta": {"title": title, **(meta or {})},
    }
    graph_json = json.dumps(
        payload, ensure_ascii=False, separators=(",", ":"), default=str
    )
    # "</" must not appear inside a script element (premature close)
    graph_json = graph_json.replace("</", "<\\/")

    summary = _table(
        "Summary",
        ["nodes", "edges"] + sorted(meta or {}),
        [tuple([len(node_rows), len(edge_rows)]
               + [(meta or {})[k] for k in sorted(meta or {})])],
    )
    top_table = ""
    if node_rows and "pagerank" in node_rows[0]:
        top = sorted(
            node_rows, key=lambda r: (-(r.get("pagerank") or 0.0), r["id"])
        )[:top_k]
        cols = [c for c in ("id", "pagerank", "educational_importance",
                            "cluster_id", "prerequisite_depth") if c in top[0]]
        top_table = _table(
            f"Top {len(top)} nodes by PageRank",
            cols,
            [tuple(r.get(c) for c in cols) for r in top],
        )
    cluster_table = ""
    if node_rows and "cluster_id" in node_rows[0]:
        sizes: dict = {}
        for r in node_rows:
            sizes[r["cluster_id"]] = sizes.get(r["cluster_id"], 0) + 1
        cluster_table = _table(
            "Cluster sizes",
            ["cluster_id", "members"],
            sorted(sizes.items()),
        )

    doc = _PAGE.format(
        title=_html.escape(title),
        summary_table=summary,
        top_table=top_table,
        cluster_table=cluster_table,
        graph_json=graph_json,
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write(doc)
    return path
