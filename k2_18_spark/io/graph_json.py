"""LearningChunkGraph JSON source/sink (SURVEY.md S4/S5).

The reference stores the graph as one JSON document {nodes, edges}
plus a ``_meta`` dict (viz/graph2metrics.py:80-135, 1638-1678). The
engine's canonical storage is the nodes/edges tables; these adapters
exist for interop/parity testing — multiline ``spark.read.json`` +
explode on read, ``toJSON``-style collect on write (driver-side — the
reference format is a single document by definition, so this sink is
only for fixture-scale exports)."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k2_18_spark import schemas
from k2_18_spark.io.fixtures import graph_to_rows


def read_graph_json(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, dict]:
    """Load + row-ify a LearningChunkGraph JSON file → (nodes, edges,
    _meta). Order columns preserve file order (determinism: SURVEY
    §1.3)."""
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    node_rows, edge_rows = graph_to_rows(data)
    nodes = spark.createDataFrame(node_rows, schemas.NODES)
    edges = spark.createDataFrame(edge_rows, schemas.EDGES)
    return nodes, edges, data.get("_meta", {})


def write_graph_json(
    nodes: DataFrame,
    edges: DataFrame,
    path: str,
    meta: dict | None = None,
) -> None:
    """Collect-to-driver single-document sink (S5), `_meta` merged.
    Node/edge order follows node_order/edge_order when present."""
    ncols = [c for c in nodes.columns if c not in ("node_order",)]
    node_sort = "node_order" if "node_order" in nodes.columns else "id"
    nrows = [
        {k: v for k, v in r.asDict().items() if k != "node_order" and v is not None}
        for r in nodes.orderBy(node_sort).select(*ncols, *(
            ["node_order"] if "node_order" in nodes.columns else []
        )).collect()
    ]
    ecols = [c for c in edges.columns if c != "edge_order"]
    edge_sort = "edge_order" if "edge_order" in edges.columns else "src_id"
    erows = []
    for r in edges.orderBy(edge_sort).collect():
        d = r.asDict()
        erows.append(
            {
                "source": d["src_id"],
                "target": d["dst_id"],
                "type": d["edge_type"],
                **{
                    k: v
                    for k, v in d.items()
                    if k not in ("src_id", "dst_id", "edge_type", "edge_order")
                    and v is not None
                },
            }
        )
    doc = {"nodes": nrows, "edges": erows}
    if meta:
        doc["_meta"] = meta
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f, ensure_ascii=False, indent=2)
