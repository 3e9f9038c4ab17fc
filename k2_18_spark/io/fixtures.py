"""Golden-fixture loading: LearningChunkGraph JSON → nodes/edges DataFrames.

The reference ships 8 hand-calculated fixtures under viz/data/test/
(pairs test_NAME_graph.json / ..._expected.json); we copied them to
fixtures/ and use them as correctness oracles
(reference: viz/graph2metrics.py:80-135 load path).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from k2_18_spark import schemas

FIXTURES_DIR = Path(__file__).resolve().parents[2] / "fixtures"

FIXTURE_NAMES = [
    "test_line",
    "test_cycle",
    "test_star",
    "test_bridge",
    "test_disconnected",
    "test_educational",
    "test_weighted_triangle",
    "test_realistic_mini",
]


def load_graph_json(path: str | Path) -> dict:
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def graph_to_rows(data: dict) -> tuple[list, list]:
    """Row-ify a LearningChunkGraph dict, preserving file order
    (node_order / edge_order drive deterministic renumbering and the
    NetworkX last-edge-wins collapse, SURVEY.md §1.3)."""
    node_rows = []
    for i, n in enumerate(data.get("nodes", [])):
        node_rows.append(
            (
                n["id"],
                n.get("type", "Chunk"),
                n.get("text"),
                n.get("node_offset"),
                n.get("definition"),
                n.get("difficulty"),
                n.get("concepts"),
                n.get("tags"),
                n.get("language"),
                n.get("metadata"),
                i,
            )
        )
    edge_rows = []
    for i, e in enumerate(data.get("edges", [])):
        edge_rows.append(
            (
                e["source"],
                e["target"],
                e.get("type", "MENTIONS"),
                float(e["weight"]) if e.get("weight") is not None else None,
                e.get("conditions"),
                i,
            )
        )
    return node_rows, edge_rows


def load_fixture(
    spark: SparkSession, name: str, expected: bool = False
) -> tuple[DataFrame, DataFrame, dict]:
    """Load fixture ``name`` → (nodes_df, edges_df, raw_dict)."""
    suffix = "_graph_expected.json" if expected else "_graph.json"
    data = load_graph_json(FIXTURES_DIR / f"{name}{suffix}")
    node_rows, edge_rows = graph_to_rows(data)
    nodes = spark.createDataFrame(node_rows, schema=schemas.NODES)
    edges = spark.createDataFrame(edge_rows, schema=schemas.EDGES)
    return nodes, edges, data


def expected_node_metrics(name: str) -> dict[str, dict]:
    """node_id → expected metric dict from the golden expected file."""
    data = load_graph_json(FIXTURES_DIR / f"{name}_graph_expected.json")
    return {n["id"]: n for n in data["nodes"]}


def expected_edge_metrics(name: str) -> dict[tuple, dict]:
    data = load_graph_json(FIXTURES_DIR / f"{name}_graph_expected.json")
    return {(e["source"], e["target"], e.get("type")): e for e in data["edges"]}
