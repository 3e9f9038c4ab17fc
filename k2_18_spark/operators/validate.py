"""Stage-boundary graph invariant validation (SURVEY.md §2 validation).

Mirrors the reference's validate_graph_invariants
(src/utils/validation.py:106-169), which runs at EVERY stage boundary:

1. every node has a non-null id, and node ids are unique
2. every edge endpoint exists in the node set
3. PREREQUISITE self-loops are forbidden
4. duplicate (source, target, type) triples are forbidden

Unlike the reference (which raises on the FIRST violation while
scanning dicts), this validator is distributed and TOTAL: one
DataFrame pass per invariant, every violation reported. At 100 TB a
fail-fast scan is useless — you want the complete violation inventory
from one job. ``assert_valid_graph`` reproduces the reference's
raise-on-any-violation contract on top.

Violations schema: (kind, entity, detail) — stable, unioned from
per-invariant checks, each a single aggregation or anti-join (no
iteration, no collect except the bounded report sample).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class GraphInvariantError(RuntimeError):
    pass


VIOLATIONS_SCHEMA = "kind string, entity string, detail string"


def graph_violations(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """→ (kind, entity, detail) — one row per invariant violation."""
    null_ids = nodes.filter(F.col("id").isNull()).select(
        F.lit("node_null_id").alias("kind"),
        F.lit(None).cast("string").alias("entity"),
        F.lit("node without id").alias("detail"),
    )
    dup_ids = (
        nodes.filter(F.col("id").isNotNull())
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select(
            F.lit("node_duplicate_id").alias("kind"),
            F.col("id").alias("entity"),
            F.concat(F.lit("appears "), F.col("n"), F.lit(" times")).alias(
                "detail"
            ),
        )
    )
    ids = nodes.select("id")
    miss_src = (
        edges.join(ids.withColumnRenamed("id", "src_id"), "src_id", "left_anti")
        .select(
            F.lit("edge_missing_source").alias("kind"),
            F.col("src_id").alias("entity"),
            F.concat_ws(" -> ", "src_id", "dst_id").alias("detail"),
        )
    )
    miss_dst = (
        edges.join(ids.withColumnRenamed("id", "dst_id"), "dst_id", "left_anti")
        .select(
            F.lit("edge_missing_target").alias("kind"),
            F.col("dst_id").alias("entity"),
            F.concat_ws(" -> ", "src_id", "dst_id").alias("detail"),
        )
    )
    prereq_loops = edges.filter(
        (F.upper(F.col("edge_type")) == "PREREQUISITE")
        & (F.col("src_id") == F.col("dst_id"))
    ).select(
        F.lit("prerequisite_self_loop").alias("kind"),
        F.col("src_id").alias("entity"),
        F.concat_ws(" -> ", "src_id", "dst_id").alias("detail"),
    )
    dup_edges = (
        edges.groupBy("src_id", "dst_id", "edge_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select(
            F.lit("edge_duplicate").alias("kind"),
            F.concat_ws(" -> ", "src_id", "dst_id").alias("entity"),
            F.concat(
                F.col("edge_type"), F.lit(" x"), F.col("n")
            ).alias("detail"),
        )
    )
    return (
        null_ids.unionByName(dup_ids)
        .unionByName(miss_src)
        .unionByName(miss_dst)
        .unionByName(prereq_loops)
        .unionByName(dup_edges)
    )


def validate_graph(
    nodes: DataFrame, edges: DataFrame, sample: int = 20
) -> tuple[DataFrame, dict]:
    """→ (violations DataFrame, report dict).

    The report carries per-kind counts, an overall ``valid`` flag, and
    up to ``sample`` example violations — the machine-readable
    equivalent of the reference's GraphInvariantError messages."""
    v = graph_violations(nodes, edges).persist()
    by_kind = {r["kind"]: r["n"] for r in
               v.groupBy("kind").agg(F.count(F.lit(1)).alias("n")).collect()}
    examples = [tuple(r) for r in v.limit(sample).collect()]
    report = {
        "valid": not by_kind,
        "violations_by_kind": by_kind,
        "total_violations": int(sum(by_kind.values())),
        "examples": examples,
    }
    v.unpersist()
    return v, report


def assert_valid_graph(nodes: DataFrame, edges: DataFrame) -> dict:
    """Reference contract: raise GraphInvariantError on any violation
    (src/utils/validation.py raises on the first one it scans; the
    message here carries the full per-kind inventory instead)."""
    _, report = validate_graph(nodes, edges)
    if not report["valid"]:
        raise GraphInvariantError(
            f"graph invariants violated: {report['violations_by_kind']} "
            f"(examples: {report['examples'][:5]})"
        )
    return report
