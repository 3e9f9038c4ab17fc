"""Anomaly / invariant detection suite (SURVEY.md A4–A7, G12, U5 —
reference viz/anomaly_detector.py).

Every check is a DataFrame program returning violation rows (empty =
healthy); ``run_all`` aggregates a JSON-able report like the
reference's anomaly report sink (S7)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_sum_check(
    node_metrics: DataFrame, col: str = "pagerank", tol: float = 0.01
) -> dict:
    """A4: Σ pagerank == 1 ± tol (viz/anomaly_detector.py:146-187)."""
    s = node_metrics.agg(F.sum(col)).collect()[0][0] or 0.0
    return {"metric": col, "sum": s, "ok": abs(s - 1.0) <= tol}


def sequential_component_ids_check(node_metrics: DataFrame) -> dict:
    """component ids must be 0..k-1 with no gaps."""
    rows = node_metrics.agg(
        F.min("component_id"), F.max("component_id"), F.countDistinct("component_id")
    ).collect()[0]
    mn, mx, k = rows
    ok = mn == 0 and mx == k - 1
    return {"metric": "component_id", "min": mn, "max": mx, "distinct": k, "ok": ok}


def singleton_clusters(node_metrics: DataFrame) -> DataFrame:
    """A5: clusters of size 1 (viz/anomaly_detector.py:438-450)."""
    return (
        node_metrics.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("size"))
        .filter(F.col("size") == 1)
    )


def iqr_outliers(
    df: DataFrame, col: str, factor: float = 1.5, accuracy: int = 10_000
) -> DataFrame:
    """A6: IQR outlier rows (viz/anomaly_detector.py:463-530).

    ``accuracy``: percentile_approx rank-error bound is n/accuracy —
    raise above n for exact quantiles (≡ DuckDB quantile_disc; the
    oracle relies on this)."""
    q = df.agg(
        F.percentile_approx(col, 0.25, accuracy).alias("q1"),
        F.percentile_approx(col, 0.75, accuracy).alias("q3"),
    ).collect()[0]
    iqr = q["q3"] - q["q1"]
    lo, hi = q["q1"] - factor * iqr, q["q3"] + factor * iqr
    return df.filter((F.col(col) < lo) | (F.col(col) > hi))


def metric_summary(df: DataFrame, cols: list[str]) -> DataFrame:
    """A7: min/max/mean per metric."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.avg(c).alias(f"{c}_mean"),
        ]
    return df.agg(*aggs)


def bidirectional_prerequisites(edges: DataFrame) -> DataFrame:
    """G12 (pair check): A→B and B→A both PREREQUISITE
    (viz/anomaly_detector.py:294-335). → (a, b) with a<b."""
    p = edges.filter(F.upper("edge_type") == "PREREQUISITE").select(
        "src_id", "dst_id"
    )
    rev = p.select(
        F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id")
    )
    both = p.intersect(rev)
    return (
        both.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
    )


def prerequisite_cycles(edges: DataFrame) -> DataFrame:
    """G12 (general): vertices on PREREQUISITE cycles via iterative
    zero-in/out-degree peeling (viz/anomaly_detector.py:586-632).
    → (id) of cyclic-core vertices."""
    e = (
        edges.filter(F.upper("edge_type") == "PREREQUISITE")
        .select("src_id", "dst_id")
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    while True:
        srcs = e.select(F.col("src_id").alias("id")).distinct()
        dsts = e.select(F.col("dst_id").alias("id")).distinct()
        core = srcs.join(dsts, "id")
        ne = e.join(
            core.withColumnRenamed("id", "src_id"), "src_id", "left_semi"
        ).join(
            core.withColumnRenamed("id", "dst_id"), "dst_id", "left_semi"
        ).localCheckpoint(eager=True)
        if ne.count() in (0, e.count()):
            e = ne
            break
        e = ne
    return (
        e.select(F.col("src_id").alias("id"))
        .union(e.select(F.col("dst_id").alias("id")))
        .distinct()
    )


def dangling_assessments(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """U5: Assessments that never source a TESTS edge
    (viz/anomaly_detector.py:552-584)."""
    assessments = nodes.filter(F.col("type") == "Assessment").select("id")
    testers = (
        edges.filter(F.upper("edge_type") == "TESTS")
        .select(F.col("src_id").alias("id"))
        .distinct()
    )
    return assessments.join(testers, "id", "left_anti")


def run_all(nodes_with_metrics: DataFrame, edges: DataFrame) -> dict:
    """Aggregate anomaly report (S7 equivalent)."""
    report = {
        "pagerank_sum": pagerank_sum_check(nodes_with_metrics, "pagerank"),
        "educational_importance_sum": pagerank_sum_check(
            nodes_with_metrics, "educational_importance"
        ),
        "component_ids": sequential_component_ids_check(nodes_with_metrics),
        "singleton_clusters": singleton_clusters(nodes_with_metrics).count(),
        "bidirectional_prerequisites": bidirectional_prerequisites(edges).count(),
        "prerequisite_cycle_vertices": prerequisite_cycles(edges).count(),
        "dangling_assessments": dangling_assessments(
            nodes_with_metrics, edges
        ).count(),
    }
    report["ok"] = (
        report["pagerank_sum"]["ok"]
        and report["educational_importance_sum"]["ok"]
        and report["component_ids"]["ok"]
    )
    return report
