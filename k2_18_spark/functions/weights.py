"""Weight sanitation / inverse-weight column expressions (SURVEY.md P4,
F11, F12; reference viz/graph2metrics.py:204-224,387-414,190-201)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPS = 1e-9
INV_CAP = 1e9


def inverse_weight(weight: Column) -> Column:
    """1/w for w>0 else +inf (reference viz/graph2metrics.py:217-222)."""
    return F.when(weight > 0, F.lit(1.0) / weight).otherwise(F.lit(float("inf")))


def sanitized_weight(weight: Column) -> Column:
    """Missing → 1.0; non-positive → eps (viz/graph2metrics.py:404-410)."""
    w = F.coalesce(weight, F.lit(1.0))
    return F.when(w <= 0, F.lit(EPS)).otherwise(w.cast("double"))


def sanitized_inverse_weight(weight: Column) -> Column:
    """min(1 / max(w, eps), 1e9) (viz/graph2metrics.py:412-414)."""
    w = F.greatest(sanitized_weight(weight), F.lit(EPS))
    return F.least(F.lit(1.0) / w, F.lit(INV_CAP))


def safe_metric(col: Column) -> Column:
    """None/NaN/±inf → 0.0 (viz/graph2metrics.py:190-201)."""
    return F.when(
        col.isNull() | F.isnan(col) | (F.abs(col) == float("inf")), F.lit(0.0)
    ).otherwise(col.cast("double"))


def with_inverse_weight(edges: DataFrame, weight_col: str = "weight") -> DataFrame:
    return edges.withColumn("inverse_weight", inverse_weight(F.col(weight_col)))
