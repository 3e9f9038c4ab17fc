"""Graph-fix scalar transforms (SURVEY.md F13/F14 —
reference viz/graph_fix.py:133-305)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MARKERS = ["added_by=", "fixed_by=", "auto_generated"]
LLM_PREFIX = "[added_by=LLM] "


def tag_llm_text(col: Column) -> Column:
    """Prefix ``[added_by=LLM]`` unless a provenance marker is already
    present (F13)."""
    has_marker = F.lit(False)
    for m in MARKERS:
        has_marker = has_marker | col.contains(m)
    return F.when(
        col.isNotNull() & ~has_marker, F.concat(F.lit(LLM_PREFIX), col)
    ).otherwise(col)


def concept_display_text(concepts: DataFrame) -> DataFrame:
    """``primary (alias1, alias2)`` display text per concept (F14)."""
    aliases = F.coalesce(F.col("term.aliases"), F.array())
    return concepts.withColumn(
        "display_text",
        F.when(
            F.size(aliases) > 0,
            F.concat(
                F.col("term.primary"),
                F.lit(" ("),
                F.array_join(aliases, ", "),
                F.lit(")"),
            ),
        ).otherwise(F.col("term.primary")),
    )
