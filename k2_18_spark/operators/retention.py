"""Cohort retention — the third classic clickstream rollup next to
sessionization (operators/sessions.py) and funnels
(operators/funnels.py).

Users are cohorted by the week of their FIRST event (Monday-start
``date_trunc('week')`` — Spark and DuckDB agree); for every (cohort
week, week offset) the report counts how many of the cohort's users
were active that week, plus the retention rate against cohort size.
Offsets are computed from floor-second epochs of the truncated weeks
(exact integers — no calendar arithmetic ambiguity between engines).

Scale shape: one min-aggregate per user (map-side combinable), one
distinct (user, week) projection — repeats collapse map-side, the
whole point for high-frequency users — and one (cohort, offset)
groupBy. All three keys hash-partition on user or small rollup keys;
no windows, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """→ (cohort_week date, week_offset, active_users, cohort_size,
    retention rounded 6dp), one row per (cohort, offset) with ≥ 1
    active user. Offset 0 always has retention 1.0 by construction."""
    wk = F.date_trunc("week", F.col(ts_col))
    first = (
        events.select(F.col(user_col).alias("u"), wk.alias("w"))
        .groupBy("u")
        .agg(F.min("w").alias("cohort"))
    )
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    active = (
        events.select(F.col(user_col).alias("u"), wk.alias("w"))
        .distinct()
        .join(first, "u")
        .select(
            "cohort",
            (
                (F.unix_timestamp("w") - F.unix_timestamp("cohort"))
                / 604800
            )
            .cast("long")
            .alias("week_offset"),
            "u",
        )
        .groupBy("cohort", "week_offset")
        .agg(F.countDistinct("u").alias("active_users"))
    )
    return (
        active.join(sizes, "cohort")
        .select(
            F.to_date("cohort").alias("cohort_week"),
            "week_offset",
            "active_users",
            "cohort_size",
            F.round(
                F.col("active_users") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
    )
