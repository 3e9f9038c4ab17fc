"""Funnel analysis — ordered-step conversion over event streams.

The clickstream companion of ``operators/sessions.py``: given an
ordered step list (view → click → purchase), find how far each user
progressed under first-touch greedy matching — the semantics every
product-analytics engine (and the SQL idiom behind them) uses:

- step 1 matches the user's EARLIEST step-1 event;
- step k matches the earliest step-k event STRICTLY AFTER the matched
  step k−1 event (ties on timestamp break by event_id, consistent
  with the sessionizer);
- with ``within_seconds``, every step must land within that horizon
  of the matched step-1 event (the classic conversion window).

Deterministic: each match is an argmin over (ts, event_id), so the
result is a pure function of the input.

Scale shape: one filtered aggregate per step — step k is a
min(struct(ts, event_id)) groupBy(user) over the step-k events
joined to the step k−1 matches. All k−1 joins and every groupBy key
on ``user_id``: Catalyst plans ONE hash partitioning and reuses it
down the chain (k is small and fixed — a 3-step funnel is 3 filtered
aggregates over event subsets, NOT k passes over the full table,
since each stage filters to its step's type first). No window sort
over the whole event table, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    within_seconds: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """→ (user_id, steps_completed, step1_ts … stepK_ts): one row per
    user who completed ≥ 1 step; timestamps NULL past the furthest
    step."""
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("y"),
        F.col(id_col).alias("e"),
    )
    # step 1: earliest step-1 event per user
    cur = (
        ev.filter(F.col("y") == steps[0])
        .groupBy("u")
        .agg(F.min(F.struct("t", "e")).alias("m"))
        .select("u", F.col("m.t").alias("t1"))
    )
    out = cur.select("u", "t1")
    for k, step in enumerate(steps[1:], start=2):
        prev_t = f"t{k - 1}"
        keep = ["u", "t1"] if prev_t == "t1" else ["u", "t1", prev_t]
        joined = ev.filter(F.col("y") == step).join(
            out.select(*keep), "u"
        )
        gate = F.col("t") > F.col(prev_t)
        if within_seconds is not None:
            gate = gate & (
                F.unix_timestamp("t") - F.unix_timestamp("t1")
                <= within_seconds
            )
        nxt = (
            joined.filter(gate)
            .groupBy("u")
            .agg(F.min(F.struct("t", "e")).alias("m"))
            .select("u", F.col("m.t").alias(f"t{k}"))
        )
        out = out.join(nxt, "u", "left")
    sel = [F.col("u").alias(user_col)]
    completed = F.lit(0)
    for k in range(1, len(steps) + 1):
        sel.append(F.col(f"t{k}").alias(f"step{k}_ts"))
        completed = completed + F.when(
            F.col(f"t{k}").isNotNull(), 1
        ).otherwise(0)
    return out.select(*sel, completed.cast("int").alias("steps_completed"))


def funnel_stats(funnel_df: DataFrame, n_steps: int) -> DataFrame:
    """→ (step, users, conversion_from_prev, conversion_from_first)
    rounded at 6 decimals — the funnel report table."""
    counts = funnel_df.agg(
        *[
            F.sum(
                F.when(F.col(f"step{k}_ts").isNotNull(), 1).otherwise(0)
            ).alias(f"c{k}")
            for k in range(1, n_steps + 1)
        ]
    )
    rows = None
    for k in range(1, n_steps + 1):
        prev = F.col(f"c{k - 1}") if k > 1 else F.col("c1")
        r = counts.select(
            F.lit(k).alias("step"),
            F.col(f"c{k}").cast("long").alias("users"),
            F.round(
                F.when(prev > 0, F.col(f"c{k}") / prev).otherwise(0.0), 6
            ).alias("conversion_from_prev"),
            F.round(
                F.when(
                    F.col("c1") > 0, F.col(f"c{k}") / F.col("c1")
                ).otherwise(0.0),
                6,
            ).alias("conversion_from_first"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows
