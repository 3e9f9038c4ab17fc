"""Sessionization — gap-based event grouping per user.

The canonical large-scale clickstream operator: assign every event to
a session, where a new session starts whenever the gap to the user's
previous event exceeds ``gap_seconds`` (the classic 30-minute web
analytics rule). The reference has no event-stream surface; this is a
web-scale addition over the driver's ``events`` table
(event_id, ts, user_id, event_type, value, props), the shape a
training-data pipeline uses to segment user interaction logs into
conversation/browsing episodes.

Semantics (deterministic):

- events ordered by ``(ts, event_id)`` within a user — the event_id
  tie-break pins simultaneous timestamps;
- ``is_start = (prev ts IS NULL) OR (ts - prev_ts > gap_seconds)``
  (strictly greater: a gap of exactly ``gap_seconds`` continues the
  session, matching the common SQL-window formulation);
- ``session_seq`` = running count of starts per user (1-based);
- ``session_id = '<user_id>:<session_seq>'``.

Scale shape: ONE shuffle — the window partitions by ``user_id``; lag,
the start flag, and the running sum all evaluate inside that single
hash partitioning (Catalyst plans one Exchange + one Sort for the
whole chain, and ``session_stats`` reuses the same partitioning for
its groupBy, so the rollup adds no second full shuffle of the event
table). Per-user event counts are bounded (a user generates human-
rate events), so the per-partition sort is safe at 10^12 events;
a pathological machine-generated user is the one skew case — cap or
pre-split such keys upstream if a single user exceeds executor
memory, the same guard every sessionizer at scale documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign session ids → input columns + (session_seq, session_id).

    A session break happens when the gap to the user's previous event
    (by ``(ts, tiebreak)`` order) is strictly greater than
    ``gap_seconds``.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_start = F.when(
        prev_ts.isNull()
        | (
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
            > gap_seconds
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    out = events.withColumn("_start", is_start).withColumn(
        "session_seq",
        F.sum("_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return out.withColumn(
        "session_id",
        F.concat_ws(":", F.col(user_col).cast("string"), F.col("session_seq")),
    ).drop("_start")


def session_stats(
    sessions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-session rollup → (user_id, session_seq, session_id,
    n_events, started, ended, duration_sec, total_value,
    n_event_types).

    Grouped on the sessionize() output; Catalyst reuses the window's
    user_id hash partitioning, so no second event-table shuffle.
    """
    return sessions.groupBy(user_col, "session_seq", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("started"),
        F.max(ts_col).alias("ended"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("duration_sec"),
        F.round(F.sum(value_col), 6).alias("total_value"),
        F.countDistinct(type_col).alias("n_event_types"),
    )
