"""Stateful streaming sessionization — the custom-stateful-operator
mirror of ``operators/sessions.py``.

``applyInPandasWithState`` keeps one tiny state row per ACTIVE user
(last event's floor-second epoch + running session counter) and
assigns every incoming event its ``session_seq`` / ``session_id``
with the batch operator's exact rule: a strictly-greater-than-gap
jump in floor-second event time starts a new session, ties within a
micro-batch break on ``event_id``. When events arrive in event-time
order across micro-batches (the file-source replay case and any
per-user-ordered log), the assignments are IDENTICAL to running the
batch ``sessionize`` over the concatenated input — tested
byte-for-byte. Out-of-order arrival ACROSS micro-batches is the
standard streaming-sessionizer caveat: an event older than its
user's state continues the current session rather than rewriting
history (bounded by the watermark below).

State stays bounded two ways: one row per user (not per event), and
an event-time timeout at ``last_ts + gap`` — once the watermark
passes a user's gap horizon their session cannot be extended, so the
state row is dropped (the ``dropDuplicatesWithinWatermark`` lesson
from ``streaming/ingest.py``: streaming state you never evict is a
leak at crawl scale).

Scale shape: the grouping shuffles each micro-batch once on
``user_id`` — the same single-Exchange shape as the batch window —
and the state store holds O(active users) rows regardless of stream
length.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("session_seq", LongType()),
        StructField("session_id", StringType()),
    ]
)

SESSION_STATE = StructType(
    [
        StructField("last_epoch", LongType()),
        StructField("session_seq", LongType()),
    ]
)


def _make_assigner(gap_seconds: int):
    def assign(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed the user's gap horizon: no future event
            # can continue this session — drop the state row
            state.remove()
            return
        user_id = key[0]
        last_epoch, seq = state.get if state.exists else (None, 0)
        out = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            # floor-second epoch mirrors the batch unix_timestamp rule
            epochs = (pdf["ts"].astype("int64") // 1_000_000_000).tolist()
            seqs = []
            for e in epochs:
                if last_epoch is None or e - last_epoch > gap_seconds:
                    seq += 1
                last_epoch = e
                seqs.append(seq)
            pdf = pdf.assign(
                session_seq=pd.Series(seqs, index=pdf.index, dtype="int64"),
            )
            pdf["session_id"] = (
                str(user_id) + ":" + pdf["session_seq"].astype(str)
            )
            out.append(
                pdf[
                    [
                        "event_id",
                        "ts",
                        "user_id",
                        "event_type",
                        "value",
                        "session_seq",
                        "session_id",
                    ]
                ]
            )
        if last_epoch is not None:
            state.update((int(last_epoch), int(seq)))
            # evict once the watermark is past last_ts + gap
            state.setTimeoutTimestamp((int(last_epoch) + gap_seconds) * 1000)
        yield from out

    return assign


def stream_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """events stream (event_id, ts, user_id, event_type, value[, …])
    → same rows + (session_seq, session_id), state bounded to active
    users via event-time timeout."""
    return (
        events.select(
            "event_id", ts_col, "user_id", "event_type", "value"
        )
        .withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_assigner(gap_seconds),
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
