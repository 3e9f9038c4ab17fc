"""Stateful streaming sessionization (streaming/sessions.py): must
agree byte-for-byte with the batch operator on in-order replays,
carry state across micro-batches, and evict via event-time timeout
configuration."""

import datetime as dt

from k2_18_spark.operators.sessions import sessionize
from k2_18_spark.streaming.sessions import stream_sessionize

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double"
)
T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _rows(specs):
    return [
        (i, T0 + dt.timedelta(seconds=s), u, t, v)
        for i, (s, u, t, v) in enumerate(specs)
    ]


def _run_stream(spark, tmp_path, batches, gap_seconds):
    """Write each batch as one parquet file, replay with
    maxFilesPerTrigger=1 (one micro-batch per file), drain with
    availableNow."""
    src = str(tmp_path / "events_src")
    for i, batch in enumerate(batches):
        spark.createDataFrame(batch, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "sessions_out")
    ck = str(tmp_path / "ck")
    q = (
        stream_sessionize(stream, gap_seconds=gap_seconds)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def test_stream_matches_batch_in_order(spark, tmp_path):
    # two users; sessions continue AND break across the batch split
    specs = [
        (0, 1, "a", 1.0),
        (100, 1, "a", 2.0),
        (50, 2, "a", 1.0),
        # ---- micro-batch boundary ----
        (200, 1, "b", 3.0),     # continues user 1 session 1
        (5000, 1, "a", 4.0),    # gap 4800 > 1800 → session 2
        (60, 2, "b", 1.0),      # continues user 2 session 1
        (9000, 2, "a", 1.0),    # new session for user 2
    ]
    rows = _rows(specs)
    got = _run_stream(spark, tmp_path, [rows[:3], rows[3:]], 1800)
    batch_df = sessionize(
        spark.createDataFrame(rows, SCHEMA), gap_seconds=1800
    ).select(
        "event_id", "ts", "user_id", "event_type", "value",
        "session_seq", "session_id",
    )
    g = sorted(
        (r.event_id, r.session_seq, r.session_id) for r in got.collect()
    )
    b = sorted(
        (r.event_id, r.session_seq, r.session_id)
        for r in batch_df.collect()
    )
    assert g == b
    assert len(g) == len(specs)


def test_gap_boundary_rule_matches_batch(spark, tmp_path):
    # exactly-gap stays, gap+1 breaks — the batch strictly-greater rule
    specs = [
        (0, 1, "a", 1.0),
        (1800, 1, "a", 1.0),
        (3601, 1, "a", 1.0),
    ]
    rows = _rows(specs)
    got = _run_stream(spark, tmp_path, [rows], 1800)
    seqs = {r.event_id: r.session_seq for r in got.collect()}
    assert seqs == {0: 1, 1: 1, 2: 2}


def test_state_continuity_three_batches(spark, tmp_path):
    # one event per micro-batch: the counter must keep climbing only
    # on true gaps, proving state survives batch boundaries
    specs = [
        (0, 7, "a", 1.0),
        (100, 7, "a", 1.0),
        (10_000, 7, "a", 1.0),
    ]
    rows = _rows(specs)
    got = _run_stream(
        spark, tmp_path, [[rows[0]], [rows[1]], [rows[2]]], 1800
    )
    seqs = {r.event_id: r.session_seq for r in got.collect()}
    assert seqs == {0: 1, 1: 1, 2: 2}
    ids = {r.event_id: r.session_id for r in got.collect()}
    assert ids[2] == "7:2"
