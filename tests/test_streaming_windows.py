"""Streaming sliding (hopping) and session windows — the §2.2 window
categories beyond the reference's single tumbling case, driven through
real micro-batch triggers."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

import pytest

from kafka_streams_spring_cloud_stream_tp1_spark.operators.core import (
    session_window_counts,
    sliding_window_counts,
)
from kafka_streams_spring_cloud_stream_tp1_spark.schemas import EVENTS_SCHEMA

_EPOCH0 = datetime(2024, 1, 1)


def _event(i, second, etype="P1", value=200.0):
    ts = _EPOCH0 + timedelta(seconds=second)
    return {
        "event_id": i,
        "ts": ts.strftime("%Y-%m-%d %H:%M:%S.%f"),
        "user_id": 1,
        "event_type": etype,
        "value": value,
    }


def _write_batch(dirpath, name, rows):
    with open(f"{dirpath}/{name}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture
def stream_dir(tmp_path):
    d = tmp_path / "win_in"
    d.mkdir()
    return str(d)


def test_streaming_sliding_window_multi_assignment(spark, stream_dir):
    """window=10s, slide=5s: an event at t=7s must update BOTH
    [0,10) and [5,15) — the defining hopping-window property."""
    events = spark.readStream.schema(EVENTS_SCHEMA).json(stream_dir)
    counts = sliding_window_counts(
        events.withWatermark("ts", "10 seconds"), window="10 seconds", slide="5 seconds"
    )
    q = (
        counts.selectExpr("name", "window.start AS ws", "cnt")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("slide_win")
        .start()
    )
    try:
        _write_batch(stream_dir, "b1", [_event(0, 7.0)])
        q.processAllAvailable()
        got = {(r["name"], r["ws"].second): r["cnt"] for r in spark.table("slide_win").collect()}
        assert got == {("P1", 0): 1, ("P1", 5): 1}
    finally:
        q.stop()


def test_streaming_session_window_merge_and_close(spark, stream_dir):
    """gap=5s: events at 1,2,3s merge into ONE session [1s, 8s); an
    event at 30s starts a new session. Append mode emits a session
    only after the watermark passes its close — the second batch's
    high timestamp advances the watermark and flushes the first
    session."""
    events = spark.readStream.schema(EVENTS_SCHEMA).json(stream_dir)
    sessions = session_window_counts(
        events.withWatermark("ts", "10 seconds"), gap="5 seconds"
    )
    q = (
        sessions.selectExpr(
            "name", "session_window.start AS ss", "session_window.end AS se", "cnt"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_win")
        .start()
    )
    try:
        _write_batch(stream_dir, "b1", [_event(0, 1.0), _event(1, 2.0), _event(2, 3.0)])
        q.processAllAvailable()
        _write_batch(stream_dir, "b2", [_event(3, 30.0)])
        q.processAllAvailable()
        # one more empty-ish advance so the watermark update finalizes
        _write_batch(stream_dir, "b3", [_event(4, 60.0)])
        q.processAllAvailable()
        rows = {
            (r["ss"].second, r["se"].second, r["cnt"])
            for r in spark.table("sess_win").collect()
        }
        assert (1, 8, 3) in rows, rows  # merged session of 3 events, end = last+gap
    finally:
        q.stop()


def test_session_live_trigger_lane(spark, stream_dir):
    """The live-trigger session lane (processingTime=0.3 s, real
    wall-clock triggers — NOT processAllAvailable): three events
    within the 5 s gap merge into one session that is emitted in
    append mode only after a later batch advances the watermark past
    its close. Polls the sink with a deadline instead of draining, so
    the assertion exercises the trigger cadence itself."""
    import time as _time

    from kafka_streams_spring_cloud_stream_tp1_spark.streaming.pipeline import (
        start_session_stream,
    )

    events = spark.readStream.schema(EVENTS_SCHEMA).json(stream_dir)
    q = start_session_stream(
        events, table="sess_live", trigger_seconds=0.3, watermark="10 seconds"
    )
    try:
        _write_batch(stream_dir, "b1", [_event(0, 1.0), _event(1, 2.0), _event(2, 3.0)])
        # watermark pushers: a far-future event closes the first session
        _write_batch(stream_dir, "b2", [_event(3, 30.0)])
        _write_batch(stream_dir, "b3", [_event(4, 60.0)])
        deadline = _time.monotonic() + 30
        rows = set()
        while _time.monotonic() < deadline:
            rows = {
                (r["session_start"].second, r["session_end"].second, r["cnt"])
                for r in spark.table("sess_live").collect()
            }
            if (1, 8, 3) in rows:
                break
            _time.sleep(0.3)
        assert (1, 8, 3) in rows, rows
    finally:
        q.stop()
