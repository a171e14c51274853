"""Fault tolerance: a stopped streaming query restarted from its
checkpoint must (a) restore aggregation state — counts keep
accumulating in windows that existed before the stop — and (b) not
re-deliver already-committed epochs' data as duplicates (idempotent
upsert + checkpointed offsets = exactly-once effect)."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

import pytest

from kafka_streams_spring_cloud_stream_tp1_spark.schemas import EVENTS_SCHEMA
from kafka_streams_spring_cloud_stream_tp1_spark.streaming.sinks import (
    DictKVStore,
    KVCountStore,
)

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


def test_restart_from_checkpoint_restores_state(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    events = lambda: spark.readStream.schema(EVENTS_SCHEMA).json(str(src))  # noqa: E731

    store1 = DictKVStore()
    run1 = KVCountStore.start(spark, events(), store1, ckpt)
    try:
        _write_batch(str(src), "b1", [_event(0, 1.0), _event(1, 2.0)])
        run1.process_all()
        snap1 = {k[0:1] + (k[1].second,): v for k, v in store1.snapshot().items()}
        assert snap1 == {("P1", 0): 2}
    finally:
        run1.stop()

    # restart: NEW store (simulating the external KV surviving, Spark
    # state coming from the checkpoint), same checkpoint dir
    store2 = DictKVStore()
    run2 = KVCountStore.start(spark, events(), store2, ckpt)
    try:
        _write_batch(str(src), "b2", [_event(2, 3.0)])  # same [0,5s) window
        run2.process_all()
        snap2 = {k[0:1] + (k[1].second,): v for k, v in store2.snapshot().items()}
        # count continues from restored state: 2 (pre-stop) + 1 = 3
        assert snap2 == {("P1", 0): 3}, snap2
    finally:
        run2.stop()


def test_streaming_parquet_ingest_exactly_once(spark, tmp_path):
    """Streaming append to partitioned parquet: all rows land exactly
    once, directory-partitioned; a restart from the checkpoint does
    not duplicate already-committed batches."""
    from kafka_streams_spring_cloud_stream_tp1_spark.streaming.sinks import (
        start_parquet_ingest,
    )

    src, out, ckpt = tmp_path / "in", str(tmp_path / "lake"), str(tmp_path / "ck")
    src.mkdir()
    events = lambda: spark.readStream.schema(EVENTS_SCHEMA).json(str(src))  # noqa: E731

    q = start_parquet_ingest(events(), out, ckpt, partition_cols=["event_type"])
    try:
        _write_batch(str(src), "b1", [_event(0, 1.0, "P1"), _event(1, 2.0, "P2")])
        q.processAllAvailable()
    finally:
        q.stop()

    q2 = start_parquet_ingest(events(), out, ckpt, partition_cols=["event_type"])
    try:
        _write_batch(str(src), "b2", [_event(2, 3.0, "P1")])
        q2.processAllAvailable()
    finally:
        q2.stop()

    back = spark.read.parquet(out)
    assert sorted(r["event_id"] for r in back.collect()) == [0, 1, 2]
    # partition dirs exist per event_type
    import os

    assert {d for d in os.listdir(out) if d.startswith("event_type=")} == {
        "event_type=P1",
        "event_type=P2",
    }


def test_running_ewma_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState EWMA: stop the query, restart from the
    same checkpoint, feed more events — the (n, ewma) carry must
    resume from the checkpointed state, not restart from scratch
    (memory sink can't recover a checkpoint, so the changelog lands
    in a foreachBatch dict like the KV-store tests). Batch-fold
    reference: 10 -> 15 -> 27.5 across the restart."""
    from kafka_streams_spring_cloud_stream_tp1_spark.streaming import running_ewma

    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    events = lambda: spark.readStream.schema(EVENTS_SCHEMA).json(str(src))  # noqa: E731
    latest: dict = {}

    def sink(batch_df, _epoch):
        for r in batch_df.collect():
            latest[r["user_id"]] = (r["n_events"], r["ewma"])

    def start():
        return (
            running_ewma(events())
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = start()
    try:
        _write_batch(str(src), "b1", [_event(0, 1.0, value=10.0), _event(1, 2.0, value=20.0)])
        q1.processAllAvailable()
        assert latest[1] == (2, 15.0)
    finally:
        q1.stop()

    q2 = start()
    try:
        _write_batch(str(src), "b2", [_event(2, 3.0, value=40.0)])
        q2.processAllAvailable()
        # state restored: 3 events total, e = 15*0.5 + 40*0.5 = 27.5;
        # a from-scratch restart would show (1, 40.0)
        assert latest[1] == (3, 27.5)
    finally:
        q2.stop()
