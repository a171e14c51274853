"""foreachBatch sinks: the scale-out path for the queryable store.

The memory-sink CountStore (pipeline.py) mirrors the reference's
single-instance local store. At cluster scale the changelog instead
upserts into an EXTERNAL key-value store via foreachBatch — every
micro-batch arrives as a normal DataFrame plus an epoch id, so any
batch writer (JDBC, Cassandra, Redis, Delta) becomes a streaming sink
with exactly-once semantics when the write is idempotent (upsert by
key) and the checkpoint tracks the epoch.

`DictKVStore` here is the in-process stand-in for that external KV —
a real deployment swaps `upsert` for the store's batch-write call;
everything else (update-mode changelog, checkpointing, recovery) is
the production wiring, exercised by tests/test_checkpoint_recovery.py.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession

from .pipeline import streaming_windowed_counts


class DictKVStore:
    """Thread-safe (key → value) upsert store, the external-KV stand-in.
    Keys start with (name, window_start); upserts are idempotent, so
    epoch replays after recovery converge to the same state
    (exactly-once effect from at-least-once delivery).

    ``retention_seconds`` bounds store size for long-running streams:
    after each upsert, windows starting more than the retention horizon
    behind the NEWEST window seen are evicted — the Kafka Streams
    window-store retention rule (windowSize + grace), keyed off stream
    time rather than wall clock so replays stay deterministic. None
    keeps everything (bounded tests / changelog audits)."""

    def __init__(self, retention_seconds: float | None = None) -> None:
        self._data: dict[tuple, int] = {}
        self._lock = threading.Lock()
        self._retention = retention_seconds
        self.epochs_seen: list[int] = []

    def upsert(self, rows: list[tuple], epoch_id: int) -> None:
        with self._lock:
            self.epochs_seen.append(epoch_id)
            for key, cnt in rows:
                self._data[key] = cnt
            if self._retention is not None and self._data:
                high = max(k[1] for k in self._data)
                horizon = high - timedelta(seconds=self._retention)
                for k in [k for k in self._data if k[1] < horizon]:
                    del self._data[k]

    def snapshot(self) -> dict[tuple, int]:
        with self._lock:
            return dict(self._data)


@dataclass
class KVCountStore:
    """The flagship windowed-count changelog upserted into a KV store
    through foreachBatch, with a checkpoint for restart recovery."""

    spark: SparkSession
    store: DictKVStore
    query: object

    @classmethod
    def start(
        cls,
        spark: SparkSession,
        events: DataFrame,
        store: DictKVStore,
        checkpoint: str,
        window: str = "5 seconds",
        watermark: str = "10 seconds",
    ) -> "KVCountStore":
        counts = streaming_windowed_counts(events, window=window, watermark=watermark)

        def upsert_batch(batch: DataFrame, epoch_id: int) -> None:
            # driver-side collect is the stand-in for batch.write to the
            # external store's connector; the changelog batch is only the
            # CHANGED (key, window) rows, not the full state
            rows = [
                ((r["name"], r["window_start"]), r["cnt"])
                for r in batch.select("name", "window_start", "cnt").collect()
            ]
            store.upsert(rows, epoch_id)

        query = (
            counts.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(upsert_batch)
            .start()
        )
        return cls(spark=spark, store=store, query=query)

    def process_all(self) -> None:
        self.query.processAllAvailable()

    def stop(self) -> None:
        self.query.stop()


def start_parquet_ingest(
    events: DataFrame,
    path: str,
    checkpoint: str,
    partition_cols: list[str] | None = None,
    trigger_seconds: float | None = None,
):
    """Streaming → partitioned parquet (the lakehouse ingest pattern):
    each micro-batch appends files under ``path``, directory-
    partitioned for downstream pruning; the checkpoint makes the
    append exactly-once (a replayed epoch is skipped, not re-written).
    At scale, pair with periodic compaction — micro-batch appends
    produce one file per partition-dir per trigger."""
    writer = (
        events.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
