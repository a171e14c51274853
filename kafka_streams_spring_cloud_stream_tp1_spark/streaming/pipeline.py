"""The streaming flagship topology and the queryable count-store.

Reproduces the reference's full streaming loop (reference:
hanndlers/PageEventHandler.java:49-60 +
controllers/PageEventController.java:42-58):

    source -> filter(duration>100) -> re-key(name) -> [shuffle]
    -> 5s tumbling window count  => "count-store" (queryable)
    -> changelog stream (update mode, ~1/s)       => sink

Semantic mappings (SURVEY.md §4.2):
- KTable changelog + commit.interval.ms=1000  ==  outputMode("update")
  + trigger(processingTime="1 second") — emits changed aggregates per
  trigger, not one row per event.
- RocksDB window store "count-store"  ==  the streaming state store
  (RocksDB provider configured in session.py) PLUS a `memory` sink
  table as the *queryable* projection; the interactive range-fetch
  (Q1) is a tiny batch SQL over that table — same writer-thread vs.
  reader-thread split as the reference's store.
- The reference's accidental 24h grace (deprecated TimeWindows.of) is
  replaced by an explicit, configurable watermark — a documented
  divergence; state must be evictable or a 100TB stream never
  compacts.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import core as ops

_UNIT_SECONDS = {
    "millisecond": 0.001,
    "second": 1.0,
    "minute": 60.0,
    "hour": 3600.0,
    "day": 86400.0,
}


def interval_seconds(interval: str) -> float:
    """Parse the simple '<n> <unit>' interval strings Structured
    Streaming accepts for windows/watermarks into seconds."""
    m = re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*(millisecond|second|minute|hour|day)s?\s*", interval)
    if not m:
        raise ValueError(f"unsupported interval string: {interval!r}")
    return float(m.group(1)) * _UNIT_SECONDS[m.group(2)]


# sentinel: "caller didn't choose" → window + watermark; explicit None
# disables eviction (tests / changelog audits)
_DEFAULT_RETENTION: float = object()  # type: ignore[assignment]


def streaming_windowed_counts(
    events: DataFrame,
    window: str = "5 seconds",
    watermark: str = "10 seconds",
    ts_col: str = "ts",
    key_col: str = "event_type",
    threshold: float = 100.0,
) -> DataFrame:
    """Bind the batch flagship builders to a streaming DataFrame.

    Identical logic to the batch `windowed_page_counts` with a
    watermark prepended — the watermark bounds late data (reference
    default grace is 24 h, see module docstring) and lets Spark evict
    window state; without it, update-mode agg state grows forever.
    """
    withw = events.withWatermark(ts_col, watermark)
    counts = ops.windowed_page_counts(
        withw, window=window, ts_col=ts_col, key_col=key_col, threshold=threshold
    )
    return ops.unwrap_windowed_key(counts, keep_bounds=True)


@dataclass
class CountStore:
    """The queryable window store (reference: RocksDB `count-store` +
    InteractiveQueryService, single-instance serving assumption —
    SURVEY.md §4.2). Two backends:

    - ``backend="kv"`` (default, the production shape): the changelog
      upserts into a `DictKVStore` via foreachBatch — the in-process
      stand-in for an external KV (Redis/Cassandra). Store size is
      BOUNDED: upserts are idempotent by (name, window) key and windows
      older than the retention horizon (window + watermark by default,
      the Kafka Streams windowSize+grace retention rule) are evicted on
      write. A long-running stream holds only the live window set.
    - ``backend="memory"`` (tests/demo): Spark's `memory` sink. Update
      mode APPENDS each trigger's changed rows to the sink table
      forever, so driver memory grows with stream lifetime — fine for
      bounded tests, wrong for serving; snapshot() compensates for the
      duplicate rows with a groupBy().max().
    """

    spark: SparkSession
    query: StreamingQuery
    table: str | None = None
    store: "object | None" = None  # DictKVStore when backend="kv"

    _poll: float = field(default=0.1, repr=False)

    @classmethod
    def start(
        cls,
        spark: SparkSession,
        events: DataFrame,
        table: str = "count_store",
        window: str = "5 seconds",
        watermark: str = "10 seconds",
        trigger_seconds: float | None = None,
        backend: str = "kv",
        retention_seconds: "float | None" = _DEFAULT_RETENTION,
        **kwargs,
    ) -> "CountStore":
        counts = streaming_windowed_counts(events, window=window, watermark=watermark, **kwargs)
        if backend == "memory":
            writer = (
                counts.writeStream.outputMode("update")  # T1: KTable changelog
                .format("memory")
                .queryName(table)
            )
            if trigger_seconds is not None:
                # the reference's commit.interval.ms=1000 emission cadence
                writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
            return cls(spark=spark, query=writer.start(), table=table)

        from .sinks import DictKVStore  # local import: sinks imports this module

        if retention_seconds is _DEFAULT_RETENTION:
            # Kafka Streams' minimum window-store retention: size + grace
            retention_seconds = interval_seconds(window) + interval_seconds(watermark)
        store = DictKVStore(retention_seconds=retention_seconds)

        def upsert_batch(batch: DataFrame, epoch_id: int) -> None:
            # the changelog batch holds only CHANGED (key, window) rows;
            # collect here stands in for batch.write to the KV connector
            rows = [
                ((r["name"], r["window_start"], r["window_end"]), r["cnt"])
                for r in batch.select("name", "window_start", "window_end", "cnt").collect()
            ]
            store.upsert(rows, epoch_id)

        writer = counts.writeStream.outputMode("update").foreachBatch(upsert_batch)
        if trigger_seconds is not None:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return cls(spark=spark, query=writer.start(), store=store)

    def process_all(self) -> None:
        """Drain everything currently available (test/demo helper)."""
        self.query.processAllAvailable()

    def snapshot(self) -> DataFrame:
        """Current store contents: (name, window_start, window_end, cnt)."""
        if self.store is not None:
            rows = [(k[0], k[1], k[2], v) for k, v in self.store.snapshot().items()]
            return self.spark.createDataFrame(
                rows, "name string, window_start timestamp, window_end timestamp, cnt long"
            )
        raw = self.spark.table(self.table)
        return raw.groupBy("name", "window_start", "window_end").agg(
            F.max("cnt").alias("cnt")
        )

    def range_fetch(self, anchor: Column | None = None, span: str = "5 seconds") -> DataFrame:
        """Q1 — the reference's 1 Hz interactive query
        (PageEventController.java:47-55): windows starting within
        [anchor - span, anchor] folded to latest-window-per-page.
        ``anchor`` defaults to now(), exactly like the reference.
        """
        snap = self.snapshot().select("name", "window_start", "cnt")
        anchor_col = anchor if anchor is not None else F.current_timestamp()
        return ops.latest_window_per_key(snap, anchor_ts=anchor_col, span=span)

    def serve(self, seconds: float, interval: float = 1.0):
        """The SSE analytics loop (PageEventController.java:42-58):
        poll the store once per `interval`, yield {page -> count}
        snapshots. Generator instead of an HTTP server — the serving
        protocol is out of engine scope (SURVEY.md V1)."""
        deadline = time.monotonic() + seconds
        while time.monotonic() < deadline:
            rows = self.range_fetch().collect()
            yield {r["name"]: r["cnt"] for r in rows}
            time.sleep(interval)

    def stop(self) -> None:
        self.query.stop()


def streaming_session_counts(
    events: DataFrame,
    gap: str = "5 seconds",
    watermark: str = "10 seconds",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """The streaming twin of batch `q_session_window` (VERDICT r06
    #7c): per-key session windows that EXTEND while events keep
    arriving within ``gap`` and close once the watermark passes
    last_event + gap. Spark's session state store merges adjacent
    partial sessions across micro-batches — the Kafka Streams
    `SessionWindows.with(gap)` semantics the reference's tumbling
    flagship doesn't exercise. Append output mode is the natural
    changelog: exactly one row per FINALIZED session, emitted the
    trigger after its close crosses the watermark."""
    withw = events.withWatermark(ts_col, watermark)
    return ops.session_window_counts(withw, gap=gap, ts_col=ts_col, key_col=key_col)


def start_session_stream(
    events: DataFrame,
    table: str = "session_store",
    gap: str = "5 seconds",
    watermark: str = "10 seconds",
    trigger_seconds: float | None = 1.0,
    **kwargs,
) -> StreamingQuery:
    """Live-trigger session lane: `streaming_session_counts` on the
    reference's 1 s commit cadence (`application.properties:22`
    commit.interval.ms=1000), append mode into a memory sink named
    ``table`` — one durable row per closed session, no updates to
    retract. Caller stops the query."""
    sessions = streaming_session_counts(
        events, gap=gap, watermark=watermark, **kwargs
    ).select(
        "name",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "cnt",
    )
    writer = (
        sessions.writeStream.outputMode("append").format("memory").queryName(table)
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
