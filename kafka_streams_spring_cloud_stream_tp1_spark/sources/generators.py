"""Synthetic PageEvent stream sources.

S2 — the reference's timed supplier (reference:
hanndlers/PageEventHandler.java:36-46 + application.properties:21-22):
one random PageEvent per 200 ms — name P1/P2 (p=0.5), user U1/U2
(p=0.5), duration uniform [10, 10009], wall-clock date — produced to
topic T2. Here: Spark's `rate` source at the same 5 rows/s with the
synthetic columns projected via Column expressions (JVM-side; seedable
for deterministic tests).

S1 — the HTTP `/publish` ingest (reference:
controllers/PageEventController.java:34-39): caller-chosen name/topic,
random user U1/U2, duration uniform [10, 1009]. Batch analog:
`publish_events` builds the same single-row DataFrame, optionally
writing it to a Kafka topic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _synthetic_page_event_cols(df: DataFrame, seed: int | None, max_extra: int) -> DataFrame:
    """Project rate-source rows into PageEvent rows.

    Matches the supplier's distributions: Bernoulli(0.5) page and user,
    duration = 10 + uniform_int(max_extra) (reference:
    PageEventHandler.java:40-43 — Math.random() page/user choice,
    Random.nextInt duration).
    """
    r1 = F.rand(seed) if seed is not None else F.rand()
    r2 = F.rand(seed + 1) if seed is not None else F.rand()
    r3 = F.rand(seed + 2) if seed is not None else F.rand()
    return df.select(
        F.when(r1 > 0.5, F.lit("P1")).otherwise(F.lit("P2")).alias("name"),
        F.when(r2 > 0.5, F.lit("U1")).otherwise(F.lit("U2")).alias("user"),
        F.col("timestamp").alias("date"),
        (F.lit(10) + (r3 * max_extra).cast("long")).alias("duration"),
    )


def page_event_stream(
    spark: SparkSession, rows_per_second: int = 5, seed: int | None = None
) -> DataFrame:
    """S2 — unbounded synthetic PageEvent stream at the reference's
    5 events/s cadence (application.properties:22, fixed-delay=200ms)."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return _synthetic_page_event_cols(raw, seed, max_extra=10000)


def page_event_batch(spark: SparkSession, n_rows: int, seed: int | None = 42) -> DataFrame:
    """Batch analog of the supplier — n synthetic PageEvents with the
    same column distributions, timestamps spaced 200 ms apart."""
    raw = spark.range(n_rows).select(
        F.timestamp_millis((F.col("id") * 200).cast("long")).alias("timestamp")
    )
    return _synthetic_page_event_cols(raw, seed, max_extra=10000)


def publish_event(
    spark: SparkSession, name: str, topic: str | None = None, bootstrap: str | None = None
) -> DataFrame:
    """S1 — the `/publish` ingest helper: build one PageEvent (random
    user, duration uniform [10,1009], now()) and optionally produce it
    as JSON to a caller-chosen Kafka topic (reference:
    PageEventController.java:34-39 — streamBridge.send(topic, event)).

    Returns the one-row DataFrame (the reference echoes the event back
    as the HTTP response body).
    """
    row = spark.range(1).select(
        F.lit(name).alias("name"),
        F.when(F.rand() > 0.5, F.lit("U1")).otherwise(F.lit("U2")).alias("user"),
        F.current_timestamp().alias("date"),
        (F.lit(10) + (F.rand() * 1000).cast("long")).alias("duration"),
    )
    if topic is not None:
        from ..streaming.kafka import write_page_events_kafka

        write_page_events_kafka(row, topic, bootstrap or "localhost:9092")
    return row
