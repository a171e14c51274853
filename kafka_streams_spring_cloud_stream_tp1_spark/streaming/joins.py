"""Stream-stream joins (SURVEY.md §2.2 — absent from the reference;
Kafka Streams exposes them as KStream-KStream windowed joins).

Spark requires event-time bounds on both sides so each side's join
state is evictable: watermarks + an interval condition. State size is
O(rows inside the interval horizon) per side — the direct analog of a
Kafka Streams `JoinWindows.of(...)` windowed join buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "10 seconds",
    watermark: str = "30 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join rows with equal ``key`` where ``right_ts`` falls inside
    [left_ts + lower, left_ts + upper] — the KStream-KStream windowed
    join (e.g. impressions ⋈ clicks within 10 s). Both inputs must be
    watermarked so Spark can discard buffered state once no match can
    arrive; at scale the equality key hash-partitions both sides and
    each partition buffers only its interval horizon."""
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static dimension table (KStream-KTable /
    GlobalKTable join in Kafka Streams terms — the reference's library
    exposes it as `KStream.join(GlobalKTable)`; the reference app
    itself never joins). The static side needs no watermark and holds
    no streaming state: Spark re-plans it per micro-batch, broadcasting
    when small — the GlobalKTable analog, where every task owns the
    whole dimension and the STREAM side never shuffles for the join.

    `how` is stream-side outer ('left') or 'inner'; right/full outer
    are not defined for stream-static in Spark (the static side can't
    emit unmatched rows of an unbounded stream)."""
    return stream.join(F.broadcast(dim), key, how)
