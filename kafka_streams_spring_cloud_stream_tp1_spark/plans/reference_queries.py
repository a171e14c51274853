"""The reference-surface query set (SURVEY.md §2.3) over the `events`
fixture — every operator the reference actually invokes, oracle-checked.

`events` plays the PageEvent role: event_type<->name, user_id<->user,
ts<->date, value<->duration (FIXTURES.md §1).

Window-bucket parity: Spark ``F.window(ts, '5 seconds')`` is
epoch-aligned; the DuckDB oracle buckets with
``make_timestamp((epoch_ms(ts)//5000)*5000000)`` which is epoch-aligned
and timezone-naive (``to_timestamp`` would yield TIMESTAMPTZ and break
schema parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import core as ops
from ..sources import load_table
from .registry import query

_BUCKET5 = "make_timestamp((epoch_ms(ts) // 5000) * 5000000)"


@query(
    "q_console_echo",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events",
)
def q_console_echo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 — identity pass-through; row-fidelity check of the console
    consumer (reference: hanndlers/PageEventHandler.java:26-33)."""
    return load_table(spark, sf_dir, "events")


@query(
    "q_filter",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events WHERE value > 100",
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — value > 100 predicate (reference: PageEventHandler.java:51).
    The predicate reaches the parquet scan as a pushed filter."""
    return ops.filter_min_value(load_table(spark, sf_dir, "events"))


@query(
    "q_project_rekey",
    oracle="SELECT event_type AS name, CAST(0 AS BIGINT) AS zero FROM events",
)
def q_project_rekey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — re-key projection (name, 0L); drops all other columns
    (reference: PageEventHandler.java:52). Scan reads one column."""
    return ops.rekey_by_page(load_table(spark, sf_dir, "events"))


@query(
    "q_windowed_count",
    oracle=f"""
    SELECT event_type AS name,
           {_BUCKET5} AS window_start,
           count(*) AS cnt
    FROM events
    WHERE value > 100 AND ts IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_windowed_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship — F1∘P1∘G1∘W1∘A1∘P2: filtered per-page 5 s tumbling
    counts (the reference's whole topology,
    PageEventHandler.java:51-57). One shuffle, partial+final hash agg.
    NULL contract: Spark's `window()` drops NULL event times — the
    same record contract Kafka Streams applies to invalid-timestamp
    records — so the oracle filters ts IS NOT NULL (null-sweep r11)."""
    events = load_table(spark, sf_dir, "events")
    return ops.unwrap_windowed_key(ops.windowed_page_counts(events), keep_bounds=False)


@query(
    "q_windowed_count_keyed",
    oracle=f"""
    SELECT event_type AS name,
           {_BUCKET5} AS window_start,
           {_BUCKET5} + INTERVAL 5 SECOND AS window_end,
           count(*) AS cnt
    FROM events
    WHERE value > 100 AND ts IS NOT NULL
    GROUP BY 1, 2, 3
    """,
)
def q_windowed_count_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 store contents — (page, window bounds) -> count, i.e. the
    reference's materialized `count-store` entries
    (PageEventHandler.java:55)."""
    events = load_table(spark, sf_dir, "events")
    return ops.unwrap_windowed_key(ops.windowed_page_counts(events), keep_bounds=True)


@query(
    "q_store_range_fetch",
    oracle=f"""
    WITH anchor AS (SELECT max(ts) AS t_max FROM events WHERE value > 100),
    store AS (
        SELECT event_type AS name,
               {_BUCKET5} AS window_start,
               count(*) AS cnt
        FROM events
        WHERE value > 100
        GROUP BY 1, 2
    )
    SELECT store.name, max_by(store.cnt, store.window_start) AS cnt
    FROM store, anchor
    WHERE store.window_start BETWEEN anchor.t_max - INTERVAL 5 SECOND AND anchor.t_max
    GROUP BY store.name
    """,
)
def q_store_range_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 — interactive window-range fetch: windows starting within
    [T-5s, T], latest-window-per-page wins (reference:
    controllers/PageEventController.java:47-55). Wall-clock `now` is
    parameterized as T = max(ts) over *filtered* events for determinism
    (FIXTURES.md §4) — anchoring on filtered events guarantees the
    fetched range is non-empty, a non-trivial check. The single-row
    anchor is a broadcast cross-join, not a collect."""
    events = load_table(spark, sf_dir, "events")
    filtered = ops.filter_min_value(events)
    store = ops.unwrap_windowed_key(ops.windowed_page_counts(events), keep_bounds=False)
    anchor = filtered.agg(F.max("ts").alias("t_max"))
    return ops.latest_window_per_key(
        store.crossJoin(F.broadcast(anchor)), anchor_ts=F.col("t_max"), span="5 seconds"
    )
