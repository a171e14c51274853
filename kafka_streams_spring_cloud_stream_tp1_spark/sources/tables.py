"""Batch table loaders for the driver-generated parquet fixtures.

Parquet scans are the engine's batch source: columnar, predicate
pushdown + column pruning reach the scan via Catalyst (check
``.explain``'s PushedFilters / ReadSchema), partition-parallel by
row-group at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_ts_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark's vectorized
    reader rejects those outright, so they're read as long (legacy conf)
    and converted. Footer-only read, driver-side, O(1)."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
    except Exception:
        return []
    import pyarrow as pa

    return [
        f.name
        for f in schema
        if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Set defensively: the driver calls us with its own SparkSession.
    # Both confs are runtime-settable. UTC keeps event-time windows
    # deterministic and oracle-comparable (DuckDB timestamps are
    # UTC-naive); nanosAsLong lets the scan accept TIMESTAMP(NANOS).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) would otherwise
    # infer as TIMESTAMP_NTZ (Spark 4 default). Read it as session-TZ
    # TIMESTAMP instead: the session is pinned UTC, so the wall-clock
    # values are identical, every time function (unix_micros, window,
    # date_trunc arithmetic) stays applicable, and the type matches the
    # DuckDB oracle's naive-UTC reading of the same file.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    for c in _nanos_ts_cols(path):
        # nanos -> micros truncation matches DuckDB's read of the same file
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
