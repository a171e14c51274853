"""Local replica of the driver's Spark-vs-DuckDB correctness check.

For each registered query: run the Spark builder and the oracle SQL on
the same parquet tables, then compare row count, column-name set, and an
order-insensitive value comparison (columns sorted by name, rows sorted,
floats rounded). Catching a mismatch here means catching it before the
driver's CORRECTNESS gate does.
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

from kafka_streams_spring_cloud_stream_tp1_spark.sources.tables import TABLES

FLOAT_DECIMALS = 6


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, FLOAT_DECIMALS)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    # Decimal, ints, strs, bytes compare directly
    return v


def normalize_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    normed = [tuple(_norm_cell(row[i]) for i in order) for row in rows]
    return sorted(normed, key=repr)


def _assert_hashable_schema(sdf) -> None:
    """The REAL driver canonicalizes with pandas sort_values over all
    columns; list/dict cells are unhashable there, so any array, map,
    or struct column in an oracle-backed query's FINAL projection dies
    at the driver even though local tuple-normalization would pass
    (round-2 lesson: five err rows). Fail fast locally instead."""
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"oracle-backed query output has non-scalar columns {bad}; serialize "
        "them (array_join/to_json) in the final projection — the driver's "
        "pandas canonicalizer cannot hash list cells"
    )


def assert_no_hugeint(con, oracle: str) -> None:
    """DuckDB types an uncast integer ``sum()`` as HUGEINT, and its
    pandas conversion renders HUGEINT as float64 (``sum(1+2)`` →
    ``3.0``), so the REAL driver's value hash can never match Spark's
    int64 even when every value is identical (round-4 lesson: four
    exact-match queries red on exactly this). Oracles must
    ``CAST(sum(...) AS BIGINT)``; fail fast locally on any
    HUGEINT/UHUGEINT column in the oracle's result type."""
    rel = con.sql(oracle)
    bad = [
        c for c, t in zip(rel.columns, rel.types) if str(t) in ("HUGEINT", "UHUGEINT")
    ]
    assert not bad, (
        f"oracle result has HUGEINT columns {bad}; the driver's pandas "
        "canonicalizer renders HUGEINT as float64 and the value hash can "
        "never match Spark's int64 — CAST(sum(...) AS BIGINT) in the oracle"
    )


def find_negative_zeros(columns: list[str], rows: list[tuple]) -> list[str]:
    """Column names holding an IEEE ``-0.0`` cell. Python compares
    ``-0.0 == 0.0`` (so value comparison here passes) but the REAL
    driver's pandas bit-hash distinguishes the two bit patterns — a
    statistic that rounds to zero with Spark emitting ``+0.0`` and
    DuckDB ``-0.0`` is a guaranteed driver red (round-5 lesson:
    q_token_pmi, one cell). Builders and oracles must normalize any
    signed float that can round to zero with ``+ 0.0`` (IEEE:
    ``-0.0 + 0.0 = +0.0``) on BOTH sides."""
    bad = set()
    for row in rows:
        for c, v in zip(columns, row):
            if isinstance(v, float) and v == 0.0 and math.copysign(1.0, v) < 0:
                bad.add(c)
    return sorted(bad)


def assert_no_negative_zero(columns, rows, engine: str) -> None:
    bad = find_negative_zeros(columns, rows)
    assert not bad, (
        f"{engine} result emits -0.0 in columns {bad}; the driver's pandas "
        "bit-hash distinguishes -0.0 from 0.0 across engines — add `+ 0.0` "
        "normalization to the final projection on BOTH sides"
    )


def compare_query(spark, con, builder, oracle: str, sf_dir: str) -> None:
    sdf = builder(spark, sf_dir)
    _assert_hashable_schema(sdf)
    assert_no_hugeint(con, oracle)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]
    assert_no_negative_zero(spark_cols, spark_rows, "spark")

    res = con.sql(oracle)
    duck_cols = list(res.columns)
    duck_rows = res.fetchall()
    assert_no_negative_zero(duck_cols, duck_rows, "duckdb")

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_norm = normalize_rows(spark_cols, spark_rows)
    d_norm = normalize_rows(duck_cols, duck_rows)
    if s_norm != d_norm:
        diff_s = [r for r in s_norm if r not in d_norm][:5]
        diff_d = [r for r in d_norm if r not in s_norm][:5]
        raise AssertionError(f"value mismatch; spark-only={diff_s} duck-only={diff_d}")
