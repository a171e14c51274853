"""Query registry: every engine capability is a named (builder, oracle)
pair, which is exactly the driver contract (`__spark_entry__.py`).

A builder takes ``(spark, sf_dir)`` and returns a DataFrame; the oracle
is the equivalent ANSI SQL that DuckDB runs over the same parquet
tables. Column names must match between the two — alias every computed
column on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Register a query builder (and optionally its DuckDB oracle SQL)."""

    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import side-effect: modules register their queries on import.
    from . import llm_queries, reference_queries, relational_queries  # noqa: F401


def queries_map() -> dict[str, Builder]:
    _ensure_loaded()
    return {name: spec.builder for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
