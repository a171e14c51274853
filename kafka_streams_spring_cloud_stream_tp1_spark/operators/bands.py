"""Banded range-join: the scale path for joining facts against a small
interval table (reference surface: the non-equi bucket join the engine
also supports as `q_join_range`).

A range join `fact.value BETWEEN dim.lo AND dim.hi` plans as a
broadcast-nested-loop: every fact row is tested against every interval.
Fine for 4 buckets; at 100 TB × thousands of intervals the per-row cost
is |intervals| comparisons and the join node blocks whole-stage fusion
with its neighbours.

The banded form exploits that the interval table is *small and static*
(the premise of broadcasting it): embed the sorted intervals as a
literal `array<struct<lo,hi>>` expression and resolve each row's band
with a JVM-side `filter(...)[0]` — a pure projection, O(|intervals|)
per row but fused into whole-stage codegen with ZERO join node. The
only exchange left is whatever aggregation follows, which carries
|bands| rows per task. For very large interval sets the same idea
upgrades to a sorted-array binary search via `array_position` on a
precomputed band key, or a broadcast equi-join on `floor(value/width)`
for uniform widths.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def band_lookup(
    df: DataFrame,
    value_col: str,
    buckets: Sequence[tuple[float, float]],
    lo_name: str = "bucket_lo",
    hi_name: str = "bucket_hi",
) -> DataFrame:
    """Annotate each row with the half-open interval [lo, hi) that
    contains ``value_col``, dropping rows in no interval (inner-join
    semantics, matching the non-equi `JOIN ... ON v >= lo AND v < hi`).

    ``buckets`` must be driver-side literals — the same "small static
    dim" assumption a broadcast join makes, without the join.
    Overlapping intervals resolve to the first match in the given
    order (the nested-loop join would emit BOTH — callers with
    overlapping bands want the real join, use `q_join_range`).
    """
    if not buckets:
        raise ValueError("band_lookup needs at least one (lo, hi) interval")
    intervals = F.array(
        *[
            F.struct(
                F.lit(float(lo)).alias("lo"),
                F.lit(float(hi)).alias("hi"),
            )
            for lo, hi in buckets
        ]
    )
    v = F.col(value_col)
    # F.get (not [0]): a NULL value or out-of-band row yields an EMPTY
    # filter result, and under ANSI mode (Spark 4 default) indexing an
    # empty array with [0] throws ArrayIndexOutOfBounds; get() returns
    # NULL, which the isNotNull filter below drops — preserving the
    # inner-join semantics for NULLs exactly like the non-equi join.
    hit: Column = F.get(
        F.filter(intervals, lambda b: (v >= b["lo"]) & (v < b["hi"])), F.lit(0)
    )
    return (
        df.withColumn("__band", hit)
        .filter(F.col("__band").isNotNull())
        .withColumn(lo_name, F.col("__band")["lo"])
        .withColumn(hi_name, F.col("__band")["hi"])
        .drop("__band")
    )
