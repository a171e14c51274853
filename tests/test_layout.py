"""Physical layout: partition pruning on partitioned parquet writes
and exchange-free joins on bucketed tables — plan-level proof that the
write-time layout pays off at read time."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_spring_cloud_stream_tp1_spark.sinks import (
    write_bucketed_table,
    write_partitioned,
)
from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table

from .conftest import SF_SMOKE


def test_partitioned_write_prunes_at_scan(spark, tmp_path):
    """A filter on the partition column must appear under
    PartitionFilters (directory pruning), and the pruned read must
    return exactly that partition's rows."""
    ev = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events_part")
    write_partitioned(ev, path, ["event_type"])
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "event_type" in pf, plan
    assert back.count() == ev.filter("event_type = 'click'").count()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts
    must sort-merge join with ZERO Exchange operators — the co-located
    join bucketing exists for."""
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    try:
        write_bucketed_table(
            orders, "b_orders", "o_orderkey", 8, path=str(tmp_path / "b_orders")
        )
        write_bucketed_table(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem",
            "o_orderkey",
            8,
            path=str(tmp_path / "b_lineitem"),
        )
        joined = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"), "o_orderkey")
            .select("o_orderkey", "o_totalprice", "l_quantity")
        )
        # disable broadcast so the bucketed SMJ path is what's planned
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() == orders.join(
            li, orders.o_orderkey == li.l_orderkey
        ).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_zorder_write_tightens_rowgroup_stats(spark, tmp_path):
    """Z-order clustering must make parquet row-group min/max stats
    selective on BOTH dimensions at once: against a single-column
    sort (tight on l_partkey, useless on l_suppkey), the z-ordered
    layout's per-row-group l_suppkey span must shrink — that span IS
    the data-skipping opportunity for a predicate on the second
    column. Verified on the actual parquet footers via pyarrow, not
    on plan text."""
    import glob
    import os

    import pyarrow.parquet as pq

    from kafka_streams_spring_cloud_stream_tp1_spark.sinks.batch import (
        write_zordered,
        zorder_value,
    )

    # 128×128 key grid: at smoke scale the fixture's suppkey domain
    # (10 values) fits inside every row group whatever the order, so
    # the effect needs a domain wider than one file's row count —
    # stats skipping is a scale phenomenon, reproduced here in
    # miniature with 16 files over 16 384 rows
    grid = (
        spark.range(128)
        .select(F.col("id").alias("x"))
        .crossJoin(spark.range(128).select(F.col("id").alias("y")))
    )

    def avg_y_span(path: str) -> float:
        spans = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = {md.row_group(0).column(i).path_in_schema: i
                   for i in range(md.row_group(0).num_columns)}["y"]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                spans.append(st.max - st.min)
        assert spans
        return sum(spans) / len(spans)

    # single-column sort: each file is an x-slice seeing the FULL y
    # range — a y predicate can never skip a file
    p1 = str(tmp_path / "bykey")
    grid.repartitionByRange(16, "x").sortWithinPartitions("x", "y").write.parquet(p1)
    # z-ordered: each file is (close to) a z-quadrant — tight on both
    p2 = str(tmp_path / "byz")
    (
        grid.withColumn("__z", zorder_value(["x", "y"], bits=8))
        .repartitionByRange(16, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.parquet(p2)
    )
    span_single, span_z = avg_y_span(p1), avg_y_span(p2)
    assert span_z < 0.6 * span_single, (span_z, span_single)
    # and the writer helper round-trips the same rows
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_partkey", "l_suppkey")
    p3 = str(tmp_path / "wz")
    write_zordered(li, p3, ["l_partkey", "l_suppkey"])
    assert spark.read.parquet(p3).count() == li.count()
