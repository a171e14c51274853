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
