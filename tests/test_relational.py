"""Extra semantics checks that the value-hash oracle can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_spring_cloud_stream_tp1_spark.plans import queries_map
from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table

from .conftest import SF_SMOKE


def test_approx_count_distinct_accuracy(spark):
    """The HLL estimate must track the exact distinct count within a
    few relative-standard-deviations."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in queries_map()["q_approx_count_distinct"](spark, SF_SMOKE).collect()
    }
    exact = {
        r["event_type"]: r["users"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) <= max(2, 0.1 * exact[k]), (k, est, exact[k])


def test_topk_pushdown_plan(spark):
    """Global top-k must plan TakeOrderedAndProject (per-partition heap
    + driver merge), never a full global sort."""
    df = queries_map()["q_top_k_global"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_broadcast_join_plan(spark):
    """The fact-dim join must be a broadcast hash join — no shuffle of
    the fact side."""
    df = queries_map()["q_join_broadcast"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_asof_join_edge_semantics(spark):
    """At-or-before semantics: equal timestamps match; rows before any
    right row get nulls; the LATEST prior right row wins."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k", 5.0), (2, "k", 10.0), (3, "k", 30.0), (4, "x", 7.0)],
        "event_id long, k string, t double",
    )
    right = spark.createDataFrame(
        [("k", 10.0, 100), ("k", 20.0, 200)], "k string, t double, payload long"
    )
    out = {
        r["event_id"]: r["payload"]
        for r in asof_join(
            left, right, left_key="k", right_key="k", left_ts="t", right_ts="t",
            payload_cols=["payload"],
        ).collect()
    }
    assert out == {
        1: None,  # before any right row
        2: 100,   # equal ts matches (at-or-before)
        3: 200,   # latest prior wins
        4: None,  # key with no right rows at all
    }, out


def test_asof_join_rejects_payload_collision(spark):
    """A payload column that collides with a left-side name must be
    rejected eagerly — the silent alternative is two identically-named
    output columns that only blow up downstream (ADVICE r1)."""
    import pytest

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "k", 5.0)], "event_id long, k string, t double")
    right = spark.createDataFrame([("k", 5.0, 1.0)], "k string, ts double, t double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left, right, left_key="k", right_key="k", left_ts="t", right_ts="ts",
            payload_cols=["t"],
        )


def test_pagerank_mass_conservation_and_ranking(spark):
    """With no dangling nodes, total rank mass stays 1.0 after every
    iteration; on a star graph the hub must outrank every leaf."""
    import pyspark.sql.functions as F

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.graph import pagerank

    star = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(6)], "src string, dst string"
    )
    for iters in (1, 3):
        pr = pagerank(star, iterations=iters)
        rows = {r["node"]: r["rank"] for r in pr.collect()}
        assert abs(sum(rows.values()) - 1.0) < 1e-9, rows
        assert all(rows["hub"] > v for k, v in rows.items() if k != "hub"), rows
