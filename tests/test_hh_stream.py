"""Streaming Misra-Gries heavy hitters: bounded per-shard state, the
frequency lower-bound/containment guarantees vs exact counts, and
state carried across triggers."""

from __future__ import annotations

import json
from collections import Counter

from kafka_streams_spring_cloud_stream_tp1_spark.streaming.heavy_hitters_stream import (
    running_heavy_hitters,
)

K, SHARDS = 8, 4


def _run_stream(spark, tmp_path, batches):
    d = tmp_path / "incoming"
    d.mkdir()
    for bi, items in enumerate(batches):
        with open(d / f"b{bi}.json", "w") as f:
            for it in items:
                f.write(json.dumps({"item": it}) + "\n")
    stream = spark.readStream.schema("item string").json(str(d))
    rows: list = []
    q = (
        running_heavy_hitters(stream, "item", k=K, n_shards=SHARDS)
        .writeStream.foreachBatch(lambda df, bid: rows.extend([(bid, *r) for r in df.collect()]))
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # latest emission per (shard, item) is the live summary
    latest: dict = {}
    for bid, shard, item, lb in rows:
        latest[(shard, item)] = (bid, lb)
    return {item: lb for (_, item), (_, lb) in latest.items()}


def test_guarantees_vs_exact_counts(spark, tmp_path):
    """Every item with frequency > n/(k+1) per shard must be present;
    every emitted lower bound must be ≤ the true count and within the
    MG undercount bound of it."""
    items = (
        ["hot"] * 120 + ["warm"] * 60 + ["mild"] * 25
        + [f"rare{i}" for i in range(150)]
    )
    # two triggers: state must carry across them
    merged = _run_stream(spark, tmp_path, [items[:180], items[180:]])
    true = Counter(items)
    assert "hot" in merged and "warm" in merged
    n = len(items)
    for item, lb in merged.items():
        assert lb <= true[item], (item, lb, true[item])
        # per-shard undercount ≤ n_shard/(k+1) ≤ n/(k+1)
        assert lb >= true[item] - n // (K + 1), (item, lb, true[item])


def test_state_is_bounded(spark, tmp_path):
    """With far more distinct items than k·shards, the live summary
    can never exceed k counters per shard."""
    items = [f"u{i}" for i in range(2000)]
    merged = _run_stream(spark, tmp_path, [items])
    assert len(merged) <= K * SHARDS
