"""Streaming PSI drift monitor: same-distribution batches must stay
quiet, a shifted batch must alarm, and the foreachBatch monitor must
score every micro-batch end to end."""

from __future__ import annotations

import json

from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table
from kafka_streams_spring_cloud_stream_tp1_spark.streaming.drift_stream import (
    baseline_profile,
    psi_of_batch,
    stream_drift_monitor,
)

from .conftest import SF_SMOKE


def _events(spark):
    return load_table(spark, SF_SMOKE, "events").select("value")


def test_same_distribution_scores_low(spark):
    """A batch drawn from the baseline itself (odd event ids vs even
    baseline) must score PSI well under the 0.1 investigate fence."""
    ev = load_table(spark, SF_SMOKE, "events")
    base = ev.filter("event_id % 2 = 0").select("value")
    batch = ev.filter("event_id % 2 = 1").select("value")
    vmin, vmax, frac = baseline_profile(base, "value")
    row = psi_of_batch(batch, "value", vmin, vmax, frac).collect()[0]
    assert row["n_rows"] > 0
    assert row["psi"] < 0.1, row


def test_shifted_distribution_alarms(spark):
    """Shifting the metric by 3x the range must blow past the 0.25
    act fence (everything clamps into the top bin)."""
    base = _events(spark)
    vmin, vmax, frac = baseline_profile(base, "value")
    shifted = base.selectExpr(f"value + {3 * (vmax - vmin)} AS value")
    row = psi_of_batch(shifted, "value", vmin, vmax, frac).collect()[0]
    assert row["psi"] > 0.25, row


def test_out_of_range_values_clamp_into_edge_bins(spark):
    """Values outside the baseline range must land in the edge bins
    (count preserved), not vanish: n_rows equals the batch size."""
    base = _events(spark)
    vmin, vmax, frac = baseline_profile(base, "value")
    wild = spark.createDataFrame(
        [(vmin - 1e6,), (vmax + 1e6,), ((vmin + vmax) / 2,)], "value double"
    )
    row = psi_of_batch(wild, "value", vmin, vmax, frac).collect()[0]
    assert row["n_rows"] == 3


def test_stream_drift_monitor_end_to_end(spark, tmp_path):
    """The foreachBatch monitor scores a quiet and a shifted file
    batch; the shifted one scores strictly higher."""
    base = _events(spark)
    vmin, vmax, _ = baseline_profile(base, "value")
    d = tmp_path / "incoming"
    d.mkdir()
    quiet = [r["value"] for r in base.limit(50).collect()]
    with open(d / "b1.json", "w") as f:
        for v in quiet:
            f.write(json.dumps({"value": v}) + "\n")
        for v in quiet:
            f.write(json.dumps({"value": v + 3 * (vmax - vmin)}) + "\n")
    stream = spark.readStream.schema("value double").json(str(d))
    scores: list = []
    q = stream_drift_monitor(
        stream, base, "value", sink=lambda df, bid: scores.extend(df.collect())
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert scores, "monitor produced no scores"
    assert sum(r["n_rows"] for r in scores) == 100
    # half the rows sit 3 ranges above the baseline -> strong drift
    assert max(r["psi"] for r in scores) > 0.25, scores
