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


def test_empty_or_all_null_baseline_raises(spark):
    """A baseline with no scoreable values must fail loudly, not seed
    NaN fences (ADVICE r6: float(None) TypeError / ZeroDivisionError)."""
    import pytest

    empty = spark.createDataFrame([], "value double")
    with pytest.raises(ValueError, match="empty baseline"):
        baseline_profile(empty, "value")
    nulls = spark.createDataFrame([(None,), (None,)], "value double")
    with pytest.raises(ValueError, match="empty baseline"):
        baseline_profile(nulls, "value")


def test_null_metric_values_do_not_dilute_fractions(spark):
    """NULLs are dropped before binning: a batch padded with NULLs
    scores identically to the same batch without them, and n_rows
    counts only scoreable rows (ADVICE r6: NULL bucket understated
    PSI because its count still fed the denominator)."""
    base = _events(spark)
    vmin, vmax, frac = baseline_profile(base, "value")
    clean = base.limit(40)
    padded = clean.unionAll(
        base.sparkSession.createDataFrame([(None,)] * 60, "value double")
    )
    r_clean = psi_of_batch(clean, "value", vmin, vmax, frac).collect()[0]
    r_padded = psi_of_batch(padded, "value", vmin, vmax, frac).collect()[0]
    assert r_padded["n_rows"] == r_clean["n_rows"] == 40
    assert r_padded["psi"] == r_clean["psi"]


def test_empty_batch_scores_zero_not_null(spark):
    """An empty micro-batch yields (n_rows=0, psi=0.0) with every
    populated baseline bin one-sided — not a NULL n_rows row."""
    base = _events(spark)
    vmin, vmax, frac = baseline_profile(base, "value")
    empty = spark.createDataFrame([], "value double")
    row = psi_of_batch(empty, "value", vmin, vmax, frac).collect()[0]
    assert row["n_rows"] == 0
    assert row["psi"] == 0.0
    assert row["n_onesided_bins"] == sum(1 for f in frac if f > 0)


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
