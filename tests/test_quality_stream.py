"""Streaming quality gate: reference-like batches stay head/middle
heavy, boilerplate and new-domain batches land in tail, NULL/empty
docs count unscoreable, and the foreachBatch gate scores end to end."""

from __future__ import annotations

import json

from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table
from kafka_streams_spring_cloud_stream_tp1_spark.streaming.quality_stream import (
    quality_baseline,
    score_batch,
    stream_quality_gate,
)

from .conftest import SF_SMOKE


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")


def test_baseline_split_matches_terciles(spark):
    """Scoring the baseline against itself must bucket ≈⅓/⅓/⅓ with
    zero unscoreable rows."""
    docs = _docs(spark)
    lm, c1, c2, oov = quality_baseline(docs)
    row = score_batch(docs, lm, c1, c2, oov).collect()[0]
    n = row["n_rows"]
    assert row["n_unscoreable"] == 0
    for b in ("n_head", "n_middle", "n_tail"):
        assert abs(row[b] - n / 3) <= max(2, 0.1 * n), (b, row[b], n)


def test_new_domain_batch_lands_in_tail(spark):
    """A batch of out-of-vocabulary text must score the smoothed OOV
    mass and land ~entirely in tail — the new-domain alarm."""
    docs = _docs(spark)
    lm, c1, c2, oov = quality_baseline(docs)
    alien = spark.createDataFrame(
        [(i, "zxqv jkwpf mnbtr ylgdh qwms vcxz plkj " * 4) for i in range(30)],
        "doc_id long, text string",
    )
    row = score_batch(alien, lm, c1, c2, oov).collect()[0]
    assert row["n_tail"] == 30, row


def test_null_and_empty_docs_count_unscoreable(spark):
    docs = _docs(spark)
    lm, c1, c2, oov = quality_baseline(docs)
    batch = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "the quick brown fox jumps over it")],
        "doc_id long, text string",
    )
    row = score_batch(batch, lm, c1, c2, oov).collect()[0]
    assert row["n_rows"] == 3 and row["n_unscoreable"] == 2
    assert row["n_head"] + row["n_middle"] + row["n_tail"] == 1


def test_empty_baseline_raises(spark):
    import pytest

    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty baseline"):
        quality_baseline(empty)
    nulls = spark.createDataFrame([(1, None), (2, "  ")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty baseline"):
        quality_baseline(nulls)


def test_stream_quality_gate_end_to_end(spark, tmp_path):
    """The gate scores a reference-like file batch and a boilerplate
    batch; the boilerplate one shows a strictly worse mix."""
    docs = _docs(spark)
    d = tmp_path / "incoming"
    d.mkdir()
    good = docs.limit(30).collect()
    with open(d / "b1.json", "w") as f:
        for r in good:
            f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
        for i in range(30):
            f.write(
                json.dumps({"doc_id": 900 + i, "text": "foo foo foo qzx " * 10})
                + "\n"
            )
    stream = spark.readStream.schema("doc_id long, text string").json(str(d))
    out: list = []
    q = stream_quality_gate(
        stream, docs, sink=lambda df, bid: out.extend(df.collect())
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert out and sum(r["n_rows"] for r in out) == 60
    # the 30 boilerplate docs fail gopher (repetition/stopwords) or tail out
    assert sum(r["n_gopher_fail"] for r in out) >= 30
    assert sum(r["n_tail"] for r in out) >= 30
