"""Streaming near-dup detection against a static corpus: the
ingest-time gate. Batch operators run unchanged inside foreachBatch;
flags must hit true near-dups and stay silent on novel docs."""

from __future__ import annotations

import json

import pytest

from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table
from kafka_streams_spring_cloud_stream_tp1_spark.streaming.dedup_stream import (
    corpus_band_index,
    near_dup_flags_batch,
    stream_near_dup_monitor,
)

from .conftest import SF_SMOKE


def _corpus(spark):
    return load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")


def test_near_dup_flags_batch_exact_copy_and_novel(spark):
    """A verbatim copy of a corpus doc must flag (jaccard 1.0) against
    some corpus doc holding the same shingle set; a novel-vocabulary
    doc must not flag."""
    corpus = _corpus(spark)
    copy_text = corpus.filter("doc_id = 0").collect()[0]["text"]
    batch = spark.createDataFrame(
        [(100000, copy_text), (100001, "zzq qqz zqz qzz zzz qqq xyx yxy")],
        "doc_id long, text string",
    )
    flags = near_dup_flags_batch(
        batch, corpus_band_index(corpus), _shingles(spark), threshold=0.8
    ).collect()
    got = {r["doc_id"]: (r["dup_of"], r["jaccard"]) for r in flags}
    assert 100000 in got and got[100000][1] == 1.0
    # the matched corpus doc must carry the identical shingle set
    assert 100001 not in got


def _shingles(spark):
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.dedup import shingle_sets

    return shingle_sets(_corpus(spark), 2)


def test_stream_near_dup_monitor_end_to_end(spark, tmp_path):
    """The foreachBatch monitor flags an incoming near-dup within its
    micro-batch and passes novel docs through unflagged."""
    corpus = _corpus(spark)
    copy_text = corpus.filter("doc_id = 3").collect()[0]["text"]
    d = tmp_path / "incoming"
    d.mkdir()
    with open(d / "b1.json", "w") as f:
        f.write(json.dumps({"doc_id": 200000, "text": copy_text}) + "\n")
        f.write(json.dumps({"doc_id": 200001, "text": "qq zz xx yy ww vv uu tt"}) + "\n")
    stream = spark.readStream.schema("doc_id long, text string").json(str(d))
    seen: list = []
    q = stream_near_dup_monitor(
        stream, corpus, sink=lambda flags, bid: seen.extend(flags.collect())
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["doc_id"] for r in seen}
    assert 200000 in got, seen
    assert 200001 not in got
    match = next(r for r in seen if r["doc_id"] == 200000)
    assert match["jaccard"] >= 0.8
