"""Extension-surface semantics: UDTF chunking invariants and the
grouped-agg UDF's group isolation (properties beyond the value
oracle)."""

from __future__ import annotations

from kafka_streams_spring_cloud_stream_tp1_spark.operators.udx import chunk_documents
from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table

from .conftest import SF_SMOKE


def test_chunks_cover_document_with_overlap(spark):
    """Every word of every document must appear in some chunk, chunks
    are <= max_tokens, and consecutive chunks share exactly `overlap`
    words (except a shorter final chunk)."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(20).cache()
    chunks = chunk_documents(docs, max_tokens=32, overlap=4).collect()
    texts = {r["doc_id"]: r["text"].split() for r in docs.select("doc_id", "text").collect()}
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        words = texts[doc_id]
        step = 32 - 4
        for r in rows:
            assert r["n_tokens"] <= 32
            start = r["chunk_idx"] * step
            assert r["chunk"].split() == words[start : start + 32]
        # coverage: last chunk reaches the document's end
        last = rows[-1]
        assert last["chunk_idx"] * step + last["n_tokens"] == len(words)
    docs.unpersist()


def test_functions_api(spark):
    """The public Column-function vocabulary composes in plain
    selects: cosine matches the similarity module's math, time_bucket
    matches F.window's epoch-aligned start."""
    from pyspark.sql import functions as F

    from kafka_streams_spring_cloud_stream_tp1_spark import functions as EF

    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], "a array<double>, b array<double>"
    )
    got = [round(r["c"], 6) for r in df.select(EF.cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert got == [1.0, 0.0]

    ev = spark.createDataFrame([("2024-01-01 00:00:07",)], "ts string").select(
        F.to_timestamp("ts").alias("ts")
    )
    b = ev.select(EF.time_bucket("ts", "5 seconds").alias("b")).collect()[0]["b"]
    assert b.second == 5
