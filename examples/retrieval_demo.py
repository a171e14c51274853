"""Retrieval-stack demo over the parquet fixtures — the first-stage
retrieval battery a RAG or training-data-curation pipeline runs,
chained through the public operator API:

    lexical:  BM25 over the corpus for a term query     (operators/retrieval.py)
    dense:    exact cosine top-k for query vectors      (operators/similarity.py)
    sublinear: LSH-bucketed ANN (the 100 TB path)       (operators/similarity.py)
    fusion:   reciprocal rank fusion of the two lists   (operators/retrieval.py)
    diversity: MMR re-rank of the fused candidates      (operators/retrieval.py)

Run:  python examples/retrieval_demo.py [sf_dir]

Scale notes live in each operator's docstring; the shapes that matter:
candidate lists are cut by TakeOrderedAndProject (distributed partial
top-k), the pairwise-similarity state is C²-bounded, and the greedy
MMR loop runs inside one Arrow cogroup task per query — nothing is
collected to the driver until the final `show`.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_spring_cloud_stream_tp1_spark.operators.retrieval import (
    bm25,
    mmr_select,
    rrf_fusion,
)
from kafka_streams_spring_cloud_stream_tp1_spark.operators.similarity import (
    ann_lsh,
    knn_bruteforce,
)
from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark
from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="retrieval_demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    terms = ["spark", "hash", "window"]

    print("== BM25 lexical top-5 ==")
    bm25(docs, terms).orderBy("score", ascending=False).show(5)

    print("== exact dense top-5 for query vector 0 ==")
    knn_bruteforce(emb, n_queries=1, k=5).show()

    print("== ANN (LSH buckets) top-5 — the sub-linear path ==")
    ann_lsh(emb, n_queries=1, k=5).show()

    print("== RRF fusion of lexical + dense (top 10) ==")
    rrf_fusion(docs, emb, terms, top=10).show()

    print("== MMR diversity re-rank of the dense top-30 (k=5) ==")
    mmr_select(emb, n_queries=1, candidates=30, k=5).show()

    spark.stop()


if __name__ == "__main__":
    main()
