"""End-to-end training-corpus assembly demo over the parquet fixtures —
the LLM-data-pipeline arc this engine adds beyond the reference's
streaming loop, chained through the public operator API:

    load documents
      → quality stats + language ID            (operators/text.py)
      → quality filter                          (plain Catalyst filter)
      → exact dedup, keep canonical docs        (operators/dedup.py)
      → near-dup pairs → clusters → survivors   (PPJoin + components)
      → deterministic train/val/test split      (operators/sampling.py)
      → per-split token accounting

Run:  python examples/llm_pipeline_demo.py [sf_dir]

Every stage is lazy — the pipeline below is ONE Catalyst plan per
action, and each operator documents its 100 TB shape in its module.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_spring_cloud_stream_tp1_spark.operators.dedup import (
    dup_clusters,
    exact_dedup_groups,
    ngram_jaccard_pairs,
)
from kafka_streams_spring_cloud_stream_tp1_spark.operators.sampling import with_split
from kafka_streams_spring_cloud_stream_tp1_spark.operators.text import (
    with_lang_id,
    with_text_stats,
)
from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark
from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="llm-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    print(f"corpus: {docs.count()} docs from {sf_dir}")

    # 1. quality + language annotation (both are doc_id-keyed
    #    projections; join them back onto the corpus)
    stats = with_text_stats(docs)
    lang = with_lang_id(docs).select("doc_id", "pred_lang")
    annotated = docs.join(stats, "doc_id").join(lang, "doc_id")

    # 2. quality gate: drop short and low-alpha docs
    kept = annotated.filter((F.col("n_tokens") >= 5) & (F.col("alpha_ratio") > 0.5))
    print(f"after quality gate: {kept.count()}")

    # 3. exact dedup (normalized token-bag hash): keep canonical ids
    exact = exact_dedup_groups(kept.select("doc_id", "text"))
    canon = kept.join(
        exact.filter(~F.col("is_dup")).select("doc_id"), "doc_id", "leftsemi"
    )
    print(f"after exact dedup: {canon.count()}")

    # 4. near-dup clustering: PPJoin trigram-Jaccard pairs → connected
    #    components → keep the longest doc per cluster
    pairs = ngram_jaccard_pairs(canon.select("doc_id", "text"), n=3, threshold=0.8)
    labels = dup_clusters(pairs)
    ranked = labels.join(canon.select("doc_id", "n_chars"), "doc_id")
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    losers = (
        ranked.withColumn("rk", F.row_number().over(w)).filter("rk > 1").select("doc_id")
    )
    final = canon.join(losers, "doc_id", "leftanti")
    print(f"after near-dup clustering: {final.count()}")

    # 5. composite Gopher-rules verdict (round 5): the per-rule audit
    #    columns say WHY a doc fell, not just that it fell
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.text import (
        gopher_quality_filter,
    )

    gopher = gopher_quality_filter(final.select("doc_id", "text"))
    n_gopher = gopher.filter("keep").count()
    print(f"Gopher-rules verdict keeps: {n_gopher}")
    final = final.join(gopher.filter("keep").select("doc_id"), "doc_id", "leftsemi")

    # 6. deterministic split + token accounting + leakage audit
    split = with_split(final, {"train": 0.9, "val": 0.05, "test": 0.05})
    summary = (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("tokens"),
        )
        .orderBy("split")
    )
    summary.show(truncate=False)

    # 7. pre-eval contamination gate (round 5): prefix fingerprints
    #    present in more than one split
    fp = split.select(
        F.md5(F.concat_ws(" ", F.slice(F.split(F.trim("text"), r"\s+"), 1, 5))).alias("fp"),
        "split",
    ).distinct()
    leaks = (
        fp.alias("a")
        .join(fp.alias("b"), "fp")
        .filter(F.col("a.split") < F.col("b.split"))
        .groupBy(F.col("a.split").alias("split_a"), F.col("b.split").alias("split_b"))
        .count()
    )
    print("cross-split prefix-fingerprint leaks:")
    leaks.show(truncate=False)


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
