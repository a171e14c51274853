"""Deterministic sampling/splitting operators (operators/sampling.py):
reproducibility, coverage, and the split-stability-under-growth
property that motivates hash assignment over rand()/sample()."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_spring_cloud_stream_tp1_spark.operators.sampling import (
    stratified_keep,
    with_split,
)

FRACS = {"train": 0.9, "val": 0.05, "test": 0.05}


def test_split_covers_all_rows_and_is_deterministic(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"] for r in with_split(df, FRACS).collect()}
    b = {r["doc_id"]: r["split"] for r in with_split(df, FRACS).collect()}
    assert a == b  # pure function of id — no run-to-run drift
    assert set(a.values()) == {"train", "val", "test"}
    n = len(a)
    train = sum(1 for v in a.values() if v == "train")
    assert 0.85 * n < train < 0.95 * n  # ~90% ± hash variance


def test_split_stable_under_corpus_growth(spark):
    """A doc's split must not change when the corpus doubles — the
    property that keeps eval sets uncontaminated across versions
    (rand()/sample() assignments have no such stability)."""
    small = spark.range(1000).select(F.col("id").alias("doc_id"))
    big = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"] for r in with_split(small, FRACS).collect()}
    b = {r["doc_id"]: r["split"] for r in with_split(big, FRACS).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_stratified_keep_quotas(spark):
    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "de").otherwise("fr").alias("lang"),
    )
    out = df.withColumn("kept", stratified_keep(df, {"en": 0.5, "de": 0.0}, strata_col="lang"))
    rates = {
        r["lang"]: r["rate"]
        for r in out.groupBy("lang").agg(F.avg(F.col("kept").cast("double")).alias("rate")).collect()
    }
    assert 0.4 < rates["en"] < 0.6  # ~50%
    assert rates["de"] == 0.0       # zero quota drops the stratum
    assert rates["fr"] == 1.0       # unlisted strata keep default


def test_repetition_stats_hand_computed(spark):
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.text import (
        with_repetition_stats,
    )

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y z w"), (3, "hi")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    # doc1: tokens [a,a,a,b] -> 3/4; bigrams [a a, a a, a b] -> 2/3;
    # trigrams [a a a, a a b] all unique -> 0
    assert rows[1]["max_token_frac"] == 0.75
    assert rows[1]["top_bigram_frac"] == 0.6667
    assert rows[1]["dup_trigram_frac"] == 0.0
    # doc2: everything unique
    assert rows[2]["max_token_frac"] == 0.25
    assert rows[2]["top_bigram_frac"] == 0.3333
    assert rows[2]["dup_trigram_frac"] == 0.0
    # doc3: one token -> no bigrams/trigrams -> NULL, not 0
    assert rows[3]["max_token_frac"] == 1.0
    assert rows[3]["top_bigram_frac"] is None
    assert rows[3]["dup_trigram_frac"] is None


def test_weighted_sample_prefers_heavy_rows_and_is_stable(spark):
    """Efraimidis-Spirakis with deterministic hash-uniforms: heavy
    rows must be strongly overrepresented, and two runs must pick the
    IDENTICAL sample (no RNG state)."""
    import pyspark.sql.functions as F

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.hashing import xhash

    n, k = 2000, 100
    df = spark.range(n).select(
        F.col("id").alias("o_orderkey"),
        # rows 0..99 carry weight 50, the rest weight 1
        F.when(F.col("id") < 100, 50.0).otherwise(1.0).alias("w"),
    )
    u = (xhash(F.concat(F.lit("ws|"), F.col("o_orderkey").cast("string"))) + 1) / F.lit(
        float(1 << 60)
    )
    keyed = df.select("o_orderkey", "w", (F.log(u) / F.col("w")).alias("es_key"))
    pick = lambda: [
        r["o_orderkey"]
        for r in keyed.orderBy(F.desc("es_key"), "o_orderkey").limit(k).collect()
    ]
    s1, s2 = pick(), pick()
    assert s1 == s2
    heavy = sum(1 for i in s1 if i < 100)
    # heavy rows are 5% of the population with 50x weight → expected
    # inclusion ~≥80 of 100 slots; require a wide-margin majority
    assert heavy >= 60, heavy
    assert len(set(s1)) == k  # without replacement by construction
