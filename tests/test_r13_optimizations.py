"""Equivalence pins for the round-13 optimizations.

Each test pins an identity an r13 rewrite relies on, comparing the
optimized operator against the pre-r13 form inlined here — so a future
edit that breaks the identity fails loudly instead of silently
changing query results.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_streams_spring_cloud_stream_tp1_spark.operators import dedup as D
from kafka_streams_spring_cloud_stream_tp1_spark.operators import vocab as V
from kafka_streams_spring_cloud_stream_tp1_spark.operators.retrieval import bm25
from kafka_streams_spring_cloud_stream_tp1_spark.operators.text import tokens
from kafka_streams_spring_cloud_stream_tp1_spark.sources.tables import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def test_hashed_shingle_jaccard_equals_string_jaccard(spark):
    """Set Jaccard is invariant under the xxhash64 identity map on
    this corpus (no collisions): every all-pairs value over a sample
    matches the string-array computation exactly."""
    sh = D.shingle_sets(load_table(spark, SF, "documents"), n=3).limit(80)
    shh = D._hash_shingles(sh)
    a_s = sh.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sa"))
    b_s = sh.select(F.col("doc_id").alias("b"), F.col("shingles").alias("sb"))
    a_h = shh.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sa"))
    b_h = shh.select(F.col("doc_id").alias("b"), F.col("shingles").alias("sb"))

    def all_pairs(a, b):
        return (
            a.crossJoin(b)
            .filter(F.col("a") < F.col("b"))
            .select("a", "b", D.exact_jaccard("sa", "sb").alias("j"))
            .collect()
        )

    got_s = {(r.a, r.b): r.j for r in all_pairs(a_s, b_s)}
    got_h = {(r.a, r.b): r.j for r in all_pairs(a_h, b_h)}
    assert got_s == got_h and got_s


def test_hash_shingles_preserves_sizes(spark):
    """xxhash64 is injective on every doc's shingle set here, so the
    hashed array has the same length (distinctness preserved)."""
    sh = D.shingle_sets(load_table(spark, SF, "documents"), n=2)
    bad = (
        D._hash_shingles(sh)
        .select("doc_id", F.size(F.array_distinct("shingles")).alias("nh"))
        .join(sh.select("doc_id", F.size("shingles").alias("ns")), "doc_id")
        .filter(F.col("nh") != F.col("ns"))
        .count()
    )
    assert bad == 0


def test_snm_single_window_matches_union_form(spark):
    """snm_pairs' one-window multi-lead explode emits the same pair set
    (and Jaccard values) as the pre-r13 per-offset union form."""
    from pyspark.sql import Window

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.hashing import fan_out

    df = load_table(spark, SF, "documents")
    window, block_chars, key_chars, threshold = 5, 2, 24, 0.5
    key = F.substring(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", ""), 1, key_chars
    )
    base = (
        fan_out(df)
        .select(
            F.col("doc_id").alias("id"),
            key.alias("k"),
            F.array_distinct(tokens("text")).alias("toks"),
        )
        .withColumn("blk", F.substring(F.col("k"), 1, block_chars))
    )
    w = Window.partitionBy("blk").orderBy("k", "id")
    shifted = None
    for i in range(1, window):
        s = base.select(
            "id",
            "toks",
            F.lead("id", i).over(w).alias("nid"),
            F.lead("toks", i).over(w).alias("ntoks"),
        ).filter(F.col("nid").isNotNull())
        shifted = s if shifted is None else shifted.unionAll(s)
    old = (
        shifted.select(
            F.least("id", "nid").alias("doc_a"),
            F.greatest("id", "nid").alias("doc_b"),
            D.exact_jaccard("toks", "ntoks").alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    old_rows = {(r.doc_a, r.doc_b): r.jaccard for r in old.collect()}
    new_rows = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.snm_pairs(df, threshold=threshold).collect()
    }
    assert old_rows == new_rows


def test_token_pmi_totals_identity(spark):
    """N_tokens = Σ size(tokens) and N_bigrams = Σ max(size−1, 0)
    equal the exploded-row counts the pre-r13 form used."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.text import (
        word_ngrams_multiset,
    )

    df = load_table(spark, SF, "documents")
    n_uni_old = df.select(F.explode(tokens("text")).alias("t")).count()
    n_bi_old = df.select(
        F.explode(word_ngrams_multiset(tokens("text"), 2)).alias("b")
    ).count()
    nt = F.size(tokens("text"))
    row = df.select(nt.alias("nt")).agg(
        F.sum("nt").alias("n_uni"),
        F.sum(F.greatest(F.col("nt") - 1, F.lit(0))).alias("n_bi"),
    ).collect()[0]
    assert (row.n_uni, row.n_bi) == (n_uni_old, n_bi_old)


def test_bm25_single_pass_matches_two_pass_form(spark):
    """bm25's one-tokenize projection produces the identical score
    table as the pre-r13 two-pass (explode+filter / re-tokenize stats)
    form."""
    qt = ["spark", "hash", "window"]
    k1, b = 1.2, 0.75
    df = load_table(spark, SF, "documents")
    toks = tokens("text")
    base = df.select(
        F.col("doc_id"), F.size(toks).alias("dl"), F.explode(toks).alias("term")
    ).filter(F.col("term").isin(qt))
    tf = base.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    tf = tf.join(F.broadcast(dfreq), "term")
    stats = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens("text"))).alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    old = (
        tf.crossJoin(F.broadcast(stats))
        .withColumn("contrib", idf * tf_part)
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("contrib"), 4).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    old_rows = {r.doc_id: (r.score, r.n_terms_hit) for r in old.collect()}
    new_rows = {
        r.doc_id: (r.score, r.n_terms_hit)
        for r in bm25(df, query_terms=qt, k1=k1, b=b).collect()
    }
    assert old_rows == new_rows


def test_pmi_matches_pre_r13_values(spark):
    """token_pmi end-to-end against the pre-r13 four-pass form."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.hashing import fan_out
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.text import (
        word_ngrams_multiset,
    )

    df = load_table(spark, SF, "documents")
    min_count = 2
    bg = fan_out(df).select(
        F.explode(word_ngrams_multiset(tokens("text"), 2)).alias("bg")
    )
    uni = df.select(F.explode(tokens("text")).alias("token"))
    n_bi = bg.agg(F.count(F.lit(1)).alias("n_bi"))
    n_uni = uni.agg(F.count(F.lit(1)).alias("n_uni"))
    ucnt = uni.groupBy("token").agg(F.count(F.lit(1)).alias("c_w"))
    bcnt = (
        bg.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    w1 = F.split("bg", " ")[0]
    w2 = F.split("bg", " ")[1]
    joined = (
        bcnt.withColumn("w1", w1)
        .withColumn("w2", w2)
        .join(ucnt.select(F.col("token").alias("w1"), F.col("c_w").alias("c_a")), "w1")
        .join(ucnt.select(F.col("token").alias("w2"), F.col("c_w").alias("c_b")), "w2")
        .crossJoin(F.broadcast(n_bi))
        .crossJoin(F.broadcast(n_uni))
    )
    num = F.col("c_ab").cast("double") * F.col("n_uni") * F.col("n_uni")
    den = F.col("n_bi").cast("double") * F.col("c_a") * F.col("c_b")
    old = joined.select(
        "bg", "c_ab", (F.round(F.log(num / den), 4) + F.lit(0.0)).alias("pmi")
    )
    old_rows = {r.bg: (r.c_ab, r.pmi) for r in old.collect()}
    new_rows = {
        r.bg: (r.c_ab, r.pmi)
        for r in V.token_pmi(df, min_count=min_count).collect()
    }
    assert old_rows == new_rows and old_rows
