"""Planted mega-family hot-key proof at 100× (VERDICT r07 #2 / r08 #7c).

Re-runnable form of the round-8 session experiment recorded in
BASELINE.md §"Planted mega-family at 100×": the 100× real-growth
corpus (500 k unique docs) plus

- **100 000 byte-identical planted docs** — one LSH band bucket per
  band of size 1e5, the adversarial hot key that would make a
  collect-then-filter lane materialize ~GB aggregation rows (at 1e9
  docs, ~8 GB per band), and
- **one planted rare near-dup pair** — two long unique texts differing
  in one word, the needle the cap must NOT drop,

pushed through the bounded lanes on local[32]:

1. ``lsh_candidate_pairs(max_bucket=64)`` must complete, emit ZERO
   intra-family pairs (the 1e5-doc family is dropped while it is
   still a COUNTER row — count-first eligibility in
   ``buckets.bounded_id_buckets``), and still find the planted rare
   pair.
2. ``lsh_overloaded_buckets(max_bucket=64)`` must report the mega
   band buckets at bucket_size=100 000 — the drop is observable,
   never silent.
3. ``ngram_jaccard_pairs_capped(max_df=64)`` must complete with the
   boiler shingles (df ≈ 1e5) pruned count-first.

Planted doc_ids sit above 2×10⁹: the 100× copy generator shifts ids by
copy·10⁷ up to ~9.9×10⁸, and ids below that silently merge with
copy-90/99 rows at the signature groupBy (the caveat BASELINE.md
records — the first session run's "3 558 mega pairs" were natural
copy-90 near-dups under colliding ids).

Usage: python tools/mega_family_100x.py [corpus_dir]
Default corpus_dir /tmp/sf0.1x100u (build it first:
``python tools/build_scale_corpus.py 100 /root/testdata/sf0.1
/tmp/sf0.1x100u --generate``). Exits non-zero if any invariant fails.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_spring_cloud_stream_tp1_spark.operators.dedup import (
    lsh_candidate_pairs,
    lsh_overloaded_buckets,
    minhash_signatures,
    ngram_jaccard_pairs_capped,
)
from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark

FAMILY_BASE = 2_000_000_000  # above every shifted natural id
FAMILY_SIZE = 100_000
PAIR_A, PAIR_B = 2_200_000_000, 2_200_000_001
MAX_BUCKET = 64


def main() -> int:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf0.1x100u"
    spark = get_spark(
        app_name="mega_family_100x", extra_conf={"spark.driver.memory": "6g"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{corpus}/documents.parquet").select("doc_id", "text")
    mega_text = (
        "boilerplate mirror footer navigation copyright reserved "
        "terms privacy cookie banner subscribe newsletter"
    )
    family = spark.range(FAMILY_BASE, FAMILY_BASE + FAMILY_SIZE).select(
        F.col("id").alias("doc_id"), F.lit(mega_text).alias("text")
    )
    rare_words = [f"zq{i}needle" for i in range(50)]
    rare_a = " ".join(rare_words)
    rare_b = " ".join(rare_words[:-1] + ["zqchangedneedle"])
    rare = spark.createDataFrame(
        [(PAIR_A, rare_a), (PAIR_B, rare_b)], ["doc_id", "text"]
    )
    all_docs = docs.unionByName(family).unionByName(rare)
    n = all_docs.count()
    print(f"corpus rows incl. planted: {n}", flush=True)

    sig = minhash_signatures(all_docs)
    failures: list[str] = []

    t0 = time.time()
    cands = lsh_candidate_pairs(sig, max_bucket=MAX_BUCKET)
    in_family = (F.col("doc_a") >= FAMILY_BASE) & (
        F.col("doc_a") < FAMILY_BASE + FAMILY_SIZE
    ) & (F.col("doc_b") >= FAMILY_BASE) & (
        F.col("doc_b") < FAMILY_BASE + FAMILY_SIZE
    )
    is_rare = (F.col("doc_a") == PAIR_A) & (F.col("doc_b") == PAIR_B)
    agg = cands.agg(
        F.count(F.lit(1)).alias("n_cand"),
        F.sum(F.when(in_family, 1).otherwise(0)).alias("n_family"),
        F.sum(F.when(is_rare, 1).otherwise(0)).alias("n_rare"),
    ).collect()[0]
    t_cand = time.time() - t0
    print(
        f"lsh_candidate_pairs: {agg['n_cand']} candidates, "
        f"{agg['n_family']} intra-mega-family, {agg['n_rare']} planted-rare "
        f"in {t_cand:.1f}s",
        flush=True,
    )
    if agg["n_family"] != 0:
        failures.append(f"mega family leaked {agg['n_family']} pairs past the cap")
    if agg["n_rare"] != 1:
        failures.append("planted rare pair NOT found")

    t0 = time.time()
    over = (
        lsh_overloaded_buckets(sig, max_bucket=MAX_BUCKET)
        .groupBy("bucket_size")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .orderBy(F.desc("bucket_size"))
        .collect()
    )
    t_over = time.time() - t0
    mega_rows = [r for r in over if r["bucket_size"] >= FAMILY_SIZE]
    total_over = sum(r["n_buckets"] for r in over)
    print(
        f"lsh_overloaded_buckets: {total_over} overloaded buckets, "
        f"mega-size rows {[(r['bucket_size'], r['n_buckets']) for r in mega_rows]} "
        f"in {t_over:.1f}s",
        flush=True,
    )
    if sum(r["n_buckets"] for r in mega_rows) < 4:
        failures.append(
            f"expected >=4 band buckets at size {FAMILY_SIZE}, got {mega_rows}"
        )

    t0 = time.time()
    n_capped = ngram_jaccard_pairs_capped(all_docs, max_df=MAX_BUCKET).count()
    t_capped = time.time() - t0
    print(f"ngram_jaccard_pairs_capped: {n_capped} pairs in {t_capped:.1f}s", flush=True)

    if failures:
        print("FAIL:", "; ".join(failures), flush=True)
        return 1
    print("MEGA-FAMILY PROOF OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
