"""Hot-bucket bounding in the blocked pair-generation lanes.

VERDICT r07 flagged the last two collect-then-filter lanes
(`lsh_candidate_pairs`, `ngram_jaccard_pairs_capped`): a saturated
key materialized its FULL doc array in one aggregation row before the
size filter dropped it — a df≈10⁹ key would be an ~8 GB row on one
reducer at 100 TB. These tests pin the fix (`buckets.
bounded_id_buckets`): eligibility is decided on a count-only
aggregate BEFORE any array exists, so arrays are ≤ max_df elements by
construction.

Three layers:
- plan shape: the optimized plan shows the count-eligibility
  aggregate (`_df`) BELOW the collect_list aggregate in all three
  lanes (LSH bands, capped Jaccard, winnow);
- unit bound: bounded_id_buckets never emits an array > max_df even
  when one key covers the whole input;
- planted mega-family: a band bucket / shingle shared by thousands of
  docs is dropped count-first, the pipeline completes, and the audit
  surfaces exactly the suppressed buckets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_spring_cloud_stream_tp1_spark.operators import dedup as D
from kafka_streams_spring_cloud_stream_tp1_spark.operators.buckets import (
    bounded_id_buckets,
    intra_bucket_pairs,
)
from kafka_streams_spring_cloud_stream_tp1_spark.operators.text import (
    winnow_overlap_pairs,
)
from kafka_streams_spring_cloud_stream_tp1_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _assert_count_gate_below_collect(plan: str) -> None:
    """The `_df` count aggregate (eligibility gate) must appear in the
    plan AND sit below (= later in the printed tree than) the
    collect_list aggregate, i.e. collect runs on pre-filtered rows."""
    assert "_df" in plan, plan
    assert "collect_list" in plan, plan
    assert plan.index("collect_list") < plan.index("_df"), (
        "count-eligibility gate is not an input of the collect_list aggregate"
    )


def test_lsh_pairs_count_gate_precedes_collect(spark):
    sig = D.minhash_signatures(load_table(spark, SF, "documents"))
    plan = _optimized(D.lsh_candidate_pairs(sig))
    _assert_count_gate_below_collect(plan)


def test_capped_jaccard_count_gate_precedes_collect(spark):
    plan = _optimized(
        D.ngram_jaccard_pairs_capped(load_table(spark, SF, "documents"))
    )
    _assert_count_gate_below_collect(plan)


def test_winnow_count_gate_precedes_collect(spark):
    plan = _optimized(winnow_overlap_pairs(load_table(spark, SF, "documents")))
    _assert_count_gate_below_collect(plan)


def test_bounded_buckets_array_never_exceeds_cap(spark):
    # one key ("hot") covers 90% of rows; cap at 8
    rows = [("hot" if i % 10 else f"cold_{i}", i) for i in range(2000)]
    u = spark.createDataFrame(rows, "v string, doc_id long")
    out = bounded_id_buckets(u, ["v"], min_df=2, max_df=8)
    sizes = [r[0] for r in out.select(F.size("ds")).collect()]
    assert sizes == [] or max(sizes) <= 8
    # the hot key is gone entirely, not truncated
    assert out.filter(F.col("v") == "hot").count() == 0


def test_bounded_buckets_matches_unbounded_semantics(spark):
    # for keys within the cap, output equals the naive collect+filter
    rows = [(f"k{i % 50}", i) for i in range(400)]
    u = spark.createDataFrame(rows, "v string, doc_id long")
    got = {
        r["v"]: r["ds"]
        for r in bounded_id_buckets(u, ["v"], min_df=2, max_df=64).collect()
    }
    want = {
        r["v"]: r["ds"]
        for r in u.groupBy("v")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= 64))
        .collect()
    }
    assert got == want


@pytest.fixture(scope="module")
def mega_family(spark):
    """4000 byte-identical docs (one LSH mega-bucket per band) plus a
    planted rare near-dup pair and unique fillers."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rare_a = "zephyr quasar nebula protostar magnetar pulsar quark gluon"
    rare_b = "zephyr quasar nebula protostar magnetar pulsar quark boson"
    rows = [(i, boiler) for i in range(4000)]
    rows += [(90001, rare_a), (90002, rare_b)]
    rows += [(91000 + i, f"unique filler document number {i} alpha beta {i * 7}") for i in range(50)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_mega_family_lsh_dropped_and_audited(spark, mega_family):
    sig = D.minhash_signatures(mega_family)
    pairs = D.lsh_candidate_pairs(sig, max_bucket=64)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    # the 4000-doc family's ~8M intra-pairs are suppressed...
    assert not any(a < 4000 and b < 4000 for a, b in got)
    # ...and the planted rare pair is still discovered
    assert (90001, 90002) in got
    # the audit reports the suppressed buckets: 4 bands × one mega bucket
    audit = D.lsh_overloaded_buckets(sig, max_bucket=64)
    rows = audit.collect()
    assert len(rows) == 4
    assert all(r.bucket_size == 4000 for r in rows)


def test_mega_family_capped_jaccard_completes_and_finds_rare_pair(spark, mega_family):
    out = D.ngram_jaccard_pairs_capped(mega_family, n=3, threshold=0.5, max_df=64)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in out.collect()}
    assert (90001, 90002) in got
    assert not any(a < 4000 and b < 4000 for a, b in got)


def test_intra_bucket_pairs_orders_and_filters(spark):
    # contract (r13): ds arrives SORTED with unique ids — exactly what
    # bounded_id_buckets emits (sort_array over unique (key, id) rows).
    # The slice-based emitter relies on it: j > i ⟺ ds[j] > ds[i].
    buckets = spark.createDataFrame(
        [("k", [1, 2, 3]), ("k2", [7, 9])], "v string, ds array<long>"
    )
    got = {(r.doc_a, r.doc_b) for r in intra_bucket_pairs(buckets).collect()}
    assert got == {(1, 2), (1, 3), (2, 3), (7, 9)}


def test_intra_bucket_pairs_matches_full_square_filter_form(spark):
    # r13 equivalence pin: the upper-triangle slice emission produces
    # exactly the pairs the full-b² transform+filter(a<b) form did, in
    # the same order, on every sorted bucket (including size 0/1).
    import random

    from pyspark.sql import functions as F

    rng = random.Random(13)
    rows = []
    for k in range(40):
        ids = sorted(rng.sample(range(1000), rng.randint(0, 12)))
        rows.append((str(k), ids))
    buckets = spark.createDataFrame(rows, "v string, ds array<long>")
    old = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ds",
                    lambda x: F.filter(
                        F.transform("ds", lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b"))),
                        lambda p: p["doc_a"] < p["doc_b"],
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    assert old.collect() == intra_bucket_pairs(buckets).collect()


def test_containment_count_gate_precedes_collect(spark):
    plan = _optimized(
        D.containment_pairs(load_table(spark, SF, "documents"))
    )
    _assert_count_gate_below_collect(plan)


def test_inverted_index_count_gate_precedes_collect(spark):
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.retrieval import (
        inverted_index,
    )

    plan = _optimized(
        inverted_index(load_table(spark, SF, "documents"), min_df=2, max_df=400)
    )
    _assert_count_gate_below_collect(plan)
