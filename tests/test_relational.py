"""Extra semantics checks that the value-hash oracle can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_spring_cloud_stream_tp1_spark.plans import queries_map
from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table

from .conftest import SF_SMOKE


def test_approx_count_distinct_accuracy(spark):
    """The HLL estimate must track the exact distinct count within a
    few relative-standard-deviations."""
    approx = {
        r["event_type"]: r["approx_users"]
        for r in queries_map()["q_approx_count_distinct"](spark, SF_SMOKE).collect()
    }
    exact = {
        r["event_type"]: r["users"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) <= max(2, 0.1 * exact[k]), (k, est, exact[k])


def test_topk_pushdown_plan(spark):
    """Global top-k must plan TakeOrderedAndProject (per-partition heap
    + driver merge), never a full global sort."""
    df = queries_map()["q_top_k_global"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_broadcast_join_plan(spark):
    """The fact-dim join must be a broadcast hash join — no shuffle of
    the fact side."""
    df = queries_map()["q_join_broadcast"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_asof_join_edge_semantics(spark):
    """At-or-before semantics: equal timestamps match; rows before any
    right row get nulls; the LATEST prior right row wins."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k", 5.0), (2, "k", 10.0), (3, "k", 30.0), (4, "x", 7.0)],
        "event_id long, k string, t double",
    )
    right = spark.createDataFrame(
        [("k", 10.0, 100), ("k", 20.0, 200)], "k string, t double, payload long"
    )
    out = {
        r["event_id"]: r["payload"]
        for r in asof_join(
            left, right, left_key="k", right_key="k", left_ts="t", right_ts="t",
            payload_cols=["payload"],
        ).collect()
    }
    assert out == {
        1: None,  # before any right row
        2: 100,   # equal ts matches (at-or-before)
        3: 200,   # latest prior wins
        4: None,  # key with no right rows at all
    }, out


def test_asof_join_rejects_payload_collision(spark):
    """A payload column that collides with a left-side name must be
    rejected eagerly — the silent alternative is two identically-named
    output columns that only blow up downstream (ADVICE r1)."""
    import pytest

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "k", 5.0)], "event_id long, k string, t double")
    right = spark.createDataFrame([("k", 5.0, 1.0)], "k string, ts double, t double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left, right, left_key="k", right_key="k", left_ts="t", right_ts="ts",
            payload_cols=["t"],
        )


def test_pagerank_mass_conservation_and_ranking(spark):
    """With no dangling nodes, total rank mass stays 1.0 after every
    iteration; on a star graph the hub must outrank every leaf."""
    import pyspark.sql.functions as F

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.graph import pagerank

    star = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(6)], "src string, dst string"
    )
    for iters in (1, 3):
        pr = pagerank(star, iterations=iters)
        rows = {r["node"]: r["rank"] for r in pr.collect()}
        assert abs(sum(rows.values()) - 1.0) < 1e-9, rows
        assert all(rows["hub"] > v for k, v in rows.items() if k != "hub"), rows


def test_event_markov_rows_are_distributions(spark):
    """Per-source transition probabilities must sum to 1 and every
    count must be positive."""
    import pyspark.sql.functions as F

    from kafka_streams_spring_cloud_stream_tp1_spark.plans.relational_queries import (
        q_event_markov,
    )

    from .conftest import SF_SMOKE

    probs = q_event_markov(spark, SF_SMOKE)
    sums = probs.groupBy("src").agg(F.sum("prob").alias("p")).collect()
    assert sums and all(abs(r["p"] - 1.0) < 1e-9 for r in sums), sums
    assert probs.filter("n <= 0 OR prob <= 0 OR prob > 1").count() == 0


def test_rfm_quartiles_balanced_and_deterministic(spark):
    """ntile(4) must split customers into near-equal quartiles
    (|max-min| ≤ 1 by definition), and two runs must agree exactly
    (the custkey tie-breaks make the ranking total)."""
    from kafka_streams_spring_cloud_stream_tp1_spark.plans.relational_queries import (
        q_rfm_segments,
    )

    from .conftest import SF_SMOKE

    seg = q_rfm_segments(spark, SF_SMOKE)
    for col in ("r_score", "f_score", "m_score"):
        counts = [r["cnt"] for r in seg.groupBy(col).count().withColumnRenamed("count", "cnt").collect()]
        assert len(counts) == 4 and max(counts) - min(counts) <= 1, (col, counts)
    a = sorted(map(tuple, seg.collect()))
    b = sorted(map(tuple, q_rfm_segments(spark, SF_SMOKE).collect()))
    assert a == b


def test_anomaly_zscore_flags_planted_spike(spark, tmp_path):
    """A synthetic uniform daily series with one 10× day must flag
    exactly that day (and its |z| must dominate)."""
    import pyspark.sql.functions as F

    from kafka_streams_spring_cloud_stream_tp1_spark.plans import QUERIES, queries_map

    queries_map()
    rows = []
    eid = 0
    for day in range(1, 21):
        n = 50 if day != 7 else 500
        for i in range(n):
            rows.append((eid, f"2024-03-{day:02d} 12:00:00", eid % 17, "click", 1.0, None))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sf_dir = str(tmp_path / "sf_synth")
    import os

    os.makedirs(sf_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(sf_dir, "events.parquet"))
    out = QUERIES["q_anomaly_zscore"].builder(spark, sf_dir).collect()
    assert len(out) == 1 and str(out[0]["day"]) == "2024-03-07", out


def test_ngram_novelty_ordering_semantics(spark):
    """A doc identical to an earlier doc must have novelty 0; the
    corpus-first doc is fully novel; novelty is within [0, 1]."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.dedup import shingle_sets

    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # verbatim dup of 1
            (3, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    sh = shingle_sets(docs, n=5)
    ex = sh.select("doc_id", F.explode("shingles").alias("g"))
    first = ex.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per = (
        ex.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)).alias("n_novel"),
        )
        .withColumn("novelty", F.col("n_novel") / F.col("n_grams"))
    )
    got = {r["doc_id"]: r["novelty"] for r in per.collect()}
    assert got[1] == 1.0 and got[2] == 0.0 and got[3] == 1.0, got


def test_cluster_canonical_invariants(spark):
    """The survivor must be a member of its own cluster with the
    maximal n_chars (doc_id-min among ties), and member counts must
    sum to the number of clustered docs."""
    from kafka_streams_spring_cloud_stream_tp1_spark.plans.llm_queries import (
        q_cluster_canonical,
        q_dedup_ngram_jaccard,
    )
    from kafka_streams_spring_cloud_stream_tp1_spark.operators import dedup as D
    from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table

    from .conftest import SF_SMOKE

    out = {r["cluster_id"]: r for r in q_cluster_canonical(spark, SF_SMOKE).collect()}
    pairs = q_dedup_ngram_jaccard(spark, SF_SMOKE)
    labels = D.dup_clusters(pairs)
    docs = {r["doc_id"]: r["n_chars"]
            for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars").collect()}
    members: dict[int, list[int]] = {}
    for r in labels.collect():
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    assert set(out) == set(members)
    for cid, m in members.items():
        keep = out[cid]["keep_doc_id"]
        assert keep in m
        best = max(m, key=lambda d: (docs[d], -d))
        assert keep == best, (cid, keep, best)
        assert out[cid]["n_members"] == len(m)


def test_ewma_fold_semantics(spark):
    """e_1 = v_1, e_i = 0.5 v_i + 0.5 e_{i-1}, ordered by (ts,
    event_id): [1, 3] -> 2.0; singleton passes through."""
    import datetime as dt

    from pyspark.sql import functions as F

    from kafka_streams_spring_cloud_stream_tp1_spark.plans.relational_queries import (
        q_ewma,
    )

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 7, 1.0),
        (2, dt.datetime(2024, 1, 1, 0, 0, 1), 7, 3.0),
        (3, dt.datetime(2024, 1, 1, 0, 0, 0), 9, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    df.createOrReplaceTempView("__ewma_probe")
    seq = df.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))).alias("seq")
    )
    vals = F.transform(F.col("seq"), lambda s: s["value"])
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5),
    )
    out = {
        r["user_id"]: r["e"]
        for r in seq.select("user_id", ewma.alias("e")).collect()
    }
    assert out == {7: 2.0, 9: 5.0}


def test_ewma_segmented_matches_exact(spark):
    """The bounded-state segment-and-carry fold computes the same
    EWMA as the exact sequential fold for every segment_len (affine
    composition is exact math; floats agree to association error),
    including lengths that don't divide the sequence and singleton
    segments; hand-check 9 steps of alpha=0.5 on one key."""
    import datetime as dt

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.timeseries import (
        ewma_last,
    )

    rows = []
    for uid, n in [(7, 9), (9, 1), (11, 4)]:
        for i in range(n):
            rows.append((uid * 100 + i, dt.datetime(2024, 1, 1, 0, 0, i), uid,
                         float((i * 37 + uid) % 11) + 0.25))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    exact = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in ewma_last(df, "user_id", ["ts", "event_id"], "value").collect()
    }
    # driver-side reference fold
    expect = {}
    for uid, n in [(7, 9), (9, 1), (11, 4)]:
        vals = [float((i * 37 + uid) % 11) + 0.25 for i in range(n)]
        e = vals[0]
        for v in vals[1:]:
            e = e * 0.5 + v * 0.5
        expect[uid] = e
    assert {u: v[1] for u, v in exact.items()} == pytest.approx(expect)
    for seg_len in (1, 2, 3, 5, 100):
        seg = {
            r["user_id"]: (r["n_events"], r["ewma"])
            for r in ewma_last(
                df, "user_id", ["ts", "event_id"], "value", segment_len=seg_len
            ).collect()
        }
        assert seg.keys() == exact.keys()
        for u in exact:
            assert seg[u][0] == exact[u][0]
            assert seg[u][1] == pytest.approx(exact[u][1], abs=1e-12)


def test_mann_whitney_matches_bruteforce(spark):
    """U, z, and the effect size must equal a direct O(n1*n2)
    pair-count computation over the same rows (midrank/tie-corrected
    formulas from first principles) — validates the value-bucket
    rank machinery end to end."""
    import math

    from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table

    rows = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("event_type", "value")
        .collect()
    )
    a = sorted(r.value for r in rows if r.event_type == "purchase")
    b = sorted(r.value for r in rows if r.event_type == "click")
    n1, n2 = len(a), len(b)
    u1 = 0.0
    for x in a:
        for y in b:
            if y < x:
                u1 += 1.0
            elif y == x:
                u1 += 0.5
    from collections import Counter

    ties = Counter(a) + Counter(b)
    t_term = sum(c**3 - c for c in ties.values())
    n = n1 + n2
    sigma = math.sqrt(n1 * n2 / 12.0 * ((n + 1) - t_term / (n * (n - 1))))
    z = (u1 - n1 * n2 / 2.0) / sigma
    row = queries_map()["q_mann_whitney"](spark, SF_SMOKE).collect()[0]
    assert row.n1 == n1 and row.n2 == n2
    assert abs(row.u1 - u1) < 1e-9
    assert abs(row.z - z) < 1e-9
    assert abs(row.rank_biserial - (1 - 2 * u1 / (n1 * n2))) < 1e-12


def test_ks_drift_matches_bruteforce_ecdf(spark):
    """Per-source KS statistic equals the direct sup-|F1−F2| over the
    union of jump points, computed in Python on the same rows."""
    from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table

    rows = (
        load_table(spark, SF_SMOKE, "documents")
        .select("source", "n_chars")
        .collect()
    )
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.n_chars)
    allv = sorted({r.n_chars for r in rows})
    out = {r.source: r for r in queries_map()["q_ks_drift"](spark, SF_SMOKE).collect()}
    assert set(out) == set(by_src)
    for src, vals in by_src.items():
        rest = [r.n_chars for r in rows if r.source != src]
        ks = max(
            abs(
                sum(v <= x for v in vals) / len(vals)
                - sum(v <= x for v in rest) / len(rest)
            )
            for x in allv
        )
        assert abs(out[src].ks - ks) < 1e-12, src
        assert out[src].n_docs == len(vals)


def test_acf_matches_numpy(spark):
    """Sample ACF at each lag equals the direct demeaned-product
    formula over the collected daily series (calendar-gap-aware:
    pairs exist only where day+k is present)."""
    from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table

    daily = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .count()
        .collect()
    )
    series = {r.day: r["count"] for r in daily}
    mu = sum(series.values()) / len(series)
    den = sum((x - mu) ** 2 for x in series.values())
    out = {r.lag: r for r in queries_map()["q_acf"](spark, SF_SMOKE).collect()}
    assert set(out) == set(range(1, 8))
    from datetime import timedelta

    for k in range(1, 8):
        pairs = [
            (series[d], series[d + timedelta(days=k)])
            for d in series
            if d + timedelta(days=k) in series
        ]
        num = sum((x - mu) * (y - mu) for x, y in pairs)
        assert out[k].n_pairs == len(pairs)
        assert abs(out[k].acf - num / den) < 1e-9, k


def test_cusum_matches_bruteforce(spark):
    """Peak |CUSUM| and its day must match the direct running-sum
    scan of standardized daily counts per event type."""
    import math

    from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table

    daily = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .collect()
    )
    by_type: dict = {}
    for r in daily:
        by_type.setdefault(r.event_type, []).append((r.day, r["count"]))
    out = {
        r.event_type: r
        for r in queries_map()["q_cusum_changepoint"](spark, SF_SMOKE).collect()
    }
    for et, pts in by_type.items():
        pts.sort()
        xs = [x for _, x in pts]
        n = len(xs)
        mu = sum(xs) / n
        sd = math.sqrt(sum(x * x for x in xs) / n - mu * mu)
        s, best = 0.0, (-1.0, None)
        for day, x in pts:
            s += (x - mu) / sd
            if abs(s) > best[0] + 1e-15:
                best = (abs(s), day)
        assert abs(out[et].max_cusum - best[0]) < 1e-9, et
        assert out[et].peak_day == best[1], et
        assert out[et].n_days == n


def test_benford_digits_and_expectations(spark):
    """All nine digits present, observed fractions sum to 1, and the
    expectation column is exactly the Python log10 law."""
    import math

    rows = queries_map()["q_benford"](spark, SF_SMOKE).collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    assert abs(sum(r.obs_frac for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert r.exp_frac == math.log10(1 + 1 / r.digit)
        assert abs(r.abs_dev - abs(r.obs_frac - r.exp_frac)) < 1e-15


def test_common_neighbor_scores_hand_graph(spark):
    """Square 1-2-3-4-1 plus pendant 5-1: the two diagonals are the
    only multi-neighbor candidates; existing edges never appear; the
    degree cap drops wedges through hot hubs."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.graph import (
        common_neighbor_scores,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (1, 5)], ["doc_a", "doc_b"]
    )
    out = {
        (r.doc_a, r.doc_b): r
        for r in common_neighbor_scores(edges, max_degree=64).collect()
    }
    # diagonals: (1,3) via {2,4}; (2,4) via {1,3} wait 4's nbrs {3,1}, 2's {1,3} -> common {1,3}
    assert out[(1, 3)].common == 2
    assert out[(2, 4)].common == 2
    # deg(1)=3, deg(3)=2: jaccard(1,3) = 2/(3+2-2)
    assert abs(out[(1, 3)].jaccard - 2 / 3) < 1e-12
    assert abs(out[(2, 4)].jaccard - 2 / (2 + 2 - 2)) < 1e-12
    # pendant 5 shares neighbor 1 with 2 and 4
    assert out[(2, 5)].common == 1 and out[(4, 5)].common == 1
    # no existing edge is ever proposed
    assert (1, 2) not in out and (3, 4) not in out
    # capping at degree 2 removes every wedge through node 1 (deg 3)
    capped = {
        (r.doc_a, r.doc_b): r
        for r in common_neighbor_scores(edges, max_degree=2).collect()
    }
    assert (2, 5) not in capped and (4, 5) not in capped
    assert capped[(2, 4)].common == 1  # only via 3 now


def test_auc_matches_pair_counting(spark):
    """AUC must equal the direct P(score_pos > score_neg) + ½P(=)
    pair count over the same per-user frame."""
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("v"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("np"),
        )
        .collect()
    )
    s = sum(r.np for r in rows)
    nu = len(rows)
    pos = [r.v for r in rows if r.np * nu > s]
    neg = [r.v for r in rows if r.np * nu <= s]
    u = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    )
    out = queries_map()["q_auc_propensity"](spark, SF_SMOKE).collect()[0]
    assert out.n_pos == len(pos) and out.n_neg == len(neg)
    assert abs(out.auc - u / (len(pos) * len(neg))) < 1e-12
    assert abs(out.gini - (2 * out.auc - 1)) < 1e-15


def test_welch_matches_bruteforce(spark):
    """t and the Welch-Satterthwaite df must match the textbook
    formulas computed in Python over the same daily series."""
    import math

    daily = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .collect()
    )
    a = [r["count"] for r in daily if r.event_type == "purchase"]
    b = [r["count"] for r in daily if r.event_type == "click"]
    m1, m2 = sum(a) / len(a), sum(b) / len(b)
    v1 = sum((x - m1) ** 2 for x in a) / (len(a) - 1)
    v2 = sum((x - m2) ** 2 for x in b) / (len(b) - 1)
    se = v1 / len(a) + v2 / len(b)
    t = (m1 - m2) / math.sqrt(se)
    df = se * se / (
        (v1 / len(a)) ** 2 / (len(a) - 1) + (v2 / len(b)) ** 2 / (len(b) - 1)
    )
    out = queries_map()["q_welch_ttest"](spark, SF_SMOKE).collect()[0]
    assert out.n1 == len(a) and out.n2 == len(b)
    assert abs(out.mean_diff - (m1 - m2)) < 1e-9
    assert abs(out.t_stat - t) < 1e-9
    assert abs(out.df - df) < 1e-6


def test_poisson_bootstrap_properties(spark):
    """The CI must bracket the point estimate, the weights must be
    deterministic (two runs identical), and replicate means must
    scatter AROUND the sample mean (non-degenerate CI)."""
    q = queries_map()["q_poisson_bootstrap"]
    r1 = q(spark, SF_SMOKE).collect()[0]
    r2 = q(spark, SF_SMOKE).collect()[0]
    assert r1 == r2
    assert r1.ci_lo <= r1.est_mean <= r1.ci_hi
    assert r1.ci_lo < r1.ci_hi
    # CI width should be on the order of sigma/sqrt(n), not zero/huge:
    # bounded above by the full value range
    assert (r1.ci_hi - r1.ci_lo) < r1.est_mean


def test_gini_concentration_known_distributions(spark):
    """Uniform counts → G = 0 exactly; a maximally-skewed two-point
    distribution approaches the textbook value computed directly."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.stats import (
        gini_concentration,
    )

    uniform = spark.createDataFrame([(f"t{i}", 7) for i in range(100)], ["k", "c"])
    g0 = gini_concentration(uniform, c="c").collect()[0]
    assert g0.n_items == 100 and g0.total_count == 700
    assert abs(g0.gini) < 1e-12
    skewed = spark.createDataFrame(
        [(f"t{i}", 1) for i in range(99)] + [("hot", 9901)], ["k", "c"]
    )
    g1 = gini_concentration(skewed, c="c").collect()[0]
    counts = sorted([1] * 99 + [9901])
    n, tot = len(counts), sum(counts)
    s = sum((i + 1) * c for i, c in enumerate(counts))
    expected = 2 * s / (n * tot) - (n + 1) / n
    assert abs(g1.gini - expected) < 1e-12


def test_jsd_bounds_and_bruteforce(spark):
    """JSD must sit in [0, ln 2] and equal the direct two-distribution
    computation (including the zero-overlap closed form) per source."""
    import math
    from collections import Counter

    rows = load_table(spark, SF_SMOKE, "documents").select("source", "text").collect()
    corpus = Counter()
    per_src: dict = {}
    for r in rows:
        toks = r.text.split()
        corpus.update(toks)
        per_src.setdefault(r.source, Counter()).update(toks)
    n_tot = sum(corpus.values())
    out = {r.source: r for r in queries_map()["q_jsd_sources"](spark, SF_SMOKE).collect()}
    for src, cnt in per_src.items():
        n_s = sum(cnt.values())
        jsd = 0.0
        for t in corpus:
            p = cnt.get(t, 0) / n_s
            q = corpus[t] / n_tot
            m = (p + q) / 2
            if p > 0:
                jsd += 0.5 * p * math.log(p / m)
            if q > 0:
                jsd += 0.5 * q * math.log(q / m)
        assert 0 <= out[src].jsd_vs_corpus <= math.log(2) + 1e-9
        assert abs(out[src].jsd_vs_corpus - jsd) < 5e-4, src
        assert out[src].n_tokens == n_s


def test_bucketed_cumsum_matches_python(spark):
    """Exact global cumulatives from the bucket machinery must equal a
    plain Python running sum over the sorted values, including under
    constant values (single-bucket degenerate case)."""
    import random

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.stats import (
        bucketed_cumsum,
    )

    rng = random.Random(7)
    data = [(rng.randint(-50, 50), rng.randint(1, 9)) for _ in range(300)]
    # collapse to distinct values as the contract requires
    agg: dict = {}
    for v, c in data:
        agg[v] = agg.get(v, 0) + c
    df = spark.createDataFrame(sorted(agg.items()), ["v", "c"])
    got = {
        r.v: r.cum_c for r in bucketed_cumsum(df, "v", ["c"], buckets=16).collect()
    }
    run = 0
    for v in sorted(agg):
        run += agg[v]
        assert got[v] == run, v
    const = spark.createDataFrame([(5, i + 1) for i in range(4)], ["v", "c"])
    # constant value column → span 0 → everything lands in bucket 0;
    # rows are NOT distinct by v here, so local window order within the
    # tie is unspecified — only the TOTAL at the last row is defined
    tot = sorted(
        r.cum_c for r in bucketed_cumsum(const, "v", ["c"], buckets=16).collect()
    )[-1]
    assert tot == 10


def test_calibration_bins_bruteforce(spark):
    """Bin assignment, rates, and lift must match a direct Python
    computation; user mass must be conserved across bins."""
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("v"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("np"),
        )
        .collect()
    )
    nu, s = len(rows), sum(r.np for r in rows)
    vmin, vmax = min(r.v for r in rows), max(r.v for r in rows)
    bins: dict = {}
    for r in rows:
        b = min(7, int((r.v - vmin) * 8.0 / (vmax - vmin))) if vmax > vmin else 0
        n, sv, c1 = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, sv + r.v, c1 + (1 if r.np * nu > s else 0))
    p1 = sum(c for _, _, c in bins.values())
    out = {r.bin: r for r in queries_map()["q_calibration_bins"](spark, SF_SMOKE).collect()}
    assert set(out) == set(bins)
    assert sum(r.n_users for r in out.values()) == nu
    for b, (n, sv, c1) in bins.items():
        assert out[b].n_users == n
        assert abs(out[b].avg_score - sv / n) < 1e-12
        assert abs(out[b].pos_rate - c1 / n) < 1e-12
        assert abs(out[b].lift - (c1 * nu) / (n * p1)) < 1e-12


def test_funnel_time_bruteforce(spark):
    """Counts and the median delay must match a direct per-purchase
    scan for the latest prior view."""
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "event_type", "ts").collect()
    views: dict = {}
    for r in ev:
        if r.event_type == "view":
            views.setdefault(r.user_id, []).append(r.ts)
    delays = []
    n_purch = 0
    for r in ev:
        if r.event_type != "purchase":
            continue
        n_purch += 1
        prior = [t for t in views.get(r.user_id, []) if t <= r.ts]
        if prior:
            delays.append((r.ts - max(prior)).total_seconds())
    out = queries_map()["q_funnel_time"](spark, SF_SMOKE).collect()[0]
    assert out.n_purchases == n_purch
    assert out.n_with_prior_view == len(delays)
    delays.sort()
    # exact linear-interpolation percentile, same definition both engines
    def pct(p):
        k = (len(delays) - 1) * p
        f, c = int(k), min(int(k) + 1, len(delays) - 1)
        return delays[f] + (k - f) * (delays[c] - delays[f])

    assert abs(out.p50_sec - pct(0.50)) < 1e-6
    assert abs(out.p99_sec - pct(0.99)) < 1e-6


def test_survival_km_bruteforce(spark):
    """The KM curve must match the textbook product-limit computation
    over per-user (time-to-first-purchase, converted) spans, including
    the absorbing zero if the last at-risk cohort all converts."""
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "event_type", "ts").collect()
    first: dict = {}
    firstp: dict = {}
    maxd = max(r.ts for r in ev).date()
    for r in ev:
        d = r.ts.date()
        first[r.user_id] = min(first.get(r.user_id, d), d)
        if r.event_type == "purchase":
            firstp[r.user_id] = min(firstp.get(r.user_id, d), d)
    spans = [
        (
            (firstp[u] - fd).days if u in firstp else (maxd - fd).days,
            1 if u in firstp else 0,
        )
        for u, fd in first.items()
    ]
    from collections import Counter

    deaths = Counter(t for t, e in spans if e == 1)
    out = {r.t_days: r for r in queries_map()["q_survival_km"](spark, SF_SMOKE).collect()}
    assert set(out) == set(deaths)
    s = 1.0
    for t in sorted({t for t, _ in spans}):
        n_at = sum(1 for tt, _ in spans if tt >= t)
        d = deaths.get(t, 0)
        if d:
            s *= (n_at - d) / n_at
            assert out[t].n_at_risk == n_at and out[t].n_events == d
            assert abs(out[t].survival - round(s, 4)) < 1e-9, t
    # survival is monotone non-increasing and within [0, 1]
    vals = [out[t].survival for t in sorted(out)]
    assert all(1 >= a >= b >= 0 for a, b in zip(vals, vals[1:]))


def test_holt_matches_python_fold(spark):
    """Level/trend/forecast must equal the sequential Python fold to
    the last bit (raw-double parity contract, as q_ewma)."""
    daily = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, float(r["count"])))
    out = {r.event_type: r for r in queries_map()["q_holt_smoothing"](spark, SF_SMOKE).collect()}
    for et, pts in series.items():
        pts.sort()
        xs = [x for _, x in pts]
        l, b = xs[0], xs[1] - xs[0]
        # fold consumes from the 2nd element: the first step runs the
        # i=2 update against the seed, landing exactly on l2 = v2
        for v in xs[1:]:
            nl = 0.5 * v + 0.5 * (l + b)
            b = 0.3 * (nl - l) + 0.7 * b
            l = nl
        assert out[et].level == l, et
        assert out[et].trend == b, et
        assert out[et].forecast == l + b, et
        assert out[et].n_events == len(xs)


def test_ordinal_association_matches_bruteforce(spark):
    """γ, Somers' D (both directions), and Stuart's τ-c must match an
    O(n²) pair enumeration over the collected per-user (volume,
    active-days) points — proving the cell-grid half-plane masses
    count every unordered pair exactly once."""
    u = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.countDistinct(F.col("ts").cast("date")).alias("y"),
        )
        .collect()
    )
    pts = [(r["x"], r["y"]) for r in u]
    n = len(pts)
    C = D = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                C += 1
            elif dx * dy < 0:
                D += 1
    n0 = n * (n - 1) // 2
    rx = len({p[0] for p in pts})
    ry = len({p[1] for p in pts})
    m = min(rx, ry)
    out = queries_map()["q_ordinal_association"](spark, SF_SMOKE).collect()[0]
    assert out.n_users == n
    assert out.concordant == C and out.discordant == D
    assert abs(out.gamma - round((C - D) / (C + D), 4)) < 1e-12
    # n1/n2 count pairs tied on x / on y (including both-tied)
    n1 = sum(
        t * (t - 1) // 2
        for t in __import__("collections").Counter(p[0] for p in pts).values()
    )
    n2 = sum(
        t * (t - 1) // 2
        for t in __import__("collections").Counter(p[1] for p in pts).values()
    )
    assert abs(out.somers_d_yx - round((C - D) / (n0 - n1), 4)) < 1e-12
    assert abs(out.somers_d_xy - round((C - D) / (n0 - n2), 4)) < 1e-12
    assert abs(out.tau_c - round(2.0 * m * (C - D) / (n * n * (m - 1)), 4)) < 1e-12


def test_paired_ttest_matches_bruteforce(spark):
    """t statistic and mean difference must match the textbook paired
    formula over per-user (view − purchase) count differences."""
    import math

    u = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("v"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "p"
            ),
        )
        .collect()
    )
    d = [r["v"] - r["p"] for r in u]
    n = len(d)
    mean = sum(d) / n
    s2 = sum((x - mean) ** 2 for x in d) / (n - 1)
    t = mean / math.sqrt(s2 / n)
    out = queries_map()["q_paired_ttest"](spark, SF_SMOKE).collect()[0]
    assert out.n_users == n
    assert abs(out.mean_diff - round(mean, 6)) < 1e-12
    assert abs(out.t_stat - t) < 1e-3  # query rounds to 4
    assert out.reject_95 == (abs(t) > 1.96)


def test_dickey_fuller_matches_bruteforce(spark):
    """β̂ and the DF t statistic must match the closed-form OLS of
    Δy on y_lag computed in Python over the same consecutive-day
    pairs (absent days break pairs on both paths identically)."""
    import math

    daily = sorted(
        (r["day"], r["x"])
        for r in load_table(spark, SF_SMOKE, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    by_day = dict(daily)
    import datetime

    pairs = [
        (x, by_day[day + datetime.timedelta(days=1)] - x)
        for day, x in daily
        if day + datetime.timedelta(days=1) in by_day
    ]
    m = len(pairs)
    xs, ys = [p[0] for p in pairs], [p[1] for p in pairs]
    mx, my = sum(xs) / m, sum(ys) / m
    sxx_c = sum((x - mx) ** 2 for x in xs)
    sxy_c = sum((x - mx) * (y - my) for x, y in pairs)
    syy_c = sum((y - my) ** 2 for y in ys)
    beta = sxy_c / sxx_c
    sse = syy_c - beta * beta * sxx_c
    t = beta / math.sqrt((sse / (m - 2)) / sxx_c)
    out = queries_map()["q_dickey_fuller"](spark, SF_SMOKE).collect()[0]
    assert out.n_pairs == m
    assert abs(out.beta - beta) < 1e-5
    assert abs(out.df_t - t) < 1e-3
    assert out.unit_root_rejected_95 == (t < -2.86)


def test_pettitt_matches_bruteforce(spark):
    """Per event type, K = max|U_t| and the changepoint day must
    match a direct midrank computation over the collected daily
    series; the tail-bound p must follow the closed form."""
    import math

    rows = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    series = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append((r["day"], r["x"]))
    out = {
        r["event_type"]: r
        for r in queries_map()["q_pettitt_test"](spark, SF_SMOKE).collect()
    }
    assert set(out) == set(series)
    for et, pts in series.items():
        pts.sort()
        vals = [x for _, x in pts]
        n = len(vals)
        # midranks (1-based, ties averaged)
        ranks = []
        for v in vals:
            smaller = sum(1 for w in vals if w < v)
            ties = sum(1 for w in vals if w == v)
            ranks.append(smaller + (ties + 1) / 2)
        best = None
        for t in range(1, n):  # t = 1..n-1
            u = 2 * sum(ranks[:t]) - t * (n + 1)
            key = (abs(u), pts[t - 1][0])
            if best is None or abs(u) > best[0]:
                best = (abs(u), pts[t - 1][0])
        k, day = best
        p = 2 * math.exp(-6.0 * k * k / (n**3 + n**2))
        o = out[et]
        assert o.n_days == n, et
        assert o.k_stat == int(k), et
        assert o.change_day == day, et
        assert abs(o.p_approx - round(p, 6)) < 1e-12, et
        assert o.signif_95 == (p < 0.05), et


def test_fleiss_kappa_matches_bruteforce(spark):
    """κ must match the textbook Fleiss computation over the three
    staggered length-band raters replayed in Python; perfect
    agreement on a single-band corpus must give κ = 1 edge handled
    (not hit by the fixture — asserted on a constructed frame)."""
    docs = [
        r["n_chars"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("n_chars").isNotNull())
        .collect()
    ]
    cuts = [(200, 400), (220, 380), (180, 420)]

    def rate(nc, lo, hi):
        return "short" if nc < lo else ("long" if nc > hi else "medium")

    from collections import Counter

    N = len(docs)
    s1 = 0
    cat_tot = Counter()
    for nc in docs:
        cnt = Counter(rate(nc, lo, hi) for lo, hi in cuts)
        s1 += sum(v * v for v in cnt.values())
        cat_tot.update(cnt)
    p_bar = (s1 - 3 * N) / (6.0 * N)
    p_e = sum(v * v for v in cat_tot.values()) / (9.0 * N * N)
    kappa = (p_bar - p_e) / (1 - p_e)
    out = queries_map()["q_fleiss_kappa"](spark, SF_SMOKE).collect()[0]
    assert out.n_docs == N
    assert abs(out.p_bar - round(p_bar, 6)) < 1e-12
    assert abs(out.p_e - round(p_e, 6)) < 1e-12
    assert abs(out.kappa - kappa) < 1e-3
    # committee sanity: substantial but imperfect agreement
    assert 0.2 < out.kappa < 1.0


def test_runs_test_matches_bruteforce(spark):
    """Runs count, side counts, and z must match a direct Python
    replay of the above-mean dichotomization per event type."""
    import math

    rows = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    series = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append((r["day"], r["x"]))
    out = {
        r["event_type"]: r
        for r in queries_map()["q_runs_test"](spark, SF_SMOKE).collect()
    }
    for et, pts in series.items():
        pts.sort()
        nd, sx = len(pts), sum(x for _, x in pts)
        signs = [1 if nd * x > sx else 0 for _, x in pts if nd * x != sx]
        if not signs:
            assert et not in out
            continue
        n1, n = sum(signs), len(signs)
        n2 = n - n1
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        if n1 == 0 or n2 == 0 or 2.0 * n1 * n2 <= n:
            assert et not in out, et
            continue
        mu = 2.0 * n1 * n2 / n + 1
        sig = math.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1)))
        z = (runs - mu) / sig
        o = out[et]
        assert (o.n_above, o.n_below, o.n_runs) == (n1, n2, runs), et
        assert abs(o.z - z) < 1e-3, et
        assert o.nonrandom_95 == (abs(z) > 1.96), et
