"""Property-based tests (hypothesis): engine invariants on GENERATED
inputs, not just the fixed fixtures. Each property batches all
generated cases into one Spark job — hypothesis drives the data, Spark
runs once per example set."""

from __future__ import annotations

import hashlib

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_streams_spring_cloud_stream_tp1_spark.operators.core import salted_agg
from kafka_streams_spring_cloud_stream_tp1_spark.operators.hashing import xhash
from kafka_streams_spring_cloud_stream_tp1_spark.operators.text import tokens, word_ngrams

_SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

words_st = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=6), min_size=0, max_size=30
)


@given(docs=st.lists(words_st, min_size=1, max_size=8))
@_SETTINGS
def test_word_ngrams_match_python_reference(spark, docs):
    """Spark word_ngrams ≡ the obvious Python n-gram construction, for
    arbitrary token lists (incl. docs shorter than n → empty)."""
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: sorted(r["g"])
        for r in df.select("doc_id", word_ngrams(tokens("text"), 3).alias("g")).collect()
    }
    for i, ws in enumerate(docs):
        # tokens() trims+splits: empty text → ['']
        toks = " ".join(ws).strip().split() or [""]
        expect = sorted({" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)})
        assert got[i] == expect, (ws, got[i], expect)


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50)),
        min_size=1,
        max_size=200,
    )
)
@_SETTINGS
def test_salted_distinct_equals_exact(spark, rows):
    """The salted two-stage distinct count must equal plain
    countDistinct for any (key, value) multiset — salting is a
    physical rewrite, never a semantic one."""
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    salted = {
        r["event_type"]: r["n_distinct"]
        for r in salted_agg(df, "event_type", "user_id", n_salts=4).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in df.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert salted == exact


@given(strings=st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=50))
@_SETTINGS
def test_xhash_matches_python_md5(spark, strings):
    """The cross-engine hash (Spark conv/substring/md5 pipeline) must
    equal Python's int(md5(s)[:15], 16) for arbitrary unicode — the
    exact contract the DuckDB oracles rely on."""
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", xhash(F.col("s")).alias("h")).collect()}
    for s in set(strings):
        expect = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
        assert got[s] == expect, (s, got[s], expect)


@given(docs=st.lists(words_st, min_size=1, max_size=6))
@_SETTINGS
def test_winnowing_matches_python_reference(spark, docs):
    """winnow_fingerprints ≡ the direct Python winnowing construction
    (hash all positional k-grams, min per w-window, distinct+sort) for
    arbitrary token lists, including docs with < w windows and docs
    too short for any shingle."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.text import (
        winnow_fingerprints,
    )

    k, w = 3, 4
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (list(r["fp_winnow"]), r["n_grams"])
        for r in winnow_fingerprints(df, k=k, w=w).collect()
    }

    def xh(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    for i, ws in enumerate(docs):
        toks = " ".join(ws).strip().split() or [""]
        grams = [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
        h = [xh(g) for g in grams]
        if not h:
            expect = ([], 0)
        elif len(h) < w:
            expect = ([min(h)], len(h))
        else:
            expect = (
                sorted({min(h[j : j + w]) for j in range(len(h) - w + 1)}),
                len(h),
            )
        assert got[i] == expect, (ws, got[i], expect)


@given(
    rows=st.lists(
        st.sampled_from(["x", "y", "z", "p", "q"]), min_size=1, max_size=300
    )
)
@_SETTINGS
def test_misra_gries_bounds_hold_on_generated_streams(spark, rows):
    """MG guarantees on arbitrary item streams: reported counts are
    lower bounds within n/(k+1), and every item with true frequency
    > n/(k+1) is reported."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.sketches import (
        heavy_hitters,
    )

    k = 3
    df = spark.createDataFrame([(v,) for v in rows], "item string").repartition(4)
    got = {
        r["item"]: r["lower_bound"]
        for r in heavy_hitters(df, "item", k=k, top=10).collect()
    }
    exact: dict = {}
    for v in rows:
        exact[v] = exact.get(v, 0) + 1
    err = len(rows) / (k + 1)
    for item, c in exact.items():
        if c > err:
            assert item in got, (item, c, err, got)
    for item, lb in got.items():
        assert lb <= exact[item] and lb >= exact[item] - err, (item, lb, exact[item])


@given(docs=st.lists(words_st, min_size=1, max_size=6))
@_SETTINGS
def test_bpe_pair_counts_match_python_reference(spark, docs):
    """bpe_pair_counts ≡ the direct Python construction (word
    frequencies, then per-word adjacent char pairs weighted by word
    frequency; words shorter than 2 chars contribute nothing) for
    arbitrary generated corpora."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.vocab import (
        bpe_pair_counts,
    )

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["pair"]: (r["n_occurrences"], r["n_words"])
        for r in bpe_pair_counts(df, k=1000).collect()
    }
    wf: dict = {}
    for ws in docs:
        for w in (" ".join(ws).strip().split() or [""]):
            wf[w] = wf.get(w, 0) + 1
    occ: dict = {}
    words_with: dict = {}
    for w, f in wf.items():
        if len(w) < 2:
            continue
        for i in range(len(w) - 1):
            p = w[i : i + 2]
            occ[p] = occ.get(p, 0) + f
        for p in {w[i : i + 2] for i in range(len(w) - 1)}:
            words_with[p] = words_with.get(p, 0) + 1
    expect = {p: (occ[p], words_with[p]) for p in occ}
    assert got == expect, (docs, got, expect)


@given(
    seqs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # key
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=40,
    ),
    seg_len=st.integers(min_value=1, max_value=7),
    alpha=st.sampled_from([0.25, 0.5, 0.9]),
)
@_SETTINGS
def test_ewma_segmented_equals_exact_fold(spark, seqs, seg_len, alpha):
    """Property: for ANY key/value stream, segment length, and alpha,
    the bounded-state segment-and-carry fold equals the exact
    sequential fold (affine composition is exact math; floats agree to
    association error) and equals a driver-side python reference."""
    import datetime as dt

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.timeseries import (
        ewma_last,
    )

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), k, float(v))
        for i, (k, v) in enumerate(seqs)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    exact = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in ewma_last(df, "user_id", ["ts", "event_id"], "value", alpha=alpha).collect()
    }
    seg = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in ewma_last(
            df, "user_id", ["ts", "event_id"], "value", alpha=alpha, segment_len=seg_len
        ).collect()
    }
    ref = {}
    for i, (k, v) in enumerate(seqs):
        n, e = ref.get(k, (0, None))
        ref[k] = (n + 1, float(v) if e is None else e * (1 - alpha) + float(v) * alpha)
    assert exact.keys() == seg.keys() == ref.keys()
    for k in ref:
        assert exact[k][0] == seg[k][0] == ref[k][0]
        assert exact[k][1] == pytest.approx(ref[k][1], abs=1e-9)
        assert seg[k][1] == pytest.approx(exact[k][1], abs=1e-9)


@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-100, 1100, allow_nan=False)),
        min_size=1,
        max_size=30,
    )
)
@_SETTINGS
def test_band_lookup_matches_python_reference(spark, vals):
    """band_lookup ≡ first-matching-interval semantics for arbitrary
    values incl. NULLs and out-of-band — NULLs/misses drop (inner-join
    contract), hits carry their half-open interval."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.bands import (
        band_lookup,
    )

    buckets = [(0.0, 250.0), (250.0, 500.0), (500.0, 1000.0)]
    df = spark.createDataFrame(list(enumerate(vals)), "id long, v double")
    got = {r["id"]: r["bucket_lo"] for r in band_lookup(df, "v", buckets).collect()}
    for i, v in enumerate(vals):
        expect = next(
            (lo for lo, hi in buckets if v is not None and lo <= v < hi), None
        )
        if expect is None:
            assert i not in got, (i, v, got.get(i))
        else:
            assert got[i] == expect, (i, v, got[i], expect)


@given(
    texts=st.lists(
        st.text(alphabet="abcdef gh é日", min_size=0, max_size=200),
        min_size=1,
        max_size=6,
    )
)
@_SETTINGS
def test_cdc_chunk_count_matches_python_reference(spark, texts):
    """cdc_chunk_stats' chunk count ≡ the pure-Python rolling-hash
    boundary construction for arbitrary (incl. multi-byte) strings —
    pins the char-based substr/hash parity end to end."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.text import (
        cdc_chunk_stats,
    )

    def ref_n_chunks(t: str, g: int = 8, d: int = 64) -> int:
        length = len(t)
        bounds = [
            p
            for p in range(g, length + 1)
            if int(hashlib.md5(t[p - g : p].encode()).hexdigest()[:15], 16) % d == 0
        ]
        cuts = sorted({0, *bounds, length})
        return len(cuts) - 1

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_chunks"] for r in cdc_chunk_stats(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == ref_n_chunks(t), (i, repr(t), got[i], ref_n_chunks(t))


@given(
    docs=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40),
        min_size=1,
        max_size=6,
    ),
    gram=st.integers(3, 6),
)
@_SETTINGS
def test_exact_substring_spans_match_python_reference(spark, docs, gram):
    """exact_substring_spans ≡ a brute-force reference on arbitrary
    small corpora: mark every position whose length-g window occurs
    ≥2 times anywhere (incl. within the same doc), merge overlapping/
    adjacent equal-length intervals, compare the exact span sets.
    (Tiny alphabet forces plenty of repeats and collisions of the
    interesting kind — within-doc, cross-doc, full-doc runs.)"""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.dedup import (
        exact_substring_spans,
    )

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in exact_substring_spans(df, gram_len=gram).collect()
    }

    from collections import Counter

    wins = Counter()
    for t in docs:
        for p in range(len(t) - gram + 1):
            wins[t[p : p + gram]] += 1
    expect = set()
    for i, t in enumerate(docs):
        marked = [
            p for p in range(len(t) - gram + 1) if wins[t[p : p + gram]] >= 2
        ]
        spans, cur = [], None
        for p in marked:
            if cur is not None and p - cur[1] <= gram:
                cur = (cur[0], p)
            else:
                if cur is not None:
                    spans.append(cur)
                cur = (p, p)
        if cur is not None:
            spans.append(cur)
        for a, b in spans:
            # operator positions are 1-indexed inclusive
            expect.add((i, a + 1, b + gram, b + gram - a))
    assert got == expect, (docs, gram, got ^ expect)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 40)),
        min_size=0,
        max_size=60,
        unique=True,
    ),
    max_df=st.integers(2, 8),
)
@_SETTINGS
def test_bounded_buckets_equal_naive_collect_filter(spark, rows, max_df):
    """`bounded_id_buckets` must equal the naive collect-then-filter
    form on any (key, id) relation — the hot-bucket fix changes the
    PLAN (count-first eligibility), never the result."""
    from pyspark.sql import functions as F

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.buckets import (
        bounded_id_buckets,
        intra_bucket_pairs,
    )

    df = spark.createDataFrame(
        [(f"k{k}", i) for k, i in rows] or [("never", -1)],
        "v string, doc_id long",
    )
    if not rows:
        df = df.filter("doc_id >= 0")
    got = {
        r["v"]: list(r["ds"])
        for r in bounded_id_buckets(df, ["v"], min_df=2, max_df=max_df).collect()
    }
    want = {
        r["v"]: list(r["ds"])
        for r in df.groupBy("v")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= max_df))
        .collect()
    }
    assert got == want
    # pair emission: exactly C(b,2) ordered pairs per bucket
    n_pairs = intra_bucket_pairs(
        bounded_id_buckets(df, ["v"], min_df=2, max_df=max_df)
    ).count()
    assert n_pairs == sum(len(ds) * (len(ds) - 1) // 2 for ds in want.values())


def test_xxhash64_production_lane(spark, monkeypatch):
    """SPARK_GRAFT_HASH=xxhash64 must swap the shingle hash to native
    xxhash64 (visible in the plan), keep the 60-bit non-negative
    contract, and still find a planted near-dup through the full
    MinHash->LSH->verify pipeline — the lane trades oracle parity
    only, not dedup semantics."""
    import pyspark.sql.functions as F

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.dedup import (
        minhash_lsh_dedup,
        minhash_signatures,
    )

    monkeypatch.setenv("SPARK_GRAFT_HASH", "xxhash64")
    base = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, base), (2, base + " tail"), (3, "совершенно unrelated text entirely")],
        ["doc_id", "text"],
    )
    sig = minhash_signatures(docs)
    assert "xxhash64" in sig._jdf.queryExecution().executedPlan().toString()
    rows = sig.collect()
    assert rows and all(
        0 <= r[c] < (1 << 60) for r in rows for c in sig.columns if c != "doc_id"
    )
    pairs = minhash_lsh_dedup(docs, threshold=0.8).collect()
    assert any(p["doc_a"] == 1 and p["doc_b"] == 2 for p in pairs), pairs


# ---- sketch merge properties (VERDICT r09 #7c): the distributed
# correctness of the sketches IS the mergeable-summaries algebra —
# per-partition summaries merged must behave like a summary of the
# union, for ANY partitioning of the stream.


@given(
    items=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=120),
    cuts=st.lists(st.integers(min_value=0, max_value=120), max_size=3),
    k=st.integers(min_value=1, max_value=8),
)
@_SETTINGS
def test_kmv_merge_equals_sketch_of_union(items, cuts, k):
    """min-k of a union == min-k of per-part min-k's, for every split
    of the stream — the exact identity `kmv_mins` relies on when it
    folds partitions first and merges ≤ partitions·k rows after."""
    import numpy as np

    hashes = np.array(
        [int(hashlib.md5(f"kmv|{i}".encode()).hexdigest()[:15], 16) for i in items],
        dtype=np.int64,
    )
    bounds = sorted({min(c, len(items)) for c in cuts})
    parts = np.split(hashes, bounds) if bounds else [hashes]
    per_part = [np.unique(p)[:k] for p in parts if len(p)]
    merged = np.unique(np.concatenate(per_part))[:k] if per_part else np.array([])
    direct = np.unique(hashes)[:k]
    assert merged.tolist() == direct.tolist()


@given(
    stream=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=200),
    cuts=st.lists(st.integers(min_value=0, max_value=200), max_size=3),
    k=st.integers(min_value=2, max_value=10),
)
@_SETTINGS
def test_mg_merge_preserves_heavy_hitter_guarantees(stream, cuts, k):
    """Misra-Gries per-part summaries merged by item-wise SUM (what
    `heavy_hitters` / the streaming shards do) must keep both sides of
    the sketch contract for ANY split: (a) every merged lower bound
    ≤ the true count (never over-claims), with slack ≤ n/(k+1) summed
    over parts; (b) every item with true frequency > n/(k+1) survives
    the merge (the containment guarantee)."""
    from collections import Counter

    import pandas as pd

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.sketches import (
        _mg_fold,
    )

    bounds = sorted({min(c, len(stream)) for c in cuts})
    parts, prev = [], 0
    for b in bounds + [len(stream)]:
        if b > prev:
            parts.append(stream[prev:b])
            prev = b
    summaries = []
    for p in parts:
        s = _mg_fold({}, pd.Series(p).value_counts(), k)
        assert len(s) <= k, "per-part summary exceeded k counters"
        summaries.append(s)
    merged: Counter = Counter()
    for s in summaries:
        merged.update(s)
    true = Counter(stream)
    n = len(stream)
    slack = sum(len(p) / (k + 1) for p in parts)
    for item, lb in merged.items():
        assert lb <= true[item], f"over-claimed {item}: {lb} > {true[item]}"
        assert true[item] - lb <= slack + 1e-9
    for item, c in true.items():
        if c > n / (k + 1):
            assert item in merged, (
                f"guaranteed heavy hitter {item} (count {c} > n/(k+1) = "
                f"{n / (k + 1):.1f}) lost in merge"
            )


def test_kmv_mins_partitioning_invariant(spark):
    """Implementation-level pin: `kmv_mins` must return the SAME
    sketch whatever the physical partitioning, and it must equal the
    exact k smallest distinct hashes (ground truth computed by the
    same xhash expression without the sketch path)."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.sketches import (
        kmv_mins,
    )

    df = spark.range(0, 500).select(
        (F.col("id") % 137).cast("string").alias("item")
    )
    sketches = []
    for parts in (1, 7):
        got = kmv_mins(df.repartition(parts), "item", k=16).collect()
        assert len(got) == 1
        sketches.append(list(got[0]["mins"]))
    assert sketches[0] == sketches[1], "sketch depends on partitioning"
    truth = [
        r["h"]
        for r in df.select(
            xhash(F.concat(F.lit("kmv|"), F.col("item"))).alias("h")
        )
        .distinct()
        .orderBy("h")
        .limit(16)
        .collect()
    ]
    assert sketches[0] == truth
