"""Vocabulary/TF-IDF aggregates, per-group sampling, label centroids,
and training-sequence packing: invariants the row-hash oracle doesn't
state explicitly (recounts vs a driver-side reference, determinism,
budget arithmetic, plan shape)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from kafka_streams_spring_cloud_stream_tp1_spark.operators.sampling import group_sample
from kafka_streams_spring_cloud_stream_tp1_spark.operators.similarity import label_centroids
from kafka_streams_spring_cloud_stream_tp1_spark.operators.vocab import tfidf_topk, vocab_topk
from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_vocab_topk_matches_python_recount(spark, docs):
    """Spark's explode+agg must equal a driver-side token recount."""
    rows = {r["token"]: (r["tf"], r["df"]) for r in vocab_topk(docs, k=1000).collect()}
    tf, df = Counter(), Counter()
    for r in docs.select("doc_id", "text").collect():
        toks = r["text"].strip().split()
        tf.update(toks)
        df.update(set(toks))
    assert rows == {t: (tf[t], df[t]) for t in tf}


def test_vocab_topk_cut_is_deterministic(spark, docs):
    """The k-th slot tie must break on the token string: two runs (and
    any partitioning) produce the same set, not just the same counts."""
    k = 5
    a = [tuple(r) for r in vocab_topk(docs, k=k).collect()]
    b = [tuple(r) for r in vocab_topk(docs.repartition(7), k=k).collect()]
    assert a == b and len(a) == k


def test_vocab_topk_plan_has_no_global_sort(spark, docs):
    """Top-k must plan as TakeOrderedAndProject, never a full Sort of
    the vocabulary after the aggregate."""
    plan = vocab_topk(docs, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_tfidf_ranks_and_monotonicity(spark, docs):
    out = tfidf_topk(docs, k=3).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n_docs = docs.count()
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        for r in rows:
            # df tokens appearing in every document score exactly 0
            assert r["df"] <= n_docs
            if r["df"] == n_docs:
                assert r["score"] == 0.0


def test_group_sample_size_and_determinism(spark, docs):
    k = 7
    out = group_sample(docs, k=k, group_col="source").collect()
    per_group = Counter(r["source"] for r in out)
    sizes = {r["source"]: c for r in docs.groupBy("source").count().collect() for c in [r["count"]]}
    for g, n in per_group.items():
        assert n == min(k, sizes[g])
    again = group_sample(docs, k=k, group_col="source").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_group_sample_stable_under_growth(spark, docs):
    """A sampled doc keeps its membership when other groups grow —
    the hash order is per-row, not partition-dependent."""
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_sample = {
        (r["source"], r["doc_id"]): r["rk"]
        for r in group_sample(docs, k=3, group_col="source").collect()
    }
    half_sample = {
        (r["source"], r["doc_id"]): r["rk"]
        for r in group_sample(half, k=3, group_col="source").collect()
    }
    # every doc sampled from the full corpus that survives the filter
    # must still be sampled from the half corpus (its hash rank can
    # only improve when competitors are removed)
    for (src, doc_id), rk in full_sample.items():
        if doc_id % 2 == 0:
            assert half_sample[(src, doc_id)] <= rk


def test_label_centroids_shape_and_mean(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    out = label_centroids(emb).collect()
    assert sum(r["n_vectors"] for r in out) == emb.count()
    for r in out:
        assert len(r["centroid"]) == dim
    # spot-check one component against a driver-side mean
    target = out[0]["label"]
    vecs = [r["embedding"] for r in emb.filter(F.col("label") == target).collect()]
    expect = round(sum(float(v[0]) for v in vecs) / len(vecs), 4)
    got = next(r for r in out if r["label"] == target)["centroid"][0]
    assert abs(got - expect) <= 1e-9


def test_pack_sequences_budget_arithmetic(spark):
    """Every chunk's (seq_idx, seq_offset) must equal the running-token
    prefix sum divided by the budget; offsets stay inside the budget
    and sequence indices are monotone within a document."""
    from kafka_streams_spring_cloud_stream_tp1_spark.plans.llm_queries import (
        _SEQ_BUDGET,
        q_pack_sequences,
    )

    out = q_pack_sequences(spark, SF_SMOKE).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["chunk_idx"])
        run = 0
        prev_seq = 0
        for r in rows:
            assert r["seq_idx"] == run // _SEQ_BUDGET
            assert r["seq_offset"] == run % _SEQ_BUDGET
            assert 0 <= r["seq_offset"] < _SEQ_BUDGET
            assert r["seq_idx"] >= prev_seq
            prev_seq = r["seq_idx"]
            run += r["n_tokens"]
        # the fixture's 64-token chunks exceed the 48-token budget, so
        # any multi-chunk doc must actually roll over into a later seq
        if len(rows) > 1:
            assert rows[-1]["seq_idx"] > 0


def test_bpe_pair_counts_hand_check(spark):
    """On a 3-doc corpus the pair counts must equal the hand count:
    'aba' x2 occurrences of word 'aba' -> pairs ab, ba each x2; 'ab'
    once -> ab once more; 1-char words contribute nothing."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.vocab import (
        bpe_pair_counts,
    )

    docs = spark.createDataFrame(
        [(0, "aba ab x"), (1, "aba"), (2, "x")], "doc_id long, text string"
    )
    rows = {r["pair"]: (r["n_occurrences"], r["n_words"]) for r in bpe_pair_counts(docs, k=10).collect()}
    assert rows == {"ab": (3, 2), "ba": (2, 1)}


def test_bigram_logprob_matches_python_lm(spark, docs):
    """bigram_logprob must equal a driver-side add-α bigram LM built
    from the same corpus: c12/c1 counts, V = distinct unigrams,
    P = (c12+α)/(c1+α·V), per-doc mean −ln P rounded to 4."""
    import math

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.vocab import (
        bigram_logprob,
    )

    alpha = 0.5
    corpus = {
        r["doc_id"]: r["text"].strip().split()
        for r in docs.select("doc_id", "text").collect()
    }
    c12, c1, vocab = Counter(), Counter(), set()
    for toks in corpus.values():
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    want = {}
    for did, toks in corpus.items():
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            continue
        nll = [
            -math.log((c12[bg] + alpha) / (c1[bg[0]] + alpha * len(vocab)))
            for bg in bgs
        ]
        want[did] = (len(bgs), round(sum(nll) / len(nll), 4))
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in bigram_logprob(docs, alpha=alpha).collect()
    }
    assert got == want


def test_source_kl_matches_python(spark, docs):
    """source_token_kl must equal a driver-side recount: per-source
    unigram distributions vs the corpus marginal, KL in nats rounded
    to 4; every KL non-negative."""
    import math

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.vocab import (
        source_token_kl,
    )

    per_src: dict[str, Counter] = {}
    for r in docs.select("source", "text").collect():
        per_src.setdefault(r["source"], Counter()).update(r["text"].strip().split())
    corpus = Counter()
    for c in per_src.values():
        corpus.update(c)
    n_tot = sum(corpus.values())
    want = {}
    for src, c in per_src.items():
        n_s = sum(c.values())
        kl = sum(
            (v / n_s) * math.log((v / n_s) / (corpus[t] / n_tot)) for t, v in c.items()
        )
        want[src] = (n_s, round(kl, 4))
    got = {
        r["source"]: (r["n_tokens"], r["kl_vs_corpus"])
        for r in source_token_kl(docs).collect()
    }
    assert got == want
    assert all(kl >= 0 for _, kl in got.values())


def test_boilerplate_fraction_matches_python(spark, docs):
    """boilerplate_fraction must equal a driver-side recount of
    distinct-trigram document frequencies: frac = |{g in doc :
    df(g) >= min_df}| / |doc shingles|."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.text import (
        boilerplate_fraction,
    )

    from decimal import ROUND_HALF_UP, Decimal

    def r4(x: float) -> float:
        # Spark/DuckDB round() is HALF_UP; python round() is banker's —
        # 9/32 = 0.28125 is an exactly-representable tie that splits them
        return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))

    min_df = 3
    sets = {}
    for r in docs.select("doc_id", "text").collect():
        toks = r["text"].strip().split()
        sets[r["doc_id"]] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    df_counter = Counter()
    for s in sets.values():
        df_counter.update(s)
    want = {
        did: (len(s), r4(sum(df_counter[g] >= min_df for g in s) / len(s)))
        for did, s in sets.items()
        if s
    }
    got = {
        r["doc_id"]: (r["n_shingles"], r["boilerplate_frac"])
        for r in boilerplate_fraction(docs, n=3, min_df=min_df).collect()
    }
    assert got == want


def test_tfidf_cosine_pairs_matches_numpy(spark, docs):
    """tfidf_cosine_pairs must equal a dense numpy recompute of the
    pruned-space tf-idf cosine matrix (df in [2, max_df] terms,
    smoothed idf, unit rows), thresholded on the rounded value."""
    import numpy as np

    from kafka_streams_spring_cloud_stream_tp1_spark.operators.retrieval import (
        tfidf_cosine_pairs,
    )

    threshold, max_df = 0.8, 400
    texts = {
        r["doc_id"]: r["text"].strip().split()
        for r in docs.select("doc_id", "text").collect()
    }
    n_docs = len(texts)
    df_counter = Counter()
    for toks in texts.values():
        df_counter.update(set(toks))
    terms = sorted(t for t, d in df_counter.items() if 2 <= d <= max_df)
    tix = {t: i for i, t in enumerate(terms)}
    ids = sorted(texts)
    mat = np.zeros((n_docs, len(terms)))
    for ri, did in enumerate(ids):
        for t, tf in Counter(texts[did]).items():
            if t in tix:
                mat[ri, tix[t]] = tf * np.log((n_docs + 1) / (df_counter[t] + 1))
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    keep = norms[:, 0] > 0
    unit = np.where(norms > 0, mat / np.where(norms == 0, 1, norms), 0)
    cos = unit @ unit.T
    want = set()
    for i in range(n_docs):
        for j in range(i + 1, n_docs):
            if keep[i] and keep[j] and round(cos[i, j], 4) >= threshold:
                want.add((ids[i], ids[j], round(float(cos[i, j]), 4)))
    got = {
        (r["doc_a"], r["doc_b"], r["cosine"])
        for r in tfidf_cosine_pairs(docs, threshold=threshold, max_df=max_df).collect()
    }
    assert got == want


def test_bpe_train_and_encode_match_python_reference(spark):
    """The distributed mapInPandas encoding must equal a direct
    Python re-encoding with the same merge list, and training must
    merge the most frequent pair first on a hand-checkable corpus."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.vocab import (
        bpe_apply_word,
        bpe_encode,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [
            (1, "low lower lowest low low"),
            (2, "new newer newest new"),
            (3, "low new low new"),
        ],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=8)
    # 'lo' or 'ow' must be the very first merge: 'low' dominates and
    # both its pairs outweigh any pair from 'new'
    assert merges[0] in (("l", "o"), ("o", "w")), merges
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    for doc_id, text in [(1, "low lower lowest low low"),
                         (2, "new newer newest new"),
                         (3, "low new low new")]:
        words = text.split()
        expect = sum(len(bpe_apply_word(w, ranks)) for w in words)
        assert got[doc_id]["n_tokens"] == len(words)
        assert got[doc_id]["n_bpe_tokens"] == expect, (doc_id, got[doc_id], expect)
        assert got[doc_id]["n_bpe_tokens"] <= sum(len(w) for w in words)


def test_bpe_encode_deterministic_across_runs(spark):
    """Same corpus, two independent train+encode runs → identical
    results (lexicographic tie-breaks make training total-order
    deterministic)."""
    from kafka_streams_spring_cloud_stream_tp1_spark.operators.vocab import (
        bpe_encode,
        bpe_train,
    )
    from kafka_streams_spring_cloud_stream_tp1_spark.sources import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    m1, m2 = bpe_train(docs, n_merges=16), bpe_train(docs, n_merges=16)
    assert m1 == m2
    a = sorted(map(tuple, bpe_encode(docs, m1).collect()))
    b = sorted(map(tuple, bpe_encode(docs, m2).collect()))
    assert a == b
