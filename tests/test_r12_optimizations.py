"""Round-12 optimization pins: the result-preserving rewrites must stay
result-preserving.

Each test pins one optimization against the straightforward form it
replaced, on inputs chosen to hit the edge cases the rewrite's proof
relies on — so a future edit that breaks the equivalence (not just the
speed) fails here instead of in a driver round.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_spring_cloud_stream_tp1_spark.operators.dedup import (
    exact_jaccard,
    ngram_jaccard_pairs_capped,
)


def test_exact_jaccard_equals_union_form(spark):
    """|A∩B|/(|A|+|B|−|A∩B|) must equal |A∩B|/|A∪B| for every
    distinct-element pair — including disjoint, identical, subset and
    single-element sets (the inclusion–exclusion identity the r12
    verify rewrite rests on)."""
    rows = [
        (1, ["a", "b", "c"], ["a", "b", "c"]),  # identical
        (2, ["a", "b", "c"], ["x", "y"]),  # disjoint
        (3, ["a", "b", "c", "d"], ["a", "b"]),  # subset
        (4, ["a"], ["a"]),  # singletons equal
        (5, ["a"], ["b"]),  # singletons disjoint
        (6, ["a", "b", "c", "d", "e"], ["c", "d", "e", "f"]),  # overlap
    ]
    df = spark.createDataFrame(rows, "id long, sh_a array<string>, sh_b array<string>")
    out = df.select(
        "id",
        exact_jaccard("sh_a", "sh_b").alias("fast"),
        F.round(
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
            4,
        ).alias("ref"),
    ).collect()
    for r in out:
        assert r["fast"] == r["ref"], (r["id"], r["fast"], r["ref"])


def test_capped_jaccard_length_filter_preserves_results(spark):
    """The r12 length filter inside the capped lane's bucket lambda is a
    PRUNE, not a contract change: the operator's output on a corpus with
    widely varying doc lengths must equal the brute-force df-capped
    result — every pair sharing a df∈[2, max_df] shingle, scored by
    exact full-set Jaccard, kept at rounded J ≥ t. Lengths here are
    chosen so the filter actually fires (short docs embedded in long
    ones share shingles but can never reach J ≥ 0.5)."""
    docs = [
        (0, "w0 w1 w2 w3 w4 w5 w6 w7"),
        (1, "w0 w1 w2 w3 w4 w5 w6 w7"),  # dup of 0
        (2, "w0 w1 w2 w3 w4 w5 w6 w7 x0 x1 x2 x3 x4 x5 x6 x7 x8 x9 y0 y1 y2 y3"),
        (3, "w0 w1 w2"),  # shares the w0-w1-w2 shingle, far too short
        (4, "z0 z1 z2 z3 z4 z5 w0 w1 w2 w3 w4 w5 w6 w7"),
        (5, "q0 q1 q2"),  # isolated
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n, t, max_df = 3, 0.5, 64
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs_capped(df, n=n, threshold=t, max_df=max_df).collect()
    }

    # brute force in python: shingles, df cap discoverability, exact J
    def shingles(text):
        toks = text.split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sh = {d: shingles(txt) for d, txt in docs}
    from collections import Counter

    dfreq = Counter(g for s in sh.values() for g in s)
    want = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = sh[a] & sh[b]
            if not any(2 <= dfreq[g] <= max_df for g in shared):
                continue  # not discoverable under the df cap
            j = round(len(shared) / len(sh[a] | sh[b]), 4)
            if j >= t:
                want[(a, b)] = j
    assert got == want, (got, want)
