"""Corpus-level vocabulary statistics — the token-frequency passes a
training pipeline runs before tokenizer training and corpus weighting:
global term frequencies (vocab building) and per-document TF-IDF
keyterms (quality filtering / topic balancing).

The reference system has no text surface at all (its value type is
PageEvent — reference: src/main/java/.../events/PageEvent.java:5);
these extend the engine for LLM-data workloads per the north star.

Scale shape: both operators are the canonical word-count plan —
explode tokens, hash-aggregate. Spark plans a partial (map-side)
aggregate before the shuffle, so the exchange carries one row per
distinct (key) per task, not one row per token occurrence; a 100 TB
corpus shuffles vocabulary-sized data. The global top-k is a
TakeOrderedAndProject (per-partition heaps + driver merge of k rows),
never a full sort.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import tokens


def vocab_topk(df: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Top-``k`` corpus tokens by total occurrence count, with document
    frequency — the vocabulary-building aggregate.

    One explode + one grouped aggregate: ``count(*)`` gets a map-side
    partial; the distinct-doc count rides the same shuffle (Spark's
    Expand-based distinct aggregate partial-distincts per task first).
    Ties at the k-th slot break on the token string so the cut is
    deterministic across engines and partitionings.
    """
    tok = (
        df.select("doc_id", F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
    )
    return tok.orderBy(F.desc("tf"), F.asc("token")).limit(k)


def tfidf_topk(df: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Top-``k`` TF-IDF keyterms per document: score = tf · ln(N/df).

    Plan shape (two shuffles total, both vocabulary/document sized):
      1. explode → groupBy(doc_id, token) → per-doc term frequencies;
      2. document frequency re-aggregated FROM that frame (a second
         groupBy over already-distinct (doc, token) rows — the token
         explosion is paid once, not twice);
      3. N arrives as a broadcast 1-row cross join (scalar subquery);
      4. per-doc top-k via row_number — WindowGroupLimit pushes the
         rank filter into the sort, heap-per-group, no global sort.
    Ordering ties break on the token string; the score itself is only
    rounded for display AFTER ranking, so the cut is driven by exact
    (tf, df) pairs.
    """
    tf = (
        df.select("doc_id", F.explode(tokens(text_col)).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.asc("token"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(score, 4).alias("score"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= k)
    )


def unigram_logprob(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document mean negative log-probability under the corpus's
    own unigram language model — the classic cheap "perplexity-style"
    quality score (a document of globally-rare tokens scores high /
    surprising; boilerplate scores low). Returns
    (doc_id, n_tokens, avg_nll).

    Two corpus passes: (1) the word-count aggregate builds the unigram
    table p(t) = count(t)/total (vocabulary-sized — broadcast into the
    scoring join; for a web-scale vocabulary that outgrows the
    broadcast threshold Spark falls back to a shuffled hash join on
    the token, which is exactly the right plan); (2) the scoring pass
    re-explodes and averages -ln p(t) per document. Hot (stopword)
    tokens are NOT a skew risk: the scoring join's build side is keyed
    by token, but the probe stream aggregates by doc_id, so the
    token-frequency skew never concentrates on one reducer.
    """
    tok = df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    lm = vocab.crossJoin(F.broadcast(total)).select(
        "token", (F.col("cnt") / F.col("total")).alias("p")
    )
    return (
        tok.join(F.broadcast(lm), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log("p")), 4).alias("avg_nll"),
        )
    )


def bigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", alpha: float = 0.5
) -> DataFrame:
    """Per-document mean negative log-probability under the corpus's
    own add-α bigram LM — the next step up from `unigram_logprob` in
    the CCNet-style perplexity-filtering ladder (a doc whose word
    ORDER is unusual scores high even when its unigrams are common —
    catches shuffled/garbled text that unigram scoring cannot).
    P(w2|w1) = (c(w1 w2) + α) / (c(w1·) + α·V), V = distinct unigram
    vocabulary. Returns (doc_id, n_bigrams, avg_nll); docs with < 2
    tokens (no bigrams) drop out, mirroring the oracle's len ≥ 2.

    Scale shape: the LM build is the word-count plan over bigram keys
    (map-side partials → bigram-vocabulary-sized shuffle); c(w1·) is a
    WINDOW sum over that table — c12 has one row per distinct bigram,
    so sum(c12) over (partition by w1) is exactly the left-context
    count with no second corpus pass. The corpus explode fans out
    first (CPU-heavy zip projection must use every core even off one
    scan split). The finished (bg, c12, c1) table broadcasts while it
    fits, degrading to a shuffled hash join on the bigram key — the
    right plan either way. Like unigram_logprob, the scoring pass
    aggregates by doc_id, so token-frequency skew never lands on one
    reducer.
    """
    from pyspark.sql.window import Window

    from .hashing import fan_out
    from .text import word_ngrams_multiset

    bg = fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams_multiset(tokens(text_col), 2)).alias("bg"),
    )
    lm = (
        bg.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c12"))
        .withColumn(
            "c1",
            F.sum("c12").over(Window.partitionBy(F.split("bg", " ")[0])),
        )
    )
    vsize = df.select(F.explode(tokens(text_col)).alias("token")).agg(
        F.count_distinct("token").alias("vsz")
    )
    nll = -F.log(
        (F.col("c12") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.col("vsz"))
    )
    return (
        bg.join(F.broadcast(lm), "bg")
        .crossJoin(F.broadcast(vsize))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(nll), 4).alias("avg_nll"),
        )
    )


def source_token_kl(
    df: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-source distribution drift: KL(P_source ‖ P_corpus) over the
    unigram token distributions — the mixture-monitoring statistic a
    multi-source training pipeline tracks to spot a crawl slice whose
    language suddenly diverges from the blend (dataset-shift alarms,
    source reweighting). KL = Σ_t p_s(t)·ln(p_s(t)/p_c(t)) ≥ 0, zero
    iff the source matches the corpus blend exactly. Returns
    (source, n_tokens, kl_vs_corpus).

    One corpus pass: the (source, token) count aggregate (map-side
    partials; the only corpus-sized shuffle). Everything downstream —
    corpus marginals, per-source totals, the KL sum — re-aggregates
    that |sources|×|vocab| frame, so a hot stopword's weight never
    concentrates: the KL aggregate is keyed by source with
    vocab-sized input, not token-sized."""
    tok = df.select(
        F.col(source_col).alias("source"), F.explode(tokens(text_col)).alias("token")
    )
    # the (source, token) frame feeds the corpus marginal, the
    # per-source totals, and the KL join; the corpus marginal feeds
    # the grand total and the join — lineage-cut both so the one
    # corpus-sized shuffle runs once (VERDICT r11 #3)
    st = (
        tok.groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c_st"))
        .localCheckpoint(eager=False)
    )
    corpus = (
        st.groupBy("token")
        .agg(F.sum("c_st").alias("c_t"))
        .localCheckpoint(eager=False)
    )
    per_source = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    total = corpus.agg(F.sum("c_t").alias("n_tot"))
    p_s = F.col("c_st") / F.col("n_s")
    p_c = F.col("c_t") / F.col("n_tot")
    return (
        # the corpus-marginal frame is VOCAB-sized — unbounded at
        # web-corpus scale, so it must NOT broadcast (same lesson as
        # token_pmi's r4 ADVICE fix): shuffle hash join on the token
        # key; only the |sources|-row and 1-row frames broadcast
        st.join(corpus, "token")
        .join(F.broadcast(per_source), "source")
        .crossJoin(F.broadcast(total))
        .groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_tokens"),
            F.round(F.sum(p_s * F.log(p_s / p_c)), 4).alias("kl_vs_corpus"),
        )
    )


# ln(2) as a Python literal shared with the oracle SQL (the JSD zero-
# overlap term): libm log is not guaranteed bit-identical cross-engine.
LN2 = math.log(2.0)


def source_token_jsd(
    df: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-source Jensen-Shannon divergence JSD(P_source ‖ P_corpus)
    over unigram token distributions — the SYMMETRIC, bounded
    ([0, ln 2]) drift metric next to `source_token_kl`: KL explodes on
    tokens the corpus lacks and is asymmetric, JSD is the
    mixture-comparison number dataset cards report.

    Algebraic form that never materializes the token union: with
    p = P_source(t), q = P_corpus(t), m = (p+q)/2,

      JSD = ½·Σ_{p>0}[p·ln(2p/(p+q)) + q·ln(2q/(p+q))]
          + ½·ln2·(1 − Σ_{p>0} q)

    — tokens the source lacks (p = 0) contribute exactly q·ln 2 to the
    q-side sum, so their whole mass folds into the closed-form last
    term and only the source's OWN (source, token) rows are ever
    scanned. Same frames as the KL: one corpus-sized (source, token)
    aggregate, vocab-sized marginals joined on the token key (never
    broadcast), |sources|-row and 1-row frames broadcast. Rounded to 4
    like the KL (the ln-sum is the one float accumulation; rounding
    absorbs partial-order ulps)."""
    tok = df.select(
        F.col(source_col).alias("source"), F.explode(tokens(text_col)).alias("token")
    )
    # same three-consumer shape as source_token_kl — cut st and the
    # corpus marginal so the corpus-sized shuffle runs once
    st = (
        tok.groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c_st"))
        .localCheckpoint(eager=False)
    )
    corpus = (
        st.groupBy("token")
        .agg(F.sum("c_st").alias("c_t"))
        .localCheckpoint(eager=False)
    )
    per_source = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    total = corpus.agg(F.sum("c_t").alias("n_tot"))
    p = F.col("c_st") / F.col("n_s")
    q = F.col("c_t") / F.col("n_tot")
    core = p * F.log(2 * p / (p + q)) + q * F.log(2 * q / (p + q))
    return (
        st.join(corpus, "token")
        .join(F.broadcast(per_source), "source")
        .crossJoin(F.broadcast(total))
        .groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_tokens"),
            F.round(
                0.5 * F.sum(core) + 0.5 * F.lit(LN2) * (1 - F.sum(q)), 4
            ).alias("jsd_vs_corpus"),
        )
    )


def bpe_pair_counts(df: DataFrame, k: int = 50, text_col: str = "text") -> DataFrame:
    """Corpus-weighted adjacent character-pair counts — the statistic
    a BPE/WordPiece tokenizer trainer maximizes at each merge step
    (Sennrich et al. 2016, public algorithm). Returns the top-``k``
    (pair, n_occurrences, n_words) rows.

    Scale shape is the whole point: the CORPUS pass is just the word
    count (explode + map-side-partial aggregate → vocabulary-sized
    result). Pair explosion then runs over the VOCABULARY — each
    distinct word explodes into (len−1) pairs weighted by the word's
    corpus frequency — so the expensive quadratic-ish step is
    independent of corpus row count. That is exactly how production
    BPE trainers work (count words once, then iterate merges over the
    word-frequency table), expressed as two aggregates.
    """
    words = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wf"))
    )
    # length >= 2 guard matters: Spark's sequence(1, 0) would DESCEND
    # ([1, 0]), not return empty like DuckDB's range(1, 1)
    pairs = words.filter(F.length("word") >= 2).select(
        "word",
        "wf",
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("wf").alias("n_occurrences"),
        F.countDistinct("word").alias("n_words"),
    )
    return agg.orderBy(F.desc("n_occurrences"), F.asc("pair")).limit(k)


def bpe_train(df: DataFrame, n_merges: int = 32, text_col: str = "text",
              top_words: int = 50_000) -> list[tuple[str, str]]:
    """Train a character-level BPE merge list (Sennrich et al. 2016)
    on the corpus's WORD-FREQUENCY table. The corpus pass is one word
    count; the merge loop then runs driver-side over that vocabulary-
    sized table (bounded by ``top_words``) — exactly how production
    BPE trainers work: the 100 TB corpus is touched once, the
    iterative part never sees it. Fully deterministic: equal-count
    ties go to the lexicographically GREATEST pair (max over
    (count, pair) — note this is the opposite of the smallest-first
    convention some trainers use; what matters for reproducibility is
    that it is fixed).

    Returns the ordered merge list [(left, right), ...] for
    ``bpe_encode``."""
    rows = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wf"))
        .orderBy(F.desc("wf"), "word")
        .limit(top_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        vocab[tuple(r["word"])] = vocab.get(tuple(r["word"]), 0) + r["wf"]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, wf in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + wf
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nv: dict[tuple[str, ...], int] = {}
        for syms, wf in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nv[key] = nv.get(key, 0) + wf
        vocab = nv
    return merges


def bpe_apply_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference greedy BPE encoding of one word: repeatedly merge the
    LOWEST-RANK adjacent pair (training order), like the published GPT-2
    encoder loop. Pure function — the pandas UDF below and the pytest
    reference both call it, so the distributed path is definitionally
    consistent with the local one."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Apply a trained BPE merge list to every document — the
    tokenizer-application stage of a training-data pipeline (token
    budgeting, packing, and billing all need REAL subword counts, not
    whitespace counts). Arrow-batched mapInPandas with the merge
    ranks broadcast via closure (a merge list is KBs — closure
    capture IS the broadcast for this size); per-batch memoization
    reuses each distinct word's encoding, so cost scales with the
    batch's vocabulary, not its token count. Returns (id, n_tokens,
    n_bpe_tokens, compression = whitespace/byte-pair ratio)."""
    from .hashing import fan_out

    ranks = {p: i for i, p in enumerate(merges)}
    src = fan_out(df).select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def encode(it):
        import pandas as pd

        cache: dict[str, int] = {}
        for pdf in it:
            ids, n_toks, n_bpe = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # NULL text encodes as an empty document (0 tokens),
                # matching what tokens() yields JVM-side for NULL.
                words = text.split() if isinstance(text, str) else []
                total = 0
                for w in words:
                    n = cache.get(w)
                    if n is None:
                        n = len(bpe_apply_word(w, ranks))
                        cache[w] = n
                    total += n
                ids.append(doc_id)
                n_toks.append(len(words))
                n_bpe.append(total)
            yield pd.DataFrame(
                {"doc_id": ids, "n_tokens": n_toks, "n_bpe_tokens": n_bpe}
            )

    out = src.mapInPandas(encode, "doc_id long, n_tokens long, n_bpe_tokens long")
    return out.withColumn(
        "compression",
        # guard n_tokens = 0 (empty/NULL doc): ANSI mode raises
        # DIVIDE_BY_ZERO instead of returning NULL, so make the NULL
        # explicit for zero-token documents.
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("n_bpe_tokens") / F.col("n_tokens").cast("double"), 4),
        ),
    )


def kneser_ney_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", discount: float = 0.75
) -> DataFrame:
    """Per-document mean negative log-probability under an
    interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; the
    standard n-gram smoothing) trained on the corpus itself — the top
    rung of the perplexity-filter ladder here (unigram → add-α bigram
    → KN bigram). KN's twist: the backoff weighs a word by how many
    DISTINCT contexts it follows (continuation count), not raw
    frequency — 'Francisco' is frequent but predictable, so it backs
    off low.

        P(w2|w1) = max(c12 − D, 0)/c1 + D·N1+(w1,·)/c1 · Pcont(w2)
        Pcont(w2) = N1+(·,w2) / |distinct bigrams|

    Scale shape: the per-context statistics are KEYED windows over the
    distinct-bigram table (one corpus pass → bigram-vocab-sized frame;
    row counts per w1/w2 partition ARE the continuation counts because
    rows are distinct bigrams). The one GLOBAL statistic — |distinct
    bigrams| — is a 1-row aggregate broadcast back in with a
    crossJoin, never a `Window.partitionBy()` (empty) over the LM
    table: at web-corpus scale that empty window would pin billions of
    distinct bigrams on a single reducer. Scoring joins the LM back
    onto the per-doc bigram stream and aggregates by doc — identical
    topology to `bigram_logprob`. Every model statistic is an exact
    integer, so the probability is a deterministic IEEE expression on
    both engines."""
    from pyspark.sql.window import Window

    from .hashing import fan_out
    from .text import word_ngrams_multiset

    bg = fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams_multiset(tokens(text_col), 2)).alias("bg"),
    )
    w1 = F.split("bg", " ")[0]
    w2 = F.split("bg", " ")[1]
    # the distinct-bigram count feeds both the |bigrams| total and the
    # LM windows — lineage-cut so the corpus-sized bigram shuffle runs
    # once (VERDICT r11 #3)
    counts = (
        bg.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=False)
    )
    nbt = counts.agg(F.count(F.lit(1)).alias("nbt"))
    lm = (
        counts.withColumn("c1", F.sum("c12").over(Window.partitionBy(w1)))
        .withColumn("n1p_left", F.count(F.lit(1)).over(Window.partitionBy(w1)))
        .withColumn("n1p_right", F.count(F.lit(1)).over(Window.partitionBy(w2)))
        .crossJoin(F.broadcast(nbt))
    )
    d = F.lit(discount)
    p = (
        F.greatest(F.col("c12") - d, F.lit(0.0)) / F.col("c1")
        + d * F.col("n1p_left") / F.col("c1")
        * (F.col("n1p_right") / F.col("nbt").cast("double"))
    )
    return (
        bg.join(F.broadcast(lm), "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 4).alias("avg_nll"),
        )
    )


def token_pmi(
    df: DataFrame, min_count: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs (Church &
    Hanks 1990 — the collocation statistic behind phrase mining /
    tokenizer-merge diagnostics): PMI(a,b) = ln(p(ab) / (p(a)p(b)))
    with p(ab) = c_ab/N_bigrams, p(w) = c_w/N_tokens. Only pairs with
    c_ab ≥ ``min_count`` are scored (the classic low-count PMI noise
    guard), but the totals N are over the FULL corpus.

    Scale shape: the bigram count is the word-count plan (map-side
    partials → bigram-vocab-sized shuffle) and the ≥min_count filter
    prunes it BEFORE any join; unigram counts join on the token key;
    the two totals are 1-row aggregates broadcast back in — no
    empty-partition window anywhere. All counts are exact integers;
    the PMI argument is assembled with one explicitly-ordered double
    expression on both engines and ln() is rounded to 4 (transcendental
    output — never lands on a rounding tie)."""
    from .hashing import fan_out
    from .text import tokens, word_ngrams_multiset

    bg = fan_out(df).select(
        F.explode(word_ngrams_multiset(tokens(text_col), 2)).alias("bg")
    )
    uni = df.select(F.explode(tokens(text_col)).alias("token"))
    # r13 (guide §1.2 step 1): both corpus totals come from ONE
    # size-only projection pass — N_tokens = Σ size(tokens),
    # N_bigrams = Σ max(size − 1, 0) (exactly how many entries the
    # zip-shingle form emits per doc; explode skips NULL/empty the
    # same way size/sum skip NULL). Exact integer identities, same
    # LongType. Previously each total re-ran its full explode pass —
    # the bigram one re-building every concat_ws shingle string just
    # to count rows (4 tokenize passes; now 2 explodes + 1 cheap
    # size-arithmetic scan, no shuffle added).
    nt = F.size(tokens(text_col))
    totals = df.select(nt.alias("nt")).agg(
        F.sum("nt").alias("n_uni"),
        F.sum(F.greatest(F.col("nt") - 1, F.lit(0))).alias("n_bi"),
    )
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
        # ucnt is vocabulary-sized (unbounded on a web corpus) — these
        # must stay shuffle joins on the token key; bcnt is already
        # min_count-pruned so the shuffle is the small side. Only the
        # 1-row totals below broadcast (ADVICE r04).
        .join(ucnt.select(F.col("token").alias("w1"), F.col("c_w").alias("c_a")), "w1")
        .join(ucnt.select(F.col("token").alias("w2"), F.col("c_w").alias("c_b")), "w2")
        .crossJoin(F.broadcast(totals))
    )
    num = F.col("c_ab").cast("double") * F.col("n_uni") * F.col("n_uni")
    den = F.col("n_bi").cast("double") * F.col("c_a") * F.col("c_b")
    return joined.select(
        "bg",
        "c_ab",
        # `+ 0.0` normalizes IEEE signed zero: a PMI that rounds to
        # zero must hash identically across engines (-0.0 + 0.0 = +0.0)
        (F.round(F.log(num / den), 4) + F.lit(0.0)).alias("pmi"),
    )


def zipf_slope(
    df: DataFrame, top_k: int = 1000, text_col: str = "text"
) -> DataFrame:
    """Zipf's-law fit over the corpus token frequency distribution:
    least-squares slope/intercept of ln(count) against ln(rank) for
    the ``top_k`` most frequent tokens (rank ties broken
    alphabetically). Natural text sits near slope −1; a corpus
    drifting toward 0 (too uniform — template spam) or steeply past
    −1.5 (a few tokens dominating — boilerplate collapse) fails the
    health check, which is why corpus-audit suites track this number
    per snapshot.

    Scale shape: word-count aggregate (map-side partials, vocab-sized
    shuffle) → global top-k via TakeOrdered (per-partition heaps, NO
    global sort shuffle) → rank + moment sums over k rows. The only
    unpartitioned window runs on the top-k frame, whose size is the
    bounded parameter k — the same bounded-single-partition contract
    as the token-budget cumsum. The fit itself is the closed-form
    normal equation on (Σx, Σy, Σxy, Σx²) — one tiny aggregate."""
    from pyspark.sql import Window

    from .text import tokens

    cnt = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = cnt.orderBy(F.desc("c"), "token").limit(top_k)
    # bounded window: exactly the top_k rows selected above
    w = Window.orderBy(F.desc("c"), "token")
    ranked = top.select("token", "c", F.row_number().over(w).alias("r"))
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("c").cast("double"))
    m = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return m.select(
        F.col("n").cast("int").alias("n_ranks"),
        F.round(slope, 4).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
    )


def dsir_logratio(
    df: DataFrame,
    target_pred,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    NON-target document by the log-likelihood ratio of its tokens
    under the target domain's unigram LM vs the raw (source) pool's —
    log w(x) = Σ_t [ln p_target(t) − ln p_source(t)]. Documents whose
    vocabulary looks like the target domain get positive scores and
    are upweighted when resampling pretraining data toward the domain.

    ``target_pred`` is a boolean Column over ``df`` marking the target
    exemplars (a domain sample, a quality slice). Both LMs are add-α
    smoothed over the SHARED vocabulary (union of both slices), so
    every token has positive mass in both and the ratio is finite —
    DSIR's hashed-ngram variant smooths the same way.

    Plan: one token explode that map-side combines to (token,
    target/source counts) — one vocabulary-sized table, not two
    passes; scoring re-explodes the source slice and joins the
    token-keyed ratio table (broadcast at dim size, shuffled-hash
    beyond — either is right), then aggregates per document, so hot
    tokens never pile a reducer. Exact integer counts; the only
    floats are per-token fixed-form ln ratios and the final rounded
    sum/mean. Returns (doc_id, n_tokens, log_ratio_sum,
    log_ratio_mean) over source (non-target) documents."""
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("is_target"),
        F.explode(tokens(text_col)).alias("token"),
    )
    counts = tok.groupBy("token").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).cast("long").alias("ct"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).cast("long").alias("cs"),
    )
    tots = counts.agg(
        F.sum("ct").cast("long").alias("nt"),
        F.sum("cs").cast("long").alias("ns"),
        F.count(F.lit(1)).cast("long").alias("vsz"),
    )
    # ln p_target(t) - ln p_source(t) with add-alpha over the shared
    # vocabulary; fixed expression order, bit-identical cross-engine
    ratio = counts.crossJoin(F.broadcast(tots)).select(
        "token",
        (
            F.log(
                (F.col("ct") + F.lit(alpha))
                / (F.col("nt") + F.lit(alpha) * F.col("vsz"))
            )
            - F.log(
                (F.col("cs") + F.lit(alpha))
                / (F.col("ns") + F.lit(alpha) * F.col("vsz"))
            )
        ).alias("lr"),
    )
    return (
        tok.filter(~F.col("is_target"))
        .join(F.broadcast(ratio), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            (F.round(F.sum("lr"), 4) + F.lit(0.0)).alias("log_ratio_sum"),
            (F.round(F.avg("lr"), 4) + F.lit(0.0)).alias("log_ratio_mean"),
        )
    )
