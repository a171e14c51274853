"""Retrieval over the document corpus: inverted index construction and
BM25 scoring — the lexical-retrieval passes an LLM data pipeline runs
for decontamination lookups, nearest-neighbour text search, and
retrieval-augmented training-set construction.

The reference system has no text surface (its value type is PageEvent —
reference: src/main/java/.../events/PageEvent.java:5); these extend the
engine for LLM-data workloads per the north star (SURVEY §8.3).

Scale shape:
- The index build is the word-count plan plus one `collect_list`: one
  explode, one (token) hash-aggregate with map-side partials. Posting
  lists are per-term, so the shuffle carries vocabulary-sized keys; a
  hot term's posting list is the classic skew risk and is why
  `inverted_index` exposes `min_df`/`max_df` pruning (stopword-like
  terms are useless for retrieval AND are exactly the skewed keys).
- BM25 never materializes the full index: it filters the exploded
  postings to the query's terms FIRST (predicate on a low-cardinality
  string column, pushed below the aggregate), so the shuffle carries
  only rows for query terms. Query terms are a driver-side literal
  (the same "small static side" premise as a broadcast join); corpus
  statistics (N, avgdl) arrive as a broadcast 1-row cross join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """term → sorted posting list (doc ids), document frequency, and
    total term frequency. ``min_df``/``max_df`` prune rare/stopword
    terms — at corpus scale the max_df cut also removes the skewed
    posting lists before the collect_list sees them.

    `sort_array(collect_list(...))` keeps the list deterministic under
    any partitioning; collect_list itself is the only order-sensitive
    step in the plan.
    """
    td = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if max_df is not None:
        # df-eligibility decided COUNT-FIRST (one long per term,
        # map-side combined) so a stopword's corpus-sized posting list
        # never materializes in a single aggregation row before the
        # filter drops it — the round-8 hot-bucket discipline
        # (operators/buckets.py); collect_list then sees only
        # bounded-df terms by construction.
        counts = td.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
        eligible = counts.filter(
            (F.col("_df") >= min_df) & (F.col("_df") <= max_df)
        )
        td = td.join(eligible.select("term"), "term")
    idx = td.groupBy("term").agg(
        F.sort_array(F.collect_list("doc_id")).alias("postings"),
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("tf_total"),
    )
    if max_df is None and min_df > 1:
        # r13 (guide §2.4): with NO upper cap the count-first join
        # protects nothing — a stopword's corpus-sized posting list is
        # collected either way, and min_df only drops sub-min_df terms
        # whose lists are < min_df elements. Meanwhile the fork
        # defeated exchange reuse (the optimizer rewrites the df
        # branch's inner (term, doc_id) aggregate to a DISTINCT,
        # dropping the tf count, so the two exchanges no longer
        # canonicalize equal — executed plan showed the tokenize+
        # explode pass twice). A post-aggregate HAVING keeps the plan
        # at ONE corpus pass and is value-identical: df here equals
        # the count the eligibility branch computed.
        idx = idx.filter(F.col("df") >= min_df)
    return idx


def idf_rarity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document rarity profile over its DISTINCT tokens: mean and
    max smoothed IDF, idf(t) = ln((N+1)/(df(t)+1)) — the cheap
    "rare-token density" quality signal (jargon/code/named-entity-rich
    docs score high; pure-stopword boilerplate scores near 0), the
    inverse view of `unigram_logprob`'s frequency weighting. Returns
    (doc_id, n_unique, mean_idf, max_idf).

    Plan: distinct (doc, token) pairs in ONE Expand-free aggregate
    (groupBy doc+token), df(t) as a vocab-sized re-aggregate joined
    back on the token (broadcast while it fits, shuffled hash join
    beyond — either way the scoring aggregate is keyed by doc_id, so
    stopword skew spreads across reducers), N as a broadcast 1-row
    aggregate."""
    # lineage-cut once (r12): the broadcast join leaves the streamed
    # branch with no exchange to share with the df(t) branch, so the
    # token explode + distinct executed once per consumer; materialized
    # (doc_id, term) keys, it runs once (measured 1.2 s → 0.6 s warm
    # at sf0.1, identical rows).
    pairs = (
        df.select(
            F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    dfreq = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
    return (
        pairs.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_unique"),
            F.round(F.avg(idf), 4).alias("mean_idf"),
            F.round(F.max(idf), 4).alias("max_idf"),
        )
    )


def bm25(
    df: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 score of every document matching ≥1 query term, using the
    Lucene idf variant idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (always
    positive, so stopword-heavy queries can't produce negative scores).

    Plan: explode → filter to query terms (this is the whole trick:
    the predicate sits UNDER the aggregate, so only query-term rows
    shuffle) → per-(doc, term) tf → df-per-term as a map-side-combined
    ``groupBy(term).count()`` broadcast-joined back (the df table has
    at most ``len(query_terms)`` rows; a term-partitioned window count
    would instead pin every doc containing a common query term on one
    reducer — a corpus-sized partition for a stopword term — with no
    partial aggregation; Spark's exchange reuse keeps the tf subplan
    from recomputing for the second branch) → per-doc score sum.
    Document lengths ride along from the first projection; N and avgdl
    broadcast as a 1-row aggregate.
    """
    qt = [t for t in query_terms if t]
    if not qt:
        raise ValueError("bm25 needs at least one non-empty query term")
    toks = tokens(text_col)
    # r13 (guide §5, lineage cut): ONE tokenize pass feeds both the
    # per-doc query-term rows AND the corpus stats (N, avgdl) — the
    # stats aggregate previously re-tokenized the whole corpus in its
    # own branch (1-row aggregate exchange, shared with nothing). The
    # cut frame is (doc_id, dl, ≤|query| matching tokens) — counts and
    # a driver-literal-bounded token list per row, never the text.
    # dl = size(tokens) is NULL for NULL text in both forms (size
    # returns NULL on NULL input), so avg() skips the same rows.
    proj = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        F.filter(toks, lambda t: t.isin(qt)).alias("qtoks"),
    ).localCheckpoint(eager=False)
    base = proj.select("doc_id", "dl", F.explode("qtoks").alias("term"))
    tf = base.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    tf = tf.join(F.broadcast(dfreq), "term")
    stats = proj.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.crossJoin(F.broadcast(stats))
        .withColumn("contrib", idf * tf_part)
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("contrib"), 4).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    max_df: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse TF-IDF cosine similarity join: document pairs whose
    unit-normalized tf-idf vectors (over terms with df ≤ ``max_df``)
    have cosine ≥ ``threshold``. The lexical sibling of
    `similarity.cosine_near_dup_pairs` — topical near-duplicates that
    share vocabulary but not exact spans (rewrites, translations of
    boilerplate, template articles), invisible to shingle dedup.
    Returns (doc_a, doc_b, cosine), doc_a < doc_b, cosine rounded to 4
    and thresholded on the ROUNDED value so the cut is stable against
    cross-engine float-sum ordering.

    Plan (one posting frame, three key-grain shuffles — never a doc×doc
    self-join):
    1. (doc, term, tf) aggregate — the corpus-sized shuffle;
    2. df per term via map-side-combined ``groupBy(term).count()``
       FILTERED to [2, max_df] before the join-back (df < 2 terms are
       pair-less; df > max_df are stopword-grade: no discriminative
       weight AND the b² pair blow-up — the same cap as
       containment_pairs). The filtered df table is vocabulary-tail
       sized, broadcast by AQE; the inner join drops stopword postings
       WITHOUT ever buffering a term's full posting set on one reducer
       (a term-partitioned window count would — "the" appears in every
       document, so its partition is corpus-sized);
    3. per-doc vector norms over the PRUNED space (window by doc_id),
       so cosine is exact within the pruned term space on both engines;
    4. bucket-local pair emission (a<b) → groupBy(pair) sum of
       u_a·u_b. Bucket size ≤ max_df bounds every pair list.
    """
    from pyspark.sql import Window

    tf = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= max_df))
    )
    tf = tf.join(dfc, "term")
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    w = tf.crossJoin(F.broadcast(n_docs)).select(
        "doc_id",
        "term",
        (F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1))).alias("w"),
    )
    nrm = F.sqrt(F.sum(F.col("w") * F.col("w")).over(Window.partitionBy("doc_id")))
    unit = w.select("doc_id", "term", (F.col("w") / nrm).alias("u"))
    buckets = unit.groupBy("term").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "u"))).alias("ds")
    )
    # r13 (guide §1.2 step 2): upper-triangle emission over
    # slice(ds, i+2, …) — ds is sorted with unique doc_id per term
    # bucket, so j > i ⟺ doc_b > doc_a; the former full-b² transform
    # built every struct (and its u·u product) then filtered a < b.
    # Same pair rows with the same prod values, in the same order.
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ds",
                    lambda x, i: F.transform(
                        F.slice(F.col("ds"), i + F.lit(2), F.size("ds")),
                        lambda y: F.struct(
                            x["doc_id"].alias("doc_a"),
                            y["doc_id"].alias("doc_b"),
                            (x["u"] * y["u"]).alias("prod"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b", "p.prod")
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.round(F.sum("prod"), 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def rrf_fusion(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: Sequence[str],
    query_vec_id: int = 0,
    candidates: int = 100,
    rrf_k: int = 60,
    top: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack, Clarke &
    Buettcher 2009): fuse a lexical BM25 ranking and a dense
    embedding-cosine ranking of the same corpus for one query, scoring
    each doc sum(1 / (rrf_k + rank_i)) over the lists it appears in —
    the standard first-stage fusion of BM25 + vector retrievers ahead
    of a reranker in RAG / training-data retrieval stacks.

    Scale shape: each retriever's full ranking is never materialized —
    both lists are cut to ``candidates`` rows by `orderBy().limit()`,
    which Spark plans as TakeOrderedAndProject (per-partition partial
    top-k + driver merge, NO global sort shuffle). Only the two
    bounded candidate lists (≤ ``candidates`` rows each, a driver-side
    literal) pass through the unpartitioned rank window and the
    full-outer fuse join, so the post-retrieval stage is O(candidates)
    regardless of corpus size. Ranks are assigned on (rounded score,
    id) so the cut and the fusion are deterministic cross-engine.

    Output: (doc_id, lex_rank, dense_rank, rrf, rank) — list ranks are
    NULL for docs present in only one list, as the full-outer RRF
    over the union of candidate lists implies.
    """
    from pyspark.sql import Window

    from .similarity import dot, with_norm

    lex = (
        bm25(docs, query_terms, k1=k1, b=b)
        .select("doc_id", F.col("score").alias("lex_score"))
        .orderBy(F.desc("lex_score"), "doc_id")
        .limit(candidates)
    )
    lex = lex.withColumn(
        "lex_rank",
        F.row_number().over(Window.orderBy(F.desc("lex_score"), "doc_id")),
    )

    corpus = with_norm(emb)
    qside = corpus.filter(F.col("vec_id") == query_vec_id).select(
        F.col("vec").alias("qvec"), F.col("norm").alias("qnorm")
    )
    dense = (
        corpus.crossJoin(F.broadcast(qside))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm")), 4
            ).alias("dense_score"),
        )
        .orderBy(F.desc("dense_score"), "doc_id")
        .limit(candidates)
    )
    dense = dense.withColumn(
        "dense_rank",
        F.row_number().over(Window.orderBy(F.desc("dense_score"), "doc_id")),
    )

    fused = lex.select("doc_id", "lex_rank").join(
        dense.select("doc_id", "dense_rank"), "doc_id", "full_outer"
    )
    inv = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(rrf_k) + F.col(r)), F.lit(0.0)
    )
    fused = fused.withColumn(
        "rrf", F.round(inv("lex_rank") + inv("dense_rank"), 6)
    )
    return (
        fused.withColumn(
            "rank", F.row_number().over(Window.orderBy(F.desc("rrf"), "doc_id"))
        )
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(top)
    )


def mmr_select(
    emb: DataFrame,
    n_queries: int = 1,
    candidates: int = 30,
    k: int = 10,
    lam: float = 0.5,
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): for each query, greedily pick ``k`` of the top
    ``candidates`` most-relevant vectors, at each step maximizing
    lam·rel(d) − (1−lam)·max_{s∈selected} sim(d, s) — relevance
    traded against redundancy with what's already picked. The
    diversity stage that follows first-stage retrieval (e.g. after
    `rrf_fusion`) in RAG and eval-set construction.

    Scale shape: the greedy loop is inherently sequential in ``k``,
    so it runs ONLY over bounded per-query state: relevance top-C via
    a rank window (WindowGroupLimit) and the C² candidate-pair cosine
    matrix via a query-local self-join — both O(candidates),
    driver-side literals. The loop itself executes inside ONE
    Arrow-cogrouped applyInPandas task per query, so reranking
    parallelizes across queries while each query's state stays tiny.
    Nothing is collected to the driver.

    Determinism / oracle parity: rel and pairwise sims are rounded to
    4 before the greedy loop; inside it the score is the raw-double
    expression lam·rel − (1−lam)·maxsim with argmax ties broken on
    id — IEEE arithmetic over identical rounded inputs, so a DuckDB
    recursive CTE replays the selection exactly. The reported mmr
    rounds to 6 (inputs have ≤4 decimals, so the 6-digit grid is
    never at a rounding tie).

    Output: (query_id, step, doc_id, mmr), step = 1..k in selection
    order.
    """
    from pyspark.sql import Window

    from .similarity import dot, with_norm

    corpus = with_norm(emb, vec_col)
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    scored = corpus.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("id"),
        F.round(
            dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm")), 4
        ).alias("rel"),
        "vec",
        "norm",
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), F.col("id"))
    # the top-C candidate frame feeds both self-join sides and the
    # greedy-loop input — lineage-cut so the rank window (the one
    # fact-sized shuffle) runs once (VERDICT r11 #3)
    cand = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= candidates)
        .localCheckpoint(eager=False)
    )
    a = cand.select("query_id", F.col("id").alias("ai"), "vec", "norm")
    # rename every column on the right side of the query-local
    # self-join (including the key) — same-lineage columns would
    # otherwise trip Spark's ambiguous-self-join analyzer
    b = cand.select(
        F.col("query_id").alias("qb"),
        F.col("id").alias("bi"),
        F.col("vec").alias("bvec"),
        F.col("norm").alias("bnorm"),
    )
    sims = (
        a.join(b, a["query_id"] == b["qb"])
        .filter(F.col("ai") != F.col("bi"))
        .select(
            "qb",
            "ai",
            "bi",
            F.round(
                dot(F.col("vec"), F.col("bvec")) / (F.col("norm") * F.col("bnorm")), 4
            ).alias("s"),
        )
    )

    def greedy(cand_pdf, sims_pdf):
        import pandas as pd

        if cand_pdf.empty:
            return pd.DataFrame(
                {"query_id": [], "step": [], "doc_id": [], "mmr": []}
            )
        qid = int(cand_pdf["query_id"].iloc[0])
        rel = dict(zip(cand_pdf["id"].astype(int), cand_pdf["rel"].astype(float)))
        sim: dict[tuple[int, int], float] = {
            (int(x), int(y)): float(v)
            for x, y, v in zip(sims_pdf["ai"], sims_pdf["bi"], sims_pdf["s"])
        }
        selected: list[int] = []
        out = []
        for step in range(1, min(k, len(rel)) + 1):
            best_id, best_mmr = None, None
            for cid in rel:
                if cid in selected:
                    continue
                ms = max((sim[(cid, s)] for s in selected), default=0.0)
                score = lam * rel[cid] - (1.0 - lam) * ms
                if (
                    best_id is None
                    or score > best_mmr
                    or (score == best_mmr and cid < best_id)
                ):
                    best_id, best_mmr = cid, score
            selected.append(best_id)
            out.append((qid, step, best_id, round(best_mmr, 6)))
        return pd.DataFrame(
            out, columns=["query_id", "step", "doc_id", "mmr"]
        )

    return (
        cand.select("query_id", "id", "rel")
        .groupBy("query_id")
        .cogroup(sims.groupBy("qb"))  # keys match positionally; the
        # renamed right-side key keeps the same-lineage self-join
        # unambiguous for the analyzer
        .applyInPandas(greedy, "query_id long, step int, doc_id long, mmr double")
    )


def crossencoder_rerank(
    df: DataFrame,
    query_terms: Sequence[str],
    candidates: int = 50,
    top: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Two-stage retrieve-then-rerank: BM25 recalls the top-C
    candidates, a second-stage scorer re-reads ONLY those C documents
    and re-orders them — the cascade every production retrieval stack
    runs (Nogueira & Cho 2019 established the BM25 → cross-encoder
    shape). The plumbing is the point: stage 2's input is a bounded
    C-row frame joined back to the raw text by a broadcast semi-join,
    so the expensive per-(query, doc) scorer never sees the corpus —
    swap the deterministic lexical scorer below for an Arrow-batched
    Pandas-UDF model forward pass (same shape as `mmr_select`'s
    cogroup) and nothing else in the plan changes.

    The stand-in scorer is a deterministic feature blend a cross
    encoder would dominate but that already reranks sensibly:
      0.6·coverage  (distinct query terms present / |Q|)
      0.3·density   (query-term token share of the document)
      0.1·earliness (1 / first 1-based position of any query term)
    all exactly SQL-replayable for the oracle.

    Plan: `bm25` (predicate-below-aggregate, query-term-only shuffle)
    → TakeOrderedAndProject top-C (no global sort) → broadcast join
    of the C ids back to the docs scan → per-row codegen features →
    one ≤C-row window for the final rank. Output: (doc_id, bm25,
    rerank_score, rank) rows 1..top."""
    from pyspark.sql import Window

    qt = [t for t in query_terms if t]
    first = (
        bm25(df, qt, k1=k1, b=b, text_col=text_col, id_col=id_col)
        .orderBy(F.desc("score"), "doc_id")
        .limit(candidates)
        .select("doc_id", F.col("score").alias("bm25"), "n_terms_hit")
    )
    toks = tokens(text_col)
    docs = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    cand = docs.join(F.broadcast(first), "doc_id")
    qhits = F.filter(F.col("toks"), lambda t: t.isin(qt))
    # array_position is 1-based, 0 when absent -> NULL via nullif so
    # least() skips misses; every candidate hit >=1 term, so first_pos
    # is never NULL
    positions = [
        F.nullif(F.array_position("toks", F.lit(t)), F.lit(0)) for t in qt
    ]
    first_pos = F.least(*positions) if len(positions) > 1 else positions[0]
    coverage = F.col("n_terms_hit").cast("double") / F.lit(float(len(qt)))
    density = F.size(qhits) / F.size("toks").cast("double")
    rerank = F.round(
        F.lit(0.6) * coverage
        + F.lit(0.3) * density
        + F.lit(0.1) / first_pos.cast("double"),
        6,
    )
    scored = cand.select(
        "doc_id", "bm25", rerank.alias("rerank_score")
    )
    w = Window.orderBy(F.desc("rerank_score"), F.desc("bm25"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
    )


def crossencoder_rerank_udf(
    df: DataFrame,
    query_terms: Sequence[str],
    scorer=None,
    candidates: int = 50,
    top: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """`crossencoder_rerank` with a REAL model hook (VERDICT r06 #7b):
    stage 2 runs ``scorer`` as an Arrow-batched pandas UDF over the
    bounded C-row candidate frame instead of the SQL feature blend.

    ``scorer(query: str, texts: pd.Series) -> pd.Series[float]`` is
    the cross-encoder forward pass: it receives the ONE query string
    and an Arrow batch of candidate texts, and returns one score per
    text. Plug in a sentence-transformers CrossEncoder's
    ``predict([(q, t) for t in texts])`` unchanged; the default is a
    deterministic lexical stand-in (query-term hit rate + inverse
    first-hit position) so the plumbing is testable in this container
    (no model libs baked in).

    The plan shape is the contract, identical to the SQL variant:
    BM25 → TakeOrderedAndProject top-C → broadcast join of C ids back
    to the docs scan → ArrowEvalPython over ≤C rows → one ≤C-row
    window. The Python worker sees C rows TOTAL regardless of corpus
    size — the scorer can afford a 100 ms/row model because the frame
    is bounded, and the corpus never crosses the Arrow boundary."""
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    qt = [t for t in query_terms if t]
    q_str = " ".join(qt)

    if scorer is None:

        def scorer(query: str, texts: "pd.Series") -> "pd.Series":
            terms = query.split()

            def _s(t: str) -> float:
                toks = t.lower().split()
                hits = [i for i, w in enumerate(toks) if w in terms]
                if not hits:
                    return 0.0
                hit_terms = len({toks[i] for i in hits})
                return round(
                    0.7 * hit_terms / len(terms) + 0.3 / (hits[0] + 1), 6
                )

            return texts.map(_s)

    def _score_fn(texts):
        return scorer(q_str, texts).astype("float64")

    # positional form: with `from __future__ import annotations` the
    # decorator's type-hint sniffing sees strings and rejects them
    _score = pandas_udf(_score_fn, "double")

    first = (
        bm25(df, qt, k1=k1, b=b, text_col=text_col, id_col=id_col)
        .orderBy(F.desc("score"), "doc_id")
        .limit(candidates)
        .select("doc_id", F.col("score").alias("bm25"))
    )
    cand = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("t")).join(
        F.broadcast(first), "doc_id"
    )
    scored = cand.select("doc_id", "bm25", _score(F.col("t")).alias("rerank_score"))
    w = Window.orderBy(F.desc("rerank_score"), F.desc("bm25"), "doc_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top
    )
