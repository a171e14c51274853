"""Text-analysis operators for training-data pipelines over the
`documents` table: tokenization, token counting, quality scoring,
language identification, document fingerprinting.

Everything here is pure Column expressions — JVM-side, whole-stage-
codegen'd, no Python in the hot path — so a 100 TB `documents` scan
stays a single embarrassingly-parallel projection stage (no shuffle at
all until a downstream groupBy). The reference system has no text ops
(its only value type is PageEvent — reference:
src/main/java/.../events/PageEvent.java:5); these extend the engine
surface for LLM-pipeline workloads per the north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .buckets import bounded_id_buckets, intra_bucket_pairs
from .hashing import fan_out, xhash

# Tiny stopword inventories for the ratio/language heuristics. Kept
# deliberately small so the DuckDB oracle can inline the same lists.
STOPWORDS_EN = ("the", "a", "is", "and", "of", "to", "in")
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "and"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "la", "et", "est"),
    "es": ("el", "los", "y", "es"),
}
# BPE-ish lexer classes: word pieces, digit runs, single non-space symbols.
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization with NO empty tokens — split then drop
    '' entries. The former trim-then-split form left phantom empty
    tokens for text with non-space edge whitespace (trim strips only
    spaces, so '\\t\\n' split to ['','']) and counted the empty string
    as one token — polluting vocab/BPE/n-gram statistics on real web
    text. This form matches Python's str.split() exactly, so the
    Arrow-batched Python operators and the JVM expression agree on
    every input; the DuckDB oracle macro applies the same
    list_filter."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def word_ngrams_multiset(toks: Column, n: int) -> Column:
    """Word n-grams of a token array WITH multiplicity (one entry per
    occurrence) — repetition signals need the counts that the distinct
    shingle form throws away.

    Built as arrays_zip of n shifted slices, NOT as
    transform(sequence, i -> element_at(toks, i+j)): CollapseProject
    inlines the token expression (a split of the full text) into every
    element_at call, making the sequence form O(len²) per document.
    The zip form evaluates the token split n times per ROW and the
    lambda touches only materialized struct elements. Short docs fall
    out naturally: slice length max(size−n+1, 0) → empty zip.
    """
    width = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, 1 + j, width) for j in range(n)])
    return F.transform(zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)]))


def word_ngrams(toks: Column, n: int) -> Column:
    """Distinct word n-gram shingles of a token array (the dedup/
    fingerprint form — see word_ngrams_multiset for the mechanics)."""
    return F.array_distinct(word_ngrams_multiset(toks, n))


def max_multiplicity(arr: Column) -> Column:
    """Highest occurrence count of any element in a string array,
    computed WITHOUT a shuffle: sort the array, then fold once tracking
    the longest equal-run. Keeps repetition scoring a pure projection —
    the explode + groupBy(doc, token) alternative costs two shuffles of
    every token occurrence in the corpus."""
    run = lambda acc, x: F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))  # noqa: E731
    return F.aggregate(
        F.array_sort(arr),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run(acc, x).alias("run"),
            F.greatest(acc["best"], run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1: heavily
    repetitive documents are low-quality training data): most-frequent-
    token fraction, most-frequent-bigram fraction, and the fraction of
    duplicated trigram occurrences. All ratios of in-row run-length
    counts → one codegen projection, no shuffle at any corpus size.
    NULL (not 0) when a doc is too short to have the n-gram at all."""
    t = tokens(text_col)
    bi = word_ngrams_multiset(t, 2)
    tri = word_ngrams_multiset(t, 3)

    def frac(num: Column, den: Column) -> Column:
        return F.round(num / F.when(den > 0, den), 4)

    return fan_out(df).select(
        "doc_id",
        frac(max_multiplicity(t), F.size(t)).alias("max_token_frac"),
        frac(max_multiplicity(bi), F.size(bi)).alias("top_bigram_frac"),
        frac(F.size(tri) - F.size(F.array_distinct(tri)), F.size(tri)).alias(
            "dup_trigram_frac"
        ),
    )


def stopword_ratio(toks: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords))) / F.size(toks)


def boilerplate_fraction(
    df: DataFrame,
    n: int = 3,
    min_df: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-internal boilerplate density per document: the fraction
    of a doc's DISTINCT word n-gram shingles that appear in at least
    ``min_df`` documents (nav menus, cookie banners, license footers —
    spans whose document frequency is far above organic text). The
    complement of `decontaminate`'s external probe set: here the
    "probe" is the corpus's own over-shared span inventory. Returns
    (doc_id, n_shingles, boilerplate_frac); docs too short to hold one
    n-gram drop out (they have no spans to score).

    Plan shape: the (doc, shingle) frame is built once; shingle df is a
    map-side-combinable ``groupBy(g).count()`` immediately FILTERED to
    ``df >= min_df`` — the boilerplate inventory, which is tiny relative
    to the vocabulary (the long tail of df < min_df shingles, the bulk
    of any corpus, drops before the join) — then LEFT-joined back onto
    the shingle frame (AQE broadcasts it when it fits, which it does by
    construction at any min_df worth using) and aggregated per doc.
    A COUNT window partitioned by the shingle would instead pin every
    hot boilerplate shingle's full row set on one reducer with no
    partial aggregation — measured 10.8x at a 5x scale-up; this
    formulation is flat (see BASELINE.md round-3 scale table)."""
    sh = fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(tokens(text_col), n)).alias("g"),
    )
    bp = sh.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") >= min_df
    ).select("g", F.lit(1).alias("is_bp"))
    flagged = sh.join(bp, "g", "left").select(
        "doc_id", F.coalesce("is_bp", F.lit(0)).alias("is_bp")
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.round(F.sum("is_bp") / F.count(F.lit(1)), 4).alias("boilerplate_frac"),
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality statistics: token counts, average token
    length, alpha/punctuation ratios, stopword ratio, and a composite
    0-100 quality score (the usual pre-training heuristic filter:
    reasonable length, low symbol noise, natural stopword density)."""
    t = tokens(text_col)
    n_tok = F.size(t)
    alpha = F.regexp_count(F.col(text_col), F.lit(r"[a-zA-Z]"))
    punct = F.regexp_count(F.col(text_col), F.lit(r"[^a-zA-Z0-9\s]"))
    n_chars = F.length(text_col)
    sw = stopword_ratio(t)
    # Integer 0-100 "quality points" (not a float composite): floor of
    # an exact small-denominator rational is bit-stable across engines,
    # where a rounded float composite flips at .xxxx5 boundaries.
    n_sw = F.size(F.filter(t, lambda tok: tok.isin(*STOPWORDS_EN)))
    quality = (
        F.floor(F.least(n_tok, F.lit(64)) * 40 / 64)
        + (30 - F.floor(punct * 30 / n_chars))
        + F.least(F.lit(30), F.floor(n_sw * 120 / n_tok))
    )
    return fan_out(df).select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_unique_tokens"),
        F.round(
            F.aggregate(t, F.lit(0), lambda acc, tok: acc + F.length(tok)) / n_tok, 4
        ).alias("avg_token_len"),
        F.round(alpha / n_chars, 4).alias("alpha_ratio"),
        F.round(punct / n_chars, 4).alias("punct_ratio"),
        F.round(sw, 4).alias("stopword_ratio"),
        quality.cast("long").alias("quality_score"),
    )


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways: whitespace words and a BPE-ish regex
    lexer (letter runs / digit runs / single symbols) — the standard
    cheap proxy for LLM token budgets."""
    return fan_out(df).select(
        "doc_id",
        F.size(tokens(text_col)).alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE)).alias("bpe_tokens"),
        F.round(F.length(text_col) / F.lit(4.0), 4).alias("chars_per_4"),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: CJK codepoints → zh; otherwise the
    language whose marker-stopword count is highest (ties broken by
    fixed language order). Deterministic by construction so the oracle
    can replay it; on real corpora swap marker lists for character
    n-gram profiles (same plan shape: one projection, no shuffle)."""
    t = tokens(text_col)

    def marker_hits(markers: tuple[str, ...]) -> Column:
        # nested def (not a default-arg lambda): F.filter treats a
        # 2-parameter lambda as (element, index)
        return F.size(F.filter(t, lambda tok: tok.isin(*markers)))

    scores = {lang: marker_hits(markers) for lang, markers in LANG_MARKERS.items()}
    # argmax with deterministic tie-break = chained WHEN in fixed order
    best = F.lit("en")
    best_score = scores["en"]
    for lang in ("de", "fr", "es"):
        best = F.when(scores[lang] > best_score, F.lit(lang)).otherwise(best)
        best_score = F.when(scores[lang] > best_score, scores[lang]).otherwise(best_score)
    pred = F.when(
        F.regexp_count(F.col(text_col), F.lit(r"[\x{4e00}-\x{9fff}]")) > 0, F.lit("zh")
    ).otherwise(best)
    return fan_out(df).select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("pred_lang"),
        scores["en"].alias("en_hits"),
    )


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: full-content md5, a normalized (sorted
    unique token bag) md5 that is invariant to word order, and a
    winnowing-style min-hash over word 3-gram shingles (the minimum
    shingle hash — one 60-bit int summarizing local structure).

    The min-shingle hash goes through explode → codegen'd hash →
    partial-aggregating min, NOT a per-element lambda: higher-order
    functions are interpreted expressions in Spark, ~10× slower per
    element than the same hash inside whole-stage codegen."""
    t = tokens(text_col)
    # NULL text => every fingerprint NULL (null-sweep r11): md5(NULL)
    # is NULL by itself, but concat_ws would swallow a NULL token
    # array into '' and fingerprint every failed fetch identically
    base = fan_out(df).select(
        "doc_id",
        F.md5(F.col(text_col)).alias("fp_exact"),
        F.when(
            F.col(text_col).isNotNull(),
            F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(t)))),
        ).alias("fp_tokenset"),
        word_ngrams(t, 3).alias("shingles"),
    )
    # explode_outer, NOT explode: inner explode makes Catalyst infer a
    # `size(shingles) > 0` predicate and push it below the repartition
    # onto the (single-split) scan, re-evaluating the whole n-gram
    # lambda there — serial and duplicated. Outer explode infers
    # nothing; min() skips the null rows.
    mins = (
        base.select("doc_id", F.explode_outer("shingles").alias("sh"))
        .groupBy("doc_id")
        .agg(F.min(xhash(F.col("sh"))).alias("fp_min_shingle"))
    )
    # left join: docs shorter than 3 words have no shingles → NULL
    return base.drop("shingles").join(mins, "doc_id", "left")


def winnow_fingerprints(
    df: DataFrame, k: int = 3, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    2003 — the MOSS local fingerprinting algorithm, public): hash all
    word ``k``-gram shingles in position order, slide a window of
    ``w`` consecutive hashes, keep each window's minimum; the sorted
    distinct minima are the fingerprint. Guarantees every shared
    substring of ≥ w+k−1 words produces a shared fingerprint entry —
    the exact-substring-overlap primitive (plagiarism / cross-doc
    boilerplate detection) that the single min-shingle fingerprint
    (`with_fingerprints`) only approximates with one value.

    Plan: posexplode the positional shingles → codegen'd hash (NOT a
    per-element lambda — higher-order functions are interpreted, see
    `with_fingerprints`) → windowed min over a ROWS [0, w−1] frame
    partitioned by doc → keep one row per window start → sorted
    distinct collect. ONE shuffle, partitioned by doc_id; window
    frames never cross documents, so a 100 TB corpus scales linearly
    with documents per partition.

    Returns (doc_id, fp_winnow array<bigint>, n_grams). Docs with
    0 < n_grams < w yield one fingerprint (the global min — the frame
    truncates at the partition end); empty docs yield an empty array.
    """
    from pyspark.sql.window import Window

    toks = tokens(text_col)
    base = fan_out(df).select(
        "doc_id", word_ngrams_multiset(toks, k).alias("grams")
    )
    pos = base.select(
        "doc_id",
        F.size("grams").alias("n_grams"),
        F.posexplode_outer("grams").alias("pos", "gram"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    # keep window-START rows plus the null row posexplode_outer emits
    # for shingle-less docs: its wmin is null, collect_list skips it,
    # so empty docs flow through the SAME aggregate with fp = [] and
    # n_grams 0 — no second shingle pass, no join-back needed
    keep = F.col("pos").isNull() | (
        F.col("pos") <= F.greatest(F.col("n_grams") - w, F.lit(0))
    )
    return (
        pos.withColumn("wmin", F.min(xhash(F.col("gram"))).over(win))
        .filter(keep)
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.array_distinct(F.collect_list("wmin"))).alias("fp_winnow"),
            F.max("n_grams").alias("n_grams"),
        )
    )


def winnow_overlap_pairs(
    df: DataFrame,
    k: int = 3,
    w: int = 4,
    min_shared: int = 3,
    text_col: str = "text",
    max_bucket: int | None = 64,
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprint
    values — the MOSS overlap report: a pair sharing m values shares
    ~m distinct substrings of ≥ w+k−1 words. Candidate pairs come
    from grouping per fingerprint VALUE (one shuffle, like the LSH
    band buckets — never a fingerprint self-join); a value shared by
    b docs emits b·(b−1)/2 pairs, so a boilerplate value shared by
    thousands of docs is the skew knob — winnowing's density bound
    (≈2/(w+1) of shingles survive) keeps b small on natural text,
    and the min_shared filter drops the incidental singleton overlaps
    that dominate the pair count (3374 → 25 on the fixture corpus).

    ``max_bucket`` is the hard cap on that skew: fingerprint values
    shared by more than ``max_bucket`` docs are DROPPED before pair
    emission (standard MOSS practice — a value present in thousands
    of documents is boilerplate, not evidence of copying, and its b²
    pair blow-up is exactly the super-linear term the r02 5× scale
    check caught). Eligibility is decided on a count-only
    aggregation BEFORE any doc array materializes
    (`buckets.bounded_id_buckets`), so per-bucket work is ≤
    max_bucket² by construction and a corpus-saturated value costs
    one counter row, never an unbounded aggregation row. Dropped
    values are observable via ``winnow_overloaded_values`` (same
    inputs) so pipelines can report the drop count. ``None``
    disables the upper cap (singleton values are still pruned
    count-first).
    """
    fp = winnow_fingerprints(df, k=k, w=w, text_col=text_col)
    # lineage-cut once (r13, the r12 forked-pipeline device): inside
    # bounded_id_buckets the exploded frame forks into the count-only
    # eligibility branch and the collect_list branch. AQE stage reuse
    # covers the subtree below the fingerprint window's own
    # exchange(doc_id), but everything ABOVE it — the windowed min
    # over every shingle position, the per-doc collect, the explode —
    # re-executed per branch. Materialized (doc_id, v) — 8-byte hash
    # rows, never text — that segment runs once (interleaved warm A/B
    # at sf0.1: 1.66 → 1.41 s median, identical rows).
    u = fp.select("doc_id", F.explode("fp_winnow").alias("v")).localCheckpoint(
        eager=False
    )
    pairs = intra_bucket_pairs(bounded_id_buckets(u, ["v"], min_df=2, max_df=max_bucket))
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_overloaded_values(
    df: DataFrame, k: int = 3, w: int = 4, text_col: str = "text", max_bucket: int = 64
) -> DataFrame:
    """The fingerprint values `winnow_overlap_pairs` drops under the
    same ``max_bucket`` cap, with their bucket sizes — the drop report
    a pipeline logs/audits alongside the overlap pairs (count(*) here
    is the number of suppressed boilerplate values; sum(b·(b−1)/2)
    the number of suppressed pairs)."""
    fp = winnow_fingerprints(df, k=k, w=w, text_col=text_col)
    return (
        fp.select("doc_id", F.explode("fp_winnow").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket)
    )


def chunk_dedup_rewrite(
    df: DataFrame,
    width: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Paragraph-granularity dedup WITH document reconstruction (the
    ExactSubstr-style rewrite: drop repeated spans, keep the rest of
    the doc): split each document into non-overlapping ``width``-token
    chunks, keep each distinct chunk's FIRST occurrence corpus-wide
    (ordered by (doc_id, chunk_idx)), and rebuild every document's
    text from its surviving chunks. Documents whose every chunk lost
    drop out entirely (they were pure boilerplate). Returns (doc_id,
    n_chunks, n_kept, clean_text).

    Plan: the chunk frame is a JVM-side projection (sequence →
    slice → array_join; no UDF, no shuffle); the keep-first winner per
    chunk hash is ``min(struct(doc_id, chunk_idx))`` — a partial-
    aggregable min, so a viral chunk's million occurrences collapse to
    one candidate per map task before the exchange (never a hot
    single-reducer partition, unlike row_number-without-group-limit) —
    then an inner join on (hash, doc, idx) retains winners and the
    rebuild is a doc-keyed sort_array + array_join aggregate, bounded
    by per-doc chunk counts. Three shuffles total at any corpus size;
    the chunk TEXT crosses the wire only for surviving chunks."""
    toks = tokens(text_col)
    n_chunks = F.ceil(F.size(toks) / F.lit(width)).cast("int")
    chunked = fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.struct(
                    i.cast("long").alias("chunk_idx"),
                    F.array_join(F.slice(toks, i * width + 1, width), " ").alias("chunk"),
                ),
            )
        ).alias("c"),
    ).select("doc_id", F.col("c.chunk_idx"), F.col("c.chunk"))
    hashed = chunked.select("doc_id", "chunk_idx", "chunk", F.md5("chunk").alias("h"))
    winners = hashed.groupBy("h").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("w")
    ).select(
        F.col("h").alias("w_h"),
        F.col("w.doc_id").alias("w_doc"),
        F.col("w.chunk_idx").alias("w_idx"),
    )
    kept = hashed.join(
        winners,
        (F.col("h") == F.col("w_h"))
        & (F.col("doc_id") == F.col("w_doc"))
        & (F.col("chunk_idx") == F.col("w_idx")),
        "leftsemi",
    )
    totals = chunked.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return rebuilt.join(totals, "doc_id").select(
        "doc_id", "n_chunks", "n_kept", "clean_text"
    )


def quality_classifier(
    df: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """fastText-style hashed linear quality scorer (Joulin et al.
    2016, "Bag of Tricks for Efficient Text Classification" — the
    model family behind the CCNet / RefinedWeb quality filters):
    token → hash bucket → integer weight; doc score = Σ weights over
    the token MULTISET; keep = score > 0.

    The weight codebook here is md5-derived integers in [-1000, 1000]
    — a deterministic stand-in with the production artifact's exact
    shape: a trained fastText model ships precisely such a bucket→
    weight table and slots into the same broadcast join. Integer
    weights make the doc score an EXACT BIGINT sum (no float
    summation-order hazard), so the whole classifier value-checks
    against the SQL oracle.

    Scale shape: the codebook is ``n_buckets`` rows built from a
    range — broadcast; the corpus pass is explode → hash →
    broadcast join → per-doc sum with map-side partials. Hot tokens
    land on the PROBE side of the broadcast join and the aggregate is
    keyed by doc_id, so token-frequency skew never concentrates on
    one reducer."""
    from .hashing import fan_out, xhash

    weights = (
        df.sparkSession.range(n_buckets)
        .select(
            F.col("id").alias("bucket"),
            (
                xhash(F.concat(F.lit("qw|"), F.col("id").cast("string"))) % 2001 - 1000
            ).alias("w"),
        )
    )
    tok = fan_out(df).select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("token")
    )
    bucketed = tok.select(
        "doc_id",
        (xhash(F.concat(F.lit("qc|"), F.col("token"))) % n_buckets).alias("bucket"),
    )
    return (
        bucketed.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("w").cast("long").alias("score"),
        )
        .withColumn("keep", F.col("score") > 0)
    )


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_distinct_frac: float = 0.2,
    min_stopwords: int = 1,
    stopwords: tuple[str, ...] = STOPWORDS_EN,
) -> DataFrame:
    """Composite Gopher-style document quality verdict (Rae et al.
    2021 §A1.1: word-count bounds, mean-word-length band, stop-word
    presence; distinct-word fraction standing in for the symbol/
    ellipsis rules this fixture's text can't exercise). One boolean
    per document plus the per-rule measurements, so a pipeline can
    both filter and audit WHY a document fell.

    All four measurements are exact-integer arithmetic or ratios of
    exact integers — bit-identical cross-engine, raw doubles, no
    rounding (the repo's float-parity contract). Scale shape: pure
    per-row projection (one codegen'd pass, no shuffle, no UDF); at
    100 TB this pipelines inside whatever scan feeds it."""
    t = tokens(text_col)
    n_words = F.size(t)
    sum_len = F.aggregate(
        F.transform(t, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    n_distinct = F.size(F.array_distinct(t))
    n_stop = F.size(F.array_intersect(F.array_distinct(t), F.array(*[F.lit(s) for s in stopwords])))
    # n_words is a REAL zero for empty/whitespace-only docs — under
    # ANSI mode (on in plain driver sessions) an unguarded division
    # throws, it doesn't NULL (the q_mann_kendall lesson; surfaced by
    # the round-8 streaming quality gate). Ratios go NULL, keep=false.
    nz = F.when(n_words > 0, n_words.cast("double"))
    mean_len = sum_len.cast("double") / nz
    distinct_frac = n_distinct.cast("double") / nz
    return df.select(
        "doc_id",
        n_words.cast("int").alias("n_words"),
        mean_len.alias("mean_word_len"),
        distinct_frac.alias("distinct_frac"),
        n_stop.cast("int").alias("n_stopwords"),
        (
            n_words.between(min_words, max_words)
            & mean_len.between(min_mean_len, max_mean_len)
            & (distinct_frac >= F.lit(min_distinct_frac))
            & (n_stop >= F.lit(min_stopwords))
        ).alias("keep"),
    )


def compression_ratio(df: DataFrame, text_col: str = "text", level: int = 6) -> DataFrame:
    """Per-document zlib compression ratio — the classic redundancy
    quality signal (highly repetitive/templated text compresses far
    below natural prose; both tails flag low-quality documents).
    Returns (doc_id, n_raw, n_compressed, ratio).

    Arrow-batched ``mapInPandas`` over stdlib zlib — per-row
    independent, no shuffle, linear in executors (the same plumbing
    contract as the multimodal decodes). Compressed byte counts are
    deterministic for a fixed zlib build+level, so tests pin exact
    values against an in-process reference; no SQL engine can replay
    DEFLATE, which is why this is a rows-only operator in the
    registry (the documented non-SQL-expressible class)."""
    from collections.abc import Iterator as _It

    def batches(it: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import zlib

        import pandas as pd

        for pdf in it:
            raw = pdf[text_col].map(lambda t: b"" if t is None else t.encode("utf-8"))
            comp = raw.map(lambda b: len(zlib.compress(b, level)))
            n_raw = raw.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_raw": n_raw.astype("int64"),
                    "n_compressed": comp.astype("int64"),
                    "ratio": comp / n_raw.where(n_raw > 0, 1),
                }
            )

    return fan_out(df).select("doc_id", text_col).mapInPandas(
        batches, "doc_id long, n_raw long, n_compressed long, ratio double"
    )


def cdc_chunk_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 8,
    divisor: int = 64,
) -> DataFrame:
    """Content-defined chunking dup profile (the LBFS/FastCDC family):
    split each document at positions where the 60-bit hash of the
    trailing ``gram`` chars ≡ 0 (mod ``divisor``) — boundaries depend
    only on LOCAL content, so an insertion early in a document shifts
    NO later chunk boundary, unlike fixed-stride chunking where one
    added word re-keys every subsequent chunk. Chunk hashes are then
    counted corpus-wide: the shift-robust storage-dedup signal.

    Per doc: one codegen'd projection evaluates the boundary filter
    over a char-position sequence (O(len) hash evaluations, all
    JVM-side), slices chunks between consecutive cutpoints, and
    explodes (doc, chunk_hash) rows; a duplicated-hash inventory via
    map-side-combined groupBy joins back (same no-hot-reducer shape
    as boilerplate_fraction). Expected chunk length ≈ ``divisor``
    chars. Empty/NULL docs report 0 chunks.

    Output: (doc_id, n_chunks, n_dup_chunks, dup_frac) where a dup
    chunk's content hash appears >1 time in the corpus.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    L = F.length(t)
    # boundary positions: gram ends at p, covers [p-gram+1, p]
    bounds = F.when(
        L >= gram,
        F.filter(
            F.sequence(F.lit(gram), L),
            lambda p: xhash(t.substr(p - gram + 1, F.lit(gram))) % divisor == 0,
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    cuts = F.array_distinct(
        F.concat(F.array(F.lit(0).cast("bigint")), bounds, F.array(L.cast("bigint")))
    )
    base = fan_out(df).select(
        F.col(id_col).alias("doc_id"), t.alias("__t"), cuts.alias("__c")
    )
    spans = base.select(
        "doc_id",
        F.posexplode(
            F.arrays_zip(
                F.slice(F.col("__c"), 1, F.size("__c") - 1),
                F.slice(F.col("__c"), 2, F.size("__c") - 1),
            )
        ).alias("idx", "pair"),
        "__t",
    )
    chunks = spans.select(
        "doc_id",
        F.md5(
            F.col("__t").substr(
                F.col("pair")["0"].cast("int") + 1,
                (F.col("pair")["1"] - F.col("pair")["0"]).cast("int"),
            )
        ).alias("h"),
    )
    dup_inventory = (
        chunks.groupBy("h").agg(F.count(F.lit(1)).alias("cnt")).filter(F.col("cnt") > 1)
    )
    flagged = chunks.join(F.broadcast(dup_inventory), "h", "left")
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("cnt").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_dup_chunks"),
    )
    # docs with zero chunks (empty text) still get a row
    all_docs = df.select(F.col(id_col).alias("doc_id"))
    return (
        all_docs.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("n_dup_chunks", F.lit(0)).alias("n_dup_chunks"),
            F.when(
                F.coalesce("n_chunks", F.lit(0)) > 0,
                F.round(
                    F.col("n_dup_chunks") / F.col("n_chunks").cast("double"), 4
                ),
            ).alias("dup_frac"),
        )
    )
