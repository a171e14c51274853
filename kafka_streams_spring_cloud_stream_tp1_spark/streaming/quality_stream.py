"""Streaming ingest-time QUALITY gate — the streaming twin of
`q_ccnet_buckets` + `q_gopher_filter`, the way `dedup_stream` twins
`q_incremental_dedup` and `drift_stream` twins `q_psi_drift`: every
micro-batch of incoming documents is scored under the unigram LM a
reference corpus trained, bucketed head/middle/tail at the reference's
perplexity tercile cutoffs, and checked against the Gopher
repetition/length rules — so a crawl whose quality mix shifts (or a
source that starts shipping boilerplate) alarms within one trigger,
not at the next offline audit.

Pattern: the LM is a vocabulary-sized static DataFrame fitted ONCE
batch-side and persisted (a stream-static join per micro-batch — the
standard shape; it exceeds the tiny-literal closure the PSI monitor
uses because a vocabulary doesn't collapse to ten floats). The NLL
cutoffs and smoothed-OOV mass DO collapse to three floats and ride the
closure. Scoring inside the callback is the same fixed-form arithmetic
as the batch operators, so stream and batch verdicts are directly
comparable.

Scale shape per micro-batch: one token explode that joins the
(broadcastable) LM and aggregates per doc — hot tokens never pile a
reducer (doc-keyed aggregate), and the gate carries NO streaming state
(the reference LM is immutable; refit = new gate).
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import gopher_quality_filter, tokens

_ALPHA = 0.5


def quality_baseline(
    docs: DataFrame,
    text_col: str = "text",
    quantiles: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
) -> tuple[DataFrame, float, float, float]:
    """Fit the reference-side artifacts: (lm, cut1, cut2, oov_logp).

    ``lm`` is the vocabulary-sized (token, logp) table under add-α
    smoothing, persisted for reuse across micro-batches; ``cut1`` /
    ``cut2`` are the reference docs' avg-NLL tercile cutoffs (the
    CCNet head/middle and middle/tail boundaries); ``oov_logp`` is
    the smoothed unseen-token mass. A baseline with no scoreable
    tokens raises rather than seeding NaN cutoffs (the drift-monitor
    guard, ADVICE r6)."""
    tok = docs.filter(F.col(text_col).isNotNull()).select(
        "doc_id", F.explode(tokens(text_col)).alias("token")
    )
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    if tot["n"] is None or int(tot["n"]) == 0:
        raise ValueError("empty baseline: no scoreable tokens to fit the LM")
    n, v = int(tot["n"]), int(tot["v"])
    denom = n + _ALPHA * v
    lm = vocab.select(
        "token", F.log((F.col("c") + F.lit(_ALPHA)) / F.lit(denom)).alias("logp")
    ).persist()
    lm.count()  # materialize: every micro-batch reads this table
    oov_logp = math.log(_ALPHA / denom)
    scored = _doc_nll(tok, lm)
    cuts = scored.agg(
        F.expr(f"percentile(avg_nll, {quantiles[0]!r}D)").alias("c1"),
        F.expr(f"percentile(avg_nll, {quantiles[1]!r}D)").alias("c2"),
    ).collect()[0]
    return lm, float(cuts["c1"]), float(cuts["c2"]), oov_logp


def _doc_nll(tok: DataFrame, lm: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, avg_nll) — OOV tokens take the smoothed
    unseen mass via the left join's NULL branch (caller supplies the
    constant through `score_batch`'s closure for batches; baseline
    fitting has no OOV by construction)."""
    return (
        tok.join(lm, "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.avg(-F.col("logp")).alias("avg_nll"),
        )
    )


def score_batch(
    batch: DataFrame,
    lm: DataFrame,
    cut1: float,
    cut2: float,
    oov_logp: float,
    text_col: str = "text",
) -> DataFrame:
    """One-row quality verdict for a batch: (n_rows, n_unscoreable,
    n_head, n_middle, n_tail, n_gopher_fail, avg_nll). NULL-text and
    token-less docs count ``n_unscoreable`` and join no bucket (they
    cannot dilute the mix fractions — the PSI monitor's NULL rule);
    OOV tokens score the smoothed unseen mass, so a batch from a NEW
    domain lands in `tail` instead of vanishing."""
    rows = batch.select(F.col("doc_id"), F.col(text_col).alias("text"))
    tok = rows.filter(F.col("text").isNotNull()).select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    nll = (
        tok.join(lm, "token", "left")
        .groupBy("doc_id")
        .agg(F.avg(-F.coalesce(F.col("logp"), F.lit(oov_logp))).alias("avg_nll"))
    )
    gopher = gopher_quality_filter(rows.filter(F.col("text").isNotNull())).select(
        "doc_id", "keep"
    )
    tagged = (
        rows.join(nll, "doc_id", "left")
        .join(gopher, "doc_id", "left")
        .select(
            "doc_id",
            "avg_nll",
            F.when(F.col("avg_nll").isNull(), "unscoreable")
            .when(F.col("avg_nll") <= cut1, "head")
            .when(F.col("avg_nll") <= cut2, "middle")
            .otherwise("tail")
            .alias("bucket"),
            F.coalesce(F.col("keep"), F.lit(False)).alias("gopher_keep"),
        )
    )
    return tagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count(F.when(F.col("bucket") == "unscoreable", 1)).cast("long").alias("n_unscoreable"),
        F.count(F.when(F.col("bucket") == "head", 1)).cast("long").alias("n_head"),
        F.count(F.when(F.col("bucket") == "middle", 1)).cast("long").alias("n_middle"),
        F.count(F.when(F.col("bucket") == "tail", 1)).cast("long").alias("n_tail"),
        F.count(F.when(~F.col("gopher_keep"), 1)).cast("long").alias("n_gopher_fail"),
        F.round(F.avg("avg_nll"), 4).alias("avg_nll"),
    )


def stream_quality_gate(
    stream: DataFrame,
    baseline: DataFrame,
    sink: Callable[[DataFrame, int], None],
    text_col: str = "text",
):
    """Score every micro-batch of ``stream`` against ``baseline``'s
    LM + tercile cutoffs and hand the one-row verdict to
    ``sink(df, batch_id)``. Returns the started StreamingQuery
    (caller stops)."""
    lm, cut1, cut2, oov = quality_baseline(baseline, text_col=text_col)

    def _score(batch: DataFrame, batch_id: int) -> None:
        sink(score_batch(batch, lm, cut1, cut2, oov, text_col=text_col), batch_id)

    return stream.writeStream.foreachBatch(_score).start()
