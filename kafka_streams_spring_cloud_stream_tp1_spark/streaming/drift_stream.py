"""Streaming distribution-drift monitoring against a STATIC baseline —
the ingest-time twin of `q_psi_drift`, the way `dedup_stream` twins
`q_incremental_dedup`: every micro-batch of a metric stream is scored
with the Population Stability Index against the reference distribution
a model/pipeline was built on, so a mix shift alarms within one
trigger instead of at the next offline audit.

Pattern: the baseline histogram is computed ONCE as a batch aggregate
and collapses to ``buckets`` fractions plus the (min, max) range —
tens of floats, captured as plain Python literals in the foreachBatch
closure (the same tiny-artifact precedent as the IVF codebook: the
INDEXED data stays distributed, only the summary centralizes). Inside
the callback the batch is binned by the SAME pure bucket expression
`q_psi_drift` uses, so stream and batch scores are directly
comparable; one-sided bins are skipped and counted, never ε-floored,
matching the batch operator's convention.

Scale shape per micro-batch: one map-side-combined bin count (≤
``buckets`` rows reach the reducer) and a bucket-grain score — the
monitor costs one scan of each batch regardless of stream volume, and
carries NO streaming state (the baseline is immutable; retrain = new
closure).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def baseline_profile(
    df: DataFrame, value_col: str, buckets: int = 10
) -> tuple[float, float, list[float]]:
    """(vmin, vmax, per-bucket mass fractions) of the reference
    distribution — ``buckets`` equal-width cells of the observed
    range, the deterministic binning `q_psi_drift` uses. One
    aggregate pass; the result is `buckets + 2` floats. NULL metric
    values carry no distribution mass and are excluded up front; a
    baseline with zero non-NULL values is unusable and raises rather
    than seeding NaN fences."""
    nn = df.filter(F.col(value_col).isNotNull())
    rng = nn.agg(
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if int(rng["n"]) == 0:
        raise ValueError(
            f"empty baseline: no non-NULL {value_col!r} values to profile"
        )
    vmin, vmax, n = float(rng["vmin"]), float(rng["vmax"]), int(rng["n"])
    counts = {
        r["b"]: r["c"]
        for r in nn.select(_bucket(value_col, vmin, vmax, buckets).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    return vmin, vmax, [counts.get(b, 0) / n for b in range(buckets)]


def _bucket(value_col: str, vmin: float, vmax: float, buckets: int):
    span = vmax - vmin
    if span <= 0:
        return F.lit(0)
    return F.least(
        F.lit(buckets - 1), F.floor((F.col(value_col) - F.lit(vmin)) / span * buckets)
    ).cast("int")


def psi_of_batch(
    batch: DataFrame,
    value_col: str,
    vmin: float,
    vmax: float,
    base_frac: list[float],
    buckets: int = 10,
) -> DataFrame:
    """One-row (n_rows, psi, n_onesided_bins) PSI score of a batch
    against the baseline fractions. Out-of-range values clamp into
    the edge bins (the production case: drift OUTSIDE the reference
    range is exactly what must alarm). NULL metric values are dropped
    BEFORE binning so they never dilute the batch fractions (batch
    fractions always sum to 1 over scoreable rows); an all-NULL or
    empty batch scores (n_rows=0, psi=0.0) with every populated
    baseline bin counted one-sided. One bin-grain aggregate."""
    binned = batch.filter(F.col(value_col).isNotNull()).select(
        F.when(F.col(value_col) < vmin, F.lit(0))
        .otherwise(_bucket(value_col, vmin, vmax, buckets))
        .alias("b")
    )
    bc = binned.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    spine = bc.sparkSession.range(buckets).select(F.col("id").cast("int").alias("b"))
    base = F.element_at(F.array(*[F.lit(f) for f in base_frac]), F.col("b") + 1)
    tot = bc.agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n"))
    grid = (
        spine.join(bc, "b", "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "p",
            F.when(F.col("n") > 0, F.col("c") / F.col("n").cast("double")).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn("q", base)
    )
    both = (F.col("p") > 0) & (F.col("q") > 0)
    term = F.when(both, (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).otherwise(
        F.lit(0.0)
    )
    onesided = F.when(
        ~both & ((F.col("p") > 0) | (F.col("q") > 0)), 1
    ).otherwise(0)
    return grid.groupBy("n").agg(
        (F.round(F.sum(term), 4) + F.lit(0.0)).alias("psi"),
        F.sum(onesided).cast("long").alias("n_onesided_bins"),
    ).select(F.col("n").alias("n_rows"), "psi", "n_onesided_bins")


def stream_drift_monitor(
    stream: DataFrame,
    baseline: DataFrame,
    value_col: str,
    sink: Callable[[DataFrame, int], None],
    buckets: int = 10,
):
    """Score every micro-batch of ``stream`` against ``baseline``'s
    distribution and hand the one-row PSI frame to ``sink(df,
    batch_id)``. Returns the started StreamingQuery (caller stops)."""
    vmin, vmax, frac = baseline_profile(baseline, value_col, buckets)

    def _score(batch: DataFrame, batch_id: int) -> None:
        sink(psi_of_batch(batch, value_col, vmin, vmax, frac, buckets), batch_id)

    return stream.writeStream.foreachBatch(_score).start()
