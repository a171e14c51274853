"""Custom distributed sketches beyond Spark's built-ins (HLL++
approx_count_distinct and KLL-style approx_percentile are built-in;
see plans/relational_queries.py). Here: Misra-Gries heavy hitters —
the bounded-memory frequent-items sketch (Misra & Gries 1982; merge
per Agarwal et al. 2013, "Mergeable Summaries" — both public).

Why a sketch when `vocab_topk` computes exact top-k? The exact plan's
shuffle carries one row per DISTINCT key per task — fine for a
vocabulary, fatal when the key space is unbounded (URLs, user ids,
query strings at 100 TB). Misra-Gries caps state at k counters PER
PARTITION, the shuffle at k rows per partition, and still guarantees
every item with frequency > n/(k+1) survives.

Shape: one mapInPandas pass builds a per-partition summary (per-batch
pandas value_counts — vectorized — folded into the k-counter dict via
the uniform-decrement compression), then a tiny groupBy sums counters
item-wise, which is the valid mergeable-summaries union: summed
counters remain lower bounds and under-count each item by at most
Σ_p n_p/(k+1) = n/(k+1).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd


def _mg_fold(counters: dict, batch_counts: "pd.Series", k: int) -> dict:
    """Fold a batch's exact value_counts into a Misra-Gries summary of
    ≤ k counters. Generalized decrement: when more than k counters
    remain, subtract the (k+1)-th largest value from all and drop the
    non-positive — equivalent to running the classic one-at-a-time
    decrement, preserving the count ≥ true − n/(k+1) lower-bound
    invariant."""
    for item, c in batch_counts.items():
        counters[item] = counters.get(item, 0) + int(c)
    if len(counters) > k:
        cut = sorted(counters.values(), reverse=True)[k]
        counters = {i: c - cut for i, c in counters.items() if c > cut}
    return counters


def heavy_hitters(
    df: DataFrame, item: Column | str, k: int = 16, top: int | None = None
) -> DataFrame:
    """Approximate most-frequent values of ``item`` with ≤ ``k``
    counters of state per partition. Returns (item, lower_bound)
    ordered by the merged lower bound.

    The Misra-Gries guarantee — every value with true frequency >
    n/(k+1) is present — holds for the FULL merged summary, i.e. when
    ``top`` is None (the default; output is ≤ k items per input
    partition). A ``top`` limit ranks by merged LOWER BOUNDS, which do
    not preserve true-frequency order, so with top < k a guaranteed
    item can fall below the cut — pass ``top`` only as a display
    truncation, not when the containment guarantee matters.
    """
    c = F.col(item) if isinstance(item, str) else item
    rows = df.select(c.cast("string").alias("item"))

    def summarize(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        counters: dict = {}
        for pdf in it:
            if pdf.empty:
                continue
            counters = _mg_fold(counters, pdf["item"].value_counts(), k)
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "lb": list(counters.values())}
            )

    summaries = rows.mapInPandas(summarize, "item string, lb long")
    merged = (
        summaries.groupBy("item")
        .agg(F.sum("lb").alias("lower_bound"))
        .orderBy(F.desc("lower_bound"), F.asc("item"))
    )
    return merged.limit(top) if top is not None else merged
