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


def kmv_distinct(
    df: DataFrame,
    item: Column | str,
    group: Column | str | None = None,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.
    2002; merge per Beyer et al. SIGMOD\'07): hash every item to
    (0, 2^60), keep the k smallest DISTINCT hashes per group; with
    h_k the k-th smallest, the estimate is (k-1)*2^60/h_k. Fewer than
    k distinct hashes -> the count is exact.

    Why next to the built-in HLL (`approx_count_distinct`): HLL
    register state is engine-internal, so that query can only ever be
    a rows-only check. KMV over the repo\'s deterministic md5 hash is
    the SAME sketch on both engines, and min-k is PARTITION-INVARIANT
    (the k smallest of a union = k smallest of per-partition min-k),
    so the estimate itself is oracle-checkable — the approx-distinct
    family gets a value gate, not just a row count.

    Plan shape (the mergeable-summaries discipline, like
    heavy_hitters): one Arrow pass folds each partition to <= k
    hashes per group seen — BOUNDED state per task no matter how many
    distinct items stream through — then a tiny grouped merge over
    <= partitions*k rows takes the global min-k. The estimate uses
    exact integer hashes and one IEEE multiply+divide, identical on
    both engines."""
    import numpy as np

    from .hashing import xhash

    it = F.col(item) if isinstance(item, str) else item
    h = xhash(F.concat(F.lit(salt + "|"), it.cast("string")))
    if group is not None:
        g = (F.col(group) if isinstance(group, str) else group).cast("string")
    else:
        g = F.lit("")
    hashed = df.select(g.alias("grp"), h.alias("h"))

    def partition_mins(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        state: dict = {}
        for pdf in batches:
            for grp, sub in pdf.groupby("grp", sort=False):
                hs = sub["h"].to_numpy()
                cur = state.get(grp)
                merged = np.concatenate([cur, hs]) if cur is not None else hs
                state[grp] = np.unique(merged)[:k]  # unique() sorts
        for grp, arr in state.items():
            yield pd.DataFrame({"grp": grp, "h": arr})

    mins = hashed.mapInPandas(partition_mins, "grp string, h long")
    merged = mins.groupBy("grp").agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("mins")
    )
    n_kept = F.size("mins")
    two60 = float(1 << 60)
    est = F.when(n_kept < k, n_kept.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(two60) / F.element_at("mins", k)
    )
    return merged.select(
        "grp",
        n_kept.cast("long").alias("n_kept"),
        F.floor(est).cast("long").alias("est_distinct"),
    )
