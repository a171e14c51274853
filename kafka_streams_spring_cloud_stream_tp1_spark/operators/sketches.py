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


def kmv_mins(
    df: DataFrame,
    item: Column | str,
    group: Column | str | None = None,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """(grp, mins: sorted array<long> of the ≤k smallest distinct
    item hashes) — the raw KMV sketch `kmv_distinct` estimates from
    and `kmv_source_overlap` intersects. One Arrow pass folds each
    partition to ≤ k hashes per group seen (bounded task state), then
    a tiny grouped min-k merge over ≤ partitions·k rows — the
    mergeable-summaries union (min-k of a union = min-k of per-part
    min-k's)."""
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
            # dropna=False: a NULL group is a legitimate segment —
            # pandas' default silently dropped every unlabeled row's
            # sketch (null-sweep r11)
            for grp, sub in pdf.groupby("grp", sort=False, dropna=False):
                hs = sub["h"].to_numpy()
                cur = state.get(grp)
                merged = np.concatenate([cur, hs]) if cur is not None else hs
                state[grp] = np.unique(merged)[:k]  # unique() sorts
        for grp, arr in state.items():
            yield pd.DataFrame({"grp": grp, "h": arr})

    mins = hashed.mapInPandas(partition_mins, "grp string, h long")
    return mins.groupBy("grp").agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("mins")
    )


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
    merged = kmv_mins(df, item, group, k, salt)
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


def kmv_source_overlap(
    df: DataFrame,
    item: Column | str,
    group: Column | str = "source",
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Pairwise cross-group DISTINCT-ITEM overlap estimated from KMV
    sketch intersections (Beyer et al. SIGMOD'07 §4: for sketches
    K_A, K_B, let K be the k smallest of K_A ∪ K_B and ρ = |K ∩ K_A ∩
    K_B| / k; then |A∩B| ≈ ρ · (k−1)·2⁶⁰ / h_k) — the cheap "how much
    do these two crawls share" matrix computed WITHOUT an exact
    cross-group distinct join. Returns one row per unordered group
    pair: (grp_a, grp_b, n_common_mins, est_intersection,
    est_jaccard).

    When the union sketch holds fewer than k hashes both sides were
    seen in full, so the intersection (and Jaccard) are exact. At
    100 TB the corpus-sized work is the one sketch pass (bounded
    per-task state); the pair math runs on a |groups|-row frame of
    ≤k-element arrays — |groups|²·k integers, driver-scale."""
    sk = kmv_mins(df, item, group, k, salt)
    a = sk.select(F.col("grp").alias("grp_a"), F.col("mins").alias("mins_a"))
    b = sk.select(F.col("grp").alias("grp_b"), F.col("mins").alias("mins_b"))
    pairs = a.join(b, F.col("grp_a") < F.col("grp_b"))
    union_k = F.slice(
        F.array_sort(F.array_union("mins_a", "mins_b")), 1, k
    )
    n_union = F.size(union_k)
    common = F.size(
        F.array_intersect(union_k, F.array_intersect("mins_a", "mins_b"))
    )
    two60 = float(1 << 60)
    # union-size estimate from the combined sketch's k-th value; the
    # intersection estimate is ρ · est_union (Beyer et al. eq. 4)
    est_union = F.when(n_union < k, n_union.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(two60) / F.element_at(union_k, k)
    )
    rho = common.cast("double") / n_union.cast("double")
    return pairs.select(
        "grp_a",
        "grp_b",
        common.cast("long").alias("n_common_mins"),
        F.floor(rho * est_union).cast("long").alias("est_intersection"),
        (F.round(rho, 4) + F.lit(0.0)).alias("est_jaccard"),
    )
