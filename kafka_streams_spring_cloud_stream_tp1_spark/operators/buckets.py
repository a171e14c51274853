"""Bounded blocking-bucket construction shared by the dedup lanes.

Every blocked pair-generation operator in this repo (LSH bands,
winnowing fingerprints, df-capped exact Jaccard) has the same shape:
explode docs to (key, doc_id) rows, group per key, emit the
b·(b−1)/2 intra-bucket pairs. The scale hazard is identical in each:
a saturated key (boilerplate shingle, mega dup-family band hash)
owned by one reducer. `collect_list` THEN `filter(size(...))`
materializes the FULL doc array for that key in a single aggregation
row before dropping it — a df≈10⁹ key is an ~8 GB row on one task.

`bounded_id_buckets` restores the bound BY CONSTRUCTION:

1. a count-only aggregation (map-side partial combine, one long per
   key per partition) computes each key's document frequency;
2. keys outside [min_df, max_df] are dropped while they are still one
   counter row — the saturated key never grows past 8 bytes;
3. the `collect_list` runs only on rows that survive the eligibility
   join, so the largest materialized array is max_df elements
   regardless of corpus size.

Cost: one extra shuffle of the exploded rows (the eligibility join);
both aggregations and the join hash-partition on the same key, so
AQE coalesces the exchanges, and the count shuffle itself is tiny
(partial aggregation collapses each partition to one row per key).
That is the right trade at 100 TB — the unbounded variant is one
shuffle cheaper and one hot key away from an executor OOM
(VERDICT r07 "What's wrong" #1; same fix as the r7 SimHash
distinct-signature rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bounded_id_buckets(
    u: DataFrame,
    key_cols: list[str],
    id_col: str = "doc_id",
    min_df: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """(key_cols..., ds: sorted array<id>) for keys whose frequency in
    ``u`` lies in [min_df, max_df]; arrays are ≤ max_df elements by
    construction (see module docstring). ``u`` must have one row per
    (key, id) — callers explode DISTINCT per-doc values, so count(*)
    is the document frequency. ``max_df=None`` keeps the pre-count
    pruning of singletons but no upper cap."""
    counts = u.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_df"))
    eligible = counts.filter(F.col("_df") >= min_df)
    if max_df is not None:
        eligible = eligible.filter(F.col("_df") <= max_df)
    return (
        u.join(eligible.select(*key_cols), key_cols)
        .groupBy(*key_cols)
        .agg(F.sort_array(F.collect_list(id_col)).alias("ds"))
    )


def intra_bucket_pairs(buckets: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """Emit the b·(b−1)/2 ordered (a < b) pairs from each bucket's
    ``ds`` array — a per-row array expression (nested transform +
    flatten), no join. Callers dedupe across buckets themselves
    (distinct or count-groupBy) because the right dedup depends on
    whether they also want the shared-bucket count.

    r13 (guide §1.2 step 2, per-task work): the inner pass runs over
    ``slice(ds, i+2, …)`` — only the elements AFTER position i — so
    exactly the b·(b−1)/2 upper-triangle structs are built. The former
    full-b² transform built every (x, y) struct and then filtered
    a < b, doing ~2× the element work per bucket; higher-order-function
    lambdas evaluate interpreted (not codegen), so halving the element
    count halves the stage. ``ds`` is sorted and duplicate-free
    (bounded_id_buckets sorts, and (key, id) rows are unique), so
    j > i ⟺ ds[j] > ds[i]: the emitted pair set is IDENTICAL, in the
    same order."""
    return (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ds",
                        lambda x, i: F.transform(
                            F.slice(F.col("ds"), i + F.lit(2), F.size("ds")),
                            lambda y: F.struct(x.alias(a), y.alias(b)),
                        ),
                    )
                )
            ).alias("p")
        )
        .select(f"p.{a}", f"p.{b}")
    )
