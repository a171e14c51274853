"""Deterministic corpus sampling and splitting — the data-mixing ops a
training pipeline runs after dedup/quality filtering: carve train/val/
test splits and downsample strata (languages, domains, sources) to
target mixture weights.

No RNG anywhere: assignment is a pure function of the document id via
the cross-engine hash (`hashing.xhash`), so it is (a) reproducible
across runs, engines, and cluster sizes — the property `sample()` /
`rand()` cannot give, since their draw depends on partitioning — and
(b) stable under corpus growth: a doc keeps its split when new docs
arrive, which is what keeps eval sets uncontaminated across dataset
versions. This is one whole-stage-codegen projection: no shuffle, no
sampling pass, linear at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .hashing import xhash, xhash_sql

BUCKETS = 10_000


def hash_bucket(id_col: Column | str, salt: str) -> Column:
    """Uniform bucket in [0, BUCKETS) from (salt, id) — md5-based, so
    bit-identical in the DuckDB oracle (hashing.py)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return xhash(F.concat(F.lit(salt), c.cast("string"))) % BUCKETS


def hash_bucket_sql(id_expr: str, salt: str) -> str:
    """The identical bucket as DuckDB SQL."""
    hashed = xhash_sql(f"'{salt}' || {id_expr}::VARCHAR")
    return f"{hashed} % {BUCKETS}"


def with_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign each row a named split by cumulative bucket ranges, e.g.
    ``{"train": .9, "val": .05, "test": .05}`` → buckets [0,9000) /
    [9000,9500) / [9500,10000)."""
    assert abs(sum(fractions.values()) - 1.0) < 1e-9, "fractions must sum to 1"
    b = hash_bucket(id_col, salt)
    expr, lo = None, 0
    for name, frac in fractions.items():
        hi = lo + round(frac * BUCKETS)
        cond = b < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn("split", expr)


def group_sample(
    df: DataFrame,
    k: int,
    group_col: str,
    id_col: str = "doc_id",
    salt: str = "gsample",
) -> DataFrame:
    """Deterministic ``k``-rows-per-group sample: rank rows inside each
    group by their salted hash and keep the first ``k`` — the uniform
    per-stratum subsample used for eval-set carving and per-source
    inspection sets.

    The hash order is a pure function of (salt, id), so the sample is
    reproducible across runs/engines/partitionings and stable under
    corpus growth (a kept doc stays kept until enough lower-hash docs
    arrive) — properties ORDER BY rand() cannot give. Plan: one hash
    shuffle on the group key; Spark's WindowGroupLimit pushes the
    rank ≤ k filter into the sort, so each task keeps a k-row heap per
    group instead of sorting whole groups.
    """
    h = xhash(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.select(group_col, id_col, F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= k)
    )


def stratified_keep(
    df: DataFrame,
    quotas: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "mix",
    default: float = 1.0,
) -> Column:
    """Boolean keep-flag downsampling each stratum to its quota —
    deterministic stratified sampling (the mixture-reweighting step of
    corpus assembly). Strata absent from ``quotas`` keep ``default``."""
    b = hash_bucket(id_col, salt)
    s = F.col(strata_col)
    expr = None
    for name, q in quotas.items():
        cond = (s == name) & (b < F.lit(round(q * BUCKETS)))
        expr = F.when(cond, True) if expr is None else expr.when(cond, True)
    return expr.when(s.isin(*quotas.keys()), False).otherwise(
        b < F.lit(round(default * BUCKETS))
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    score_col: Column,
    token_count_col: Column,
    id_col: str = "doc_id",
    bucket_scale: int = 100,
) -> DataFrame:
    """Quality-ranked corpus selection under a token budget: rank
    documents by (score DESC, id ASC) and keep the maximal prefix
    whose cumulative token count stays within ``budget`` — how a
    pretraining run picks 'the best N tokens' from a larger pool.
    Returns (doc_id, n_tokens, score, cum_tokens) for selected docs.

    The naive formulation is a running sum over a GLOBAL ordering —
    one partition, one reducer, dead at scale. This is the two-level
    equivalent: (1) quantize score into ``floor(score*bucket_scale)``
    buckets; per-bucket token totals are a tiny map-side-combined
    aggregate; (2) cumulative offsets ACROSS buckets are a window over
    the bucket-grain frame (cardinality ≤ bucket_scale·range — bounded
    by construction, safe in one partition); (3) the within-bucket
    running sum is a window partitioned BY BUCKET (corpus-sized work,
    but spread across bucket partitions), added to the bucket's
    broadcast offset. Because the bucket is a monotone function of the
    score and within-bucket order matches the global tie-break, offset
    + running == the global cumulative sum, exactly."""
    b = F.floor(score_col * bucket_scale).alias("__bucket")
    scored = df.select(
        F.col(id_col).alias("doc_id"),
        token_count_col.cast("long").alias("n_tokens"),
        score_col.alias("score"),
        b,
    )
    per_bucket = scored.groupBy("__bucket").agg(F.sum("n_tokens").alias("__btok"))
    w_off = Window.orderBy(F.desc("__bucket")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = per_bucket.select(
        F.col("__bucket").alias("__ob"),
        (F.sum("__btok").over(w_off) - F.col("__btok")).alias("__offset"),
    )
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.join(F.broadcast(offsets), F.col("__bucket") == F.col("__ob"))
        .withColumn("cum_tokens", F.col("__offset") + F.sum("n_tokens").over(w_in))
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "n_tokens", "score", "cum_tokens")
    )
