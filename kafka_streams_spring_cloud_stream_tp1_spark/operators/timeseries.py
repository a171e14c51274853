"""Sequential-by-definition time-series folds as keyed aggregates.

EWMA (e_1 = v_1, e_i = α·v_i + (1−α)·e_{i−1}) has no built-in window
frame — it is a left fold. Two executable shapes, one operator:

- ``segment_len=None`` (exact fold): one shuffle keyed by entity,
  collect + array_sort the per-entity sequence, codegen'd
  ``F.aggregate``. Per-task state is one entity's full history — the
  sessionization contract; right when per-entity history is bounded.

- ``segment_len=L`` (bounded state): every EWMA step is an affine map
  e → (1−α)·e + α·v (the first step is the constant map e → v_1), and
  affine maps compose associatively: (s2,o2)∘(s1,o1) =
  (s2·s1, s2·o1+o2). So the fold splits into per-segment partial
  folds of ≤L steps (bounded per-task state, map-side combinable in
  spirit) composed by a per-entity fold over n/L tiny (s,o) pairs.
  This is the segment-and-carry path the exact fold's docstring
  promises for unbounded per-key history; at 100 TB the segments are
  what lets a hot entity's history exceed executor memory — and the
  composition tree can go hierarchical (treeAggregate-style) without
  changing the algebra.

Cross-engine float parity (the repo's raw-double contract): both
shapes are replayed by DuckDB oracles running the IDENTICAL op
sequence — the exact fold via list_reduce over values, the segmented
fold via list_reduce over the same affine structs in the same segment
order — so results are bit-identical with no rounding. Seeding
differs syntactically (DuckDB's list_reduce seeds with the first list
element; Spark's F.aggregate takes an explicit init), but composing
the identity affine (1.0, 0.0) with the first step is bit-exact:
s·1.0 = s and s·0.0 + o = o for every finite s, o.

The reference has no sequential-fold surface at all (its only
stateful op is a windowed count, reference:
src/main/java/.../PageEventHandler.java:44-55); this is north-star
surface for streaming-metrics smoothing over entity event histories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma_last(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
    segment_len: int | None = None,
) -> DataFrame:
    """Per-``key`` EWMA of ``value_col`` ordered by ``order_cols``,
    reported at the last event: (key, n_events, ewma). ``order_cols``
    must form a strict total order per key (e.g. a unique event id as
    the final tiebreaker) or the fold order — and thus the float
    result — is nondeterministic."""
    if segment_len is None:
        seq = df.groupBy(key).agg(
            F.array_sort(
                F.collect_list(F.struct(*order_cols, value_col))
            ).alias("seq")
        )
        vals = F.transform(F.col("seq"), lambda s: s[value_col])
        ewma = F.aggregate(
            F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
            F.element_at(vals, 1),
            lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha),
        )
        return seq.select(
            key,
            F.size("seq").cast("int").alias("n_events"),
            ewma.alias("ewma"),
        )

    if segment_len < 1:
        raise ValueError(f"segment_len must be >= 1, got {segment_len}")

    # NULLS LAST pinned (null-sweep r11): Spark's NULLS FIRST default
    # vs DuckDB's NULLS LAST would renumber rows around an untimed
    # event and shift every downstream segment boundary
    w = Window.partitionBy(key).orderBy(
        *[F.col(c).asc_nulls_last() for c in order_cols]
    )
    numbered = df.select(key, *order_cols, value_col).select(
        key, value_col, F.row_number().over(w).alias("rn")
    )
    seg = numbered.withColumn(
        "seg_id", F.floor((F.col("rn") - 1) / F.lit(segment_len)).cast("long")
    )

    # Per-segment partial fold: ≤ segment_len structs of per-task
    # state, folded into ONE (s, o) affine. rn==1 is the constant
    # seed map (0, v); every other step is ((1-α), α·v).
    step = lambda x: F.when(  # noqa: E731
        x["rn"] == 1,
        F.struct(F.lit(0.0).alias("s"), x["v"].cast("double").alias("o")),
    ).otherwise(
        F.struct(
            F.lit(1.0 - alpha).alias("s"),
            (x["v"] * F.lit(alpha)).alias("o"),
        )
    )
    compose = lambda a, x: F.struct(  # noqa: E731
        (x["s"] * a["s"]).alias("s"), (x["s"] * a["o"] + x["o"]).alias("o")
    )
    identity = F.struct(F.lit(1.0).alias("s"), F.lit(0.0).alias("o"))
    per_seg = seg.groupBy(key, "seg_id").agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("rn"), F.col(value_col).alias("v")))
            ),
            identity,
            lambda a, x: compose(a, step(x)),
        ).alias("aff"),
        F.count(F.lit(1)).cast("int").alias("n"),
    )

    # Per-entity fold over n/L affines in segment order — tiny state,
    # and associativity means this level can itself be segmented.
    folded = per_seg.groupBy(key).agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("seg_id"), F.col("aff").alias("a")))
            ),
            identity,
            lambda acc, x: F.struct(
                (x["a"]["s"] * acc["s"]).alias("s"),
                (x["a"]["s"] * acc["o"] + x["a"]["o"]).alias("o"),
            ),
        ).alias("aff"),
        F.sum("n").cast("int").alias("n_events"),
    )
    # total scale is 0 by construction (segment 0 contains the rn==1
    # constant map), so the EWMA is the composed offset
    return folded.select(key, "n_events", F.col("aff")["o"].alias("ewma"))


def holt_linear(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Holt's linear (double-exponential) smoothing per ``key``: the
    level+trend fold

        l_i = α·v_i + (1−α)·(l_{i−1} + b_{i−1})
        b_i = β·(l_i − l_{i−1}) + (1−β)·b_{i−1}

    seeded with l₁ = v₁, b₁ = v₂ − v₁, reported at the last event as
    (key, n_events, level, trend, forecast = level + trend) — the
    one-step-ahead trending forecast EWMA cannot give (EWMA lags a
    ramp forever; Holt tracks it). Keys with fewer than 2 events are
    dropped (no trend is defined).

    Same executable shape as `ewma_last`'s exact fold: ONE shuffle
    keyed by entity, collect + array_sort, codegen'd `F.aggregate`
    with a (l, b) struct accumulator — per-task state is one entity's
    history (the step is an affine map on (l, b), so the
    segment-and-carry path `ewma_last` implements applies verbatim if
    a key's history outgrows a task). Raw-double bit parity with the
    DuckDB oracle: the oracle's list_reduce replays the identical op
    sequence in the identical order, and the duplicated l-expression
    inside the trend update recomputes to the same bits on both
    engines."""
    seq = (
        df.select(key, *order_cols, value_col)
        .groupBy(key)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(*order_cols, value_col))
            ).alias("seq")
        )
    )
    vals = F.transform(F.col("seq"), lambda s: s[value_col].cast("double"))
    a, b_ = F.lit(alpha), F.lit(beta)
    one_a, one_b = F.lit(1.0 - alpha), F.lit(1.0 - beta)
    init = F.struct(
        F.element_at(vals, 1).alias("l"),
        (F.element_at(vals, 2) - F.element_at(vals, 1)).alias("b"),
    )

    def step(acc, x):
        nl = a * x + one_a * (acc["l"] + acc["b"])
        return F.struct(
            nl.alias("l"),
            (b_ * (nl - acc["l"]) + one_b * acc["b"]).alias("b"),
        )

    # Fold from the SECOND element: the first step consumes v₂ against
    # the seed (l₁=v₁, b₁=v₂−v₁) and lands exactly on l₂ = v₂ — the
    # textbook recursion (starting at v₃ would skip the i=2 update and
    # report l=v₁ for n=2 keys).
    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))), init, step
    )
    return (
        seq.filter(F.size("seq") >= 2)
        .select(
            key,
            F.size("seq").cast("long").alias("n_events"),
            folded["l"].alias("level"),
            folded["b"].alias("trend"),
            (folded["l"] + folded["b"]).alias("forecast"),
        )
    )
