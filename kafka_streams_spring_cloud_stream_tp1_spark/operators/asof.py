"""As-of (point-in-time) join — the time-series primitive Spark lacks
natively (SURVEY.md §2.2 joins row; pandas merge_asof / DuckDB ASOF
JOIN / kdb aj equivalent).

For each left row, attach the most recent right row with the same key
whose timestamp is ≤ the left timestamp. The naive formulation —
range-join then max_by — materializes every (left, prior-right) match
pair: O(|L|·avg prior rights) rows, quadratic on long histories. The
scalable plan used here is the classic union-merge:

    1. tag left and right rows, union them into one stream
    2. one hash partition by key + sort by (ts, side)  ← the ONLY
       shuffle; right rows sort before left at equal ts, giving ≤
       (at-or-before) semantics
    3. running last_value(right payload, ignorenulls) carries the
       latest right row forward; filter back to left rows

Cost is sort-merge: one exchange of |L|+|R| rows, no pair blowup —
the same shape Spark plans for a sort-merge join, which is why this
scales to 100 TB histories. The DuckDB oracle uses its NATIVE ASOF
LEFT JOIN, so the two implementations cross-validate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: every left row, plus ``payload_cols`` from the
    latest right row with matching key and right_ts ≤ left_ts (nulls
    when no prior right row exists). Right side must be unique per
    (key, ts) — dedupe upstream if not, or the carried row is
    tie-ambiguous. ``payload_cols`` must not collide with left-side
    column names — the output carries both sets side by side, so a
    collision would produce two identically-named columns that only
    blow up downstream; rejected eagerly here instead.

    NULL-time contract (null-sweep r11): a right row with UNKNOWN time
    can never be "the most recent prior" — it is dropped here (left
    in, it would sort NULLS-FIRST ahead of every timed row and become
    a phantom fallback fill for left rows with no real prior). A left
    row with unknown time keeps its row with NULL payload: NULLS FIRST
    parks it before every timed right row, so its fill prefix is
    empty. DuckDB's native ASOF instead hands a NULL-ts probe the
    NEWEST right row — oracles must split untimed probes out."""
    right = right.filter(F.col(right_ts).isNotNull())
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join payload_cols {sorted(clash)} collide with left-side columns; "
            "alias the right-side payload (or the left columns) before joining"
        )
    lcols = left.columns
    l_tagged = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
    )
    r_tagged = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    # right rows order before left rows at equal __t → "at or before";
    # nulls_first pins untimed LEFT rows ahead of every timed right
    # row (empty fill prefix → NULL payload, see the NULL contract)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc_nulls_first(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(F.col(f"__p_{c}"), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in payload_cols
        ],
    )
    return merged.filter(F.col("__is_left") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__f_{c}").alias(c) for c in payload_cols],
    )
