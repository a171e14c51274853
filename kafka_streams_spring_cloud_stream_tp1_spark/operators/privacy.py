"""Privacy / governance operators: k-anonymity profiling.

After a pipeline scrubs direct identifiers (see `q_redact_pii`, a
pure regex projection in plans/llm_queries.py), the release gate
still has to audit how re-identifiable the remaining
quasi-identifiers leave each record — k-anonymity (Sweeney 2002).
The profile is ONE keyed aggregate, no Python, no windows, no joins,
so it scales as a map-side-combined pass over the corpus.

The reference system (kafka-streams-spring-cloud-stream-tp1) carries
no document surface at all (its one value type is PageEvent,
src/main/java/.../PageEvent.java); this module is north-star
pipeline-governance surface over the `documents` table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_profile(
    df: DataFrame, qid_cols: list[Column], names: list[str], k: int = 5
) -> DataFrame:
    """Equivalence-class profile over the quasi-identifier columns:
    one row per class with its size and an `at_risk` flag (size < k)
    — the k-anonymity audit (Sweeney 2002) a release gate reads to
    decide which cells need generalization or suppression.

    One map-side-combined groupBy on the QID tuple; class count is
    bounded by the QID domain product, so the shuffle is domain-sized
    regardless of corpus size."""
    return (
        df.groupBy(*[c.alias(n) for c, n in zip(qid_cols, names)])
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
        .select(*names, "class_size", (F.col("class_size") < k).alias("at_risk"))
    )


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    sensitivity: float = 1.0,
    salt: str = "dp-v1",
) -> DataFrame:
    """ε-differentially-private count release (Dwork et al. 2006):
    per-group counts with Laplace(sensitivity/ε) noise, the mechanism
    a governance gate applies before aggregate statistics leave the
    enclave. Noise is drawn by inverse-CDF from a DETERMINISTIC
    uniform — the salted 60-bit `xhash` of the group key scaled to
    [0, 1) — so the release is reproducible across engines and runs
    for the oracle harness; swap ``salt`` per release epoch to
    re-draw (a production deployment would use a real RNG per
    release — determinism here is the oracle-parity device, the
    mechanism is unchanged).

    Inverse CDF: U = u01 − ½ ∈ (−½, ½),
    noise = −(s/ε)·sgn(U)·ln(1 − 2|U|), with the log argument
    clamped to 2⁻⁶⁰ (the hash's own resolution) so u01 = 0 cannot
    produce ±inf. The ln is libm — last-ulp engine differences are
    absorbed by the round(4) convention.

    Plan: ONE map-side-combined groupBy (domain-sized output) and a
    per-row codegen'd expression — scale-flat. Output:
    (``group_col``, noisy_count, epsilon)."""
    from .hashing import xhash

    b = sensitivity / epsilon
    u01 = xhash(F.concat(F.col(group_col), F.lit("|" + salt))) / F.lit(
        float(1 << 60)
    )
    u = u01 - F.lit(0.5)
    noise = (
        F.lit(-b)
        * F.signum(u)
        * F.log(F.greatest(F.lit(1.0) - 2 * F.abs(u), F.lit(2.0 ** -60)))
    )
    return (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            group_col,
            (F.round(F.col("n") + noise, 4) + F.lit(0.0)).alias("noisy_count"),
            F.lit(float(epsilon)).alias("epsilon"),
        )
    )
