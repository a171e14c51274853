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
    salt: str | None = None,
) -> DataFrame:
    """ε-differentially-private count release (Dwork et al. 2006):
    per-group counts with Laplace(sensitivity/ε) noise, the mechanism
    a governance gate applies before aggregate statistics leave the
    enclave.

    By default (``salt=None``) noise comes from a REAL random source
    — `F.rand()` with a fresh unrecorded seed, one uniform per group
    row — and the release carries the DP guarantee its ``epsilon``
    column advertises.

    Passing ``salt`` switches to the REPLAYABLE-TESTING mode: the
    uniform is the salted 60-bit `xhash` of the group key scaled to
    [0, 1), bit-reproducible across engines and runs so the DuckDB
    oracle can verify the mechanism. That mode is NOT a DP release —
    anyone holding the code and the salt can subtract the noise
    (ADVICE r07) — so it must never leave a test/oracle harness;
    production callers leave ``salt`` unset.

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
    if salt is None:
        # real randomness: evaluated on the domain-sized aggregate,
        # one draw per group, seed never surfaced
        u01 = F.rand()
    else:
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


def l_diversity_profile(
    df: DataFrame,
    qid_cols: list[Column],
    names: list[str],
    sensitive: Column,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala 2007) — the attack
    k-anonymity misses: a class can be large (k-safe) yet give the
    sensitive attribute away because every member SHARES it
    (homogeneity attack). One row per QID equivalence class with its
    size, the number of DISTINCT sensitive values, the sensitive
    Shannon entropy (the entropy-l-diversity criterion: a class can
    hold l distinct values but 99% one of them), and an `at_risk`
    flag (distinct < l).

    Two map-side-combined aggregates — (QID, sensitive) counts, then
    QID rollup — both bounded by the QID×sensitive domain product,
    never corpus-sized. The entropy divides exact BIGINT counts
    inside one fixed-order float expression (bit-identical
    cross-engine), with the round(..,4)+0.0 signed-zero guard."""
    qs = (
        df.groupBy(*[c.alias(n) for c, n in zip(qid_cols, names)], sensitive.alias("_s"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    p = F.col("c") / F.col("class_size").cast("double")
    return (
        qs.groupBy(*names)
        .agg(
            F.sum("c").cast("long").alias("class_size"),
            F.count(F.lit(1)).cast("long").alias("l_distinct"),
            # sorted fold: collect_list order is partition-arrival
            # nondeterministic; sorting pins the float summation order
            # so the oracle's identical sorted fold matches bit-for-bit
            F.array_sort(F.collect_list(F.struct("c"))).alias("_cs"),
        )
        .select(
            *names,
            "class_size",
            "l_distinct",
            (
                F.round(
                    -F.aggregate(
                        "_cs",
                        F.lit(0.0),
                        lambda acc, x: acc
                        + (x["c"] / F.col("class_size").cast("double"))
                        * F.log(x["c"] / F.col("class_size").cast("double")),
                    ),
                    4,
                )
                + F.lit(0.0)
            ).alias("sens_entropy"),
            (F.col("l_distinct") < l).alias("at_risk"),
        )
    )


def t_closeness_profile(
    df: DataFrame,
    qid_cols: list["Column"],
    names: list[str],
    sensitive: "Column",
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    attack surface l-diversity still misses: a class can hold l
    distinct sensitive values yet leak because its sensitive
    DISTRIBUTION is skewed far from the table's (e.g. 90% of one
    rare value). Per equivalence class: the Earth Mover's Distance
    between the class-conditional sensitive distribution and the
    global one, which for a categorical attribute under unit ground
    distance is the total variation distance
    ½·Σ_s |p_class(s) − p_global(s)|; at_risk = distance > t.

    Exactness: on the dense class × sensitive-value grid the distance
    is Σ_s |c_cs·N − C_s·n_c| / (2·n_c·N) — every summand an exact
    128-bit integer (cross-multiplied proportions, the
    `q_wasserstein_drift` device), so the distance ships as ONE
    division of exact integers, unrounded. Scale shape: one
    (QID, sensitive) count (the only fact-sized shuffle, map-side
    combined to the domain grid), class/global rollups of it, and a
    grid join — all domain-sized."""
    qs = df.groupBy(
        *[c.alias(n) for c, n in zip(qid_cols, names)], sensitive.alias("_s")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    cls = qs.groupBy(*names).agg(F.sum("c").cast("long").alias("class_size"))
    sens = qs.groupBy("_s").agg(F.sum("c").cast("long").alias("cs"))
    tot = qs.agg(F.sum("c").cast("long").alias("n"))
    # null-safe grid join (ADVICE r10, the chi_square_independence
    # discipline): a NULL sensitive value or NULL QID level is a
    # legitimate cell — a plain equi-join would zero its observed
    # count while cls/sens/tot still carry its mass, inflating
    # tvd/at_risk for every class containing NULLs.
    qs2 = qs.select(
        *[F.col(n).alias(f"_q_{n}") for n in names],
        F.col("_s").alias("_qs_s"),
        "c",
    )
    cond = F.col("_s").eqNullSafe(F.col("_qs_s"))
    for n in names:
        cond = cond & F.col(n).eqNullSafe(F.col(f"_q_{n}"))
    grid = (
        cls.crossJoin(F.broadcast(sens))
        .join(qs2, cond, "left")
        .select(
            *names,
            "class_size",
            "cs",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    DEC = "decimal(38,0)"
    dev = F.abs(
        F.col("c").cast(DEC) * F.col("n") - F.col("cs").cast(DEC) * F.col("class_size")
    )
    return (
        grid.crossJoin(F.broadcast(tot))
        .groupBy(*names, "class_size", "n")
        .agg(F.sum(dev).alias("dev"))
        .select(
            *names,
            "class_size",
            (
                F.col("dev").cast("double")
                / (2 * F.col("class_size").cast("double") * F.col("n"))
            ).alias("tvd"),
            (
                F.col("dev").cast("double")
                / (2 * F.col("class_size").cast("double") * F.col("n"))
                > t
            ).alias("at_risk"),
        )
    )
