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
