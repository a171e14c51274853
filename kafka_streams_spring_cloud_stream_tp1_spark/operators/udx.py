"""The user-extension surface: Pandas UDF (scalar), Pandas UDAF
(grouped-agg), and Python UDTF.

The reference's extension mechanism is arbitrary Java lambdas passed
to filter/map (hanndlers/PageEventHandler.java:51-52,57) — this
engine's equivalents, in preference order:

1. Native Column expressions — JVM codegen, always first choice
   (everything in operators/{core,text,dedup}.py).
2. `pandas_udf` scalar / grouped-agg — Arrow-batched, NumPy-
   vectorized: ~10-100× row-at-a-time Python UDFs; the hot-path
   escape hatch when Columns genuinely can't express the logic.
3. `udtf` — one row in, many rows out with a fixed output schema
   (Spark's table function; runs per-row Python, use for control-
   flow-heavy expansion, not bulk throughput).

UDF objects are built lazily inside the builders (pandas_udf parses
its DDL return type against the active session, so module-level
decorators would demand a SparkContext at import time).

These concrete instances are engine features in their own right
(readability scoring, per-group weighted means, text chunking for LLM
context windows) AND the documented templates for users adding their
own.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf


def _readability(text: pd.Series) -> pd.Series:
    """Flesch-style readability proxy, vectorized pandas string ops
    (one Arrow batch per call, no per-row Python), bounded [0, 100]."""
    import numpy as np

    words = text.str.count(r"\S+").clip(lower=1)
    sents = text.str.count(r"[.!?]") + 1
    long_words = text.str.count(r"\S{7,}")
    score = 100.0 - 10.0 * (words / sents / 10.0) - 50.0 * (long_words / words)
    clipped = score.clip(lower=0.0, upper=100.0)
    # floor(x*1e4+0.5), not .round(4): pandas rounds half-to-even, SQL
    # half-away — this form is identical in both (scores are >= 0)
    return np.floor(clipped * 10000.0 + 0.5) / 10000.0


def _weighted_mean(value: pd.Series, weight: pd.Series) -> float:
    """Grouped-agg body (the UDAF analog): Σ(v·w)/Σw per group. Spark
    feeds whole group columns as Series — partial aggregation does NOT
    apply (group rows co-locate first), so prefer native aggregates
    unless the math truly needs full-group arrays."""
    den = float(weight.sum())
    return float((value * weight).sum() / den) if den else float("nan")


class ChunkDocument:
    """UDTF body: split a document into ≤``max_tokens``-word chunks
    with ``overlap`` words carried between consecutive chunks — the
    LLM context-window chunking primitive (one doc row → many chunk
    rows)."""

    def eval(self, text: str, max_tokens: int = 64, overlap: int = 8):
        if text is None:
            return
        words = text.split()
        step = max(max_tokens - overlap, 1)
        idx = 0
        for start in range(0, max(len(words) - overlap, 1), step):
            chunk = words[start : start + max_tokens]
            if not chunk:
                break
            yield idx, " ".join(chunk), len(chunk)
            idx += 1


CHUNK_SCHEMA = "chunk_idx int, chunk string, n_tokens int"


def with_readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    f = pandas_udf(_readability, "double")
    return df.select("doc_id", f(F.col(text_col)).alias("readability"))


def weighted_value_by_type(events: DataFrame) -> DataFrame:
    """Per event_type value mean weighted by user_id+1 (demo weights),
    rounded so cross-engine float summation order can't flip a digit."""
    f = pandas_udf(_weighted_mean, "double")
    return events.groupBy("event_type").agg(
        F.round(f(F.col("value"), F.col("user_id").cast("double") + 1.0), 4).alias("wmean")
    )


def chunk_documents(df: DataFrame, max_tokens: int = 64, overlap: int = 8) -> DataFrame:
    """Explode documents into overlapping chunks via the UDTF (lateral
    join keeps doc_id alongside each emitted chunk row).

    Sets ``spark.sql.execution.pythonUDTF.arrow.enabled`` defensively
    (runtime-settable; OFF by default in Spark 4): without it the
    UDTF plans as row-at-a-time pickled ``BatchEvalPythonUDTF`` —
    the audit caught exactly that — with it the same UDTF runs
    Arrow-batched (``ArrowEvalPythonUDTF``), identical results.
    Same defensive pattern as load_table's nanos shim: the external
    driver brings an untuned session."""
    df.sparkSession.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    chunker = udtf(ChunkDocument, returnType=CHUNK_SCHEMA)
    return (
        df.select("doc_id", "text")
        .lateralJoin(
            chunker(
                F.col("text").outer(),
                F.lit(max_tokens),
                F.lit(overlap),
            )
        )
        .select("doc_id", "chunk_idx", "chunk", "n_tokens")
    )
