"""Public Column-function API: the engine's reusable expression
vocabulary, importable as

    from kafka_streams_spring_cloud_stream_tp1_spark import functions as EF

Everything here is a pure Column -> Column builder (JVM-side,
codegen-friendly) usable in any select/filter/agg — the counterpart of
`pyspark.sql.functions` for this engine's domain: deterministic
cross-engine hashing, tokenization/shingling, vector math, and the
window-bucketing helpers the reference's topology is built from.
"""

from ..operators.hashing import perm_masks, xhash, xhash_sql  # noqa: F401
from ..operators.similarity import as_double, dot, l2_norm  # noqa: F401
from ..operators.text import (  # noqa: F401
    BPE_TOKEN_RE,
    STOPWORDS_EN,
    stopword_ratio,
    tokens,
    word_ngrams,
)

from pyspark.sql import Column
from pyspark.sql import functions as F


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (double math)."""
    ad, bd = as_double(a), as_double(b)
    return dot(ad, bd) / (l2_norm(ad) * l2_norm(bd))


def time_bucket(ts: Column | str, width: str = "5 seconds") -> Column:
    """Epoch-aligned tumbling bucket START for a timestamp — the batch
    analog of F.window(ts, width).start (reference windowing:
    hanndlers/PageEventHandler.java:54 buckets to 5 s boundaries)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.window(c, width)["start"]
