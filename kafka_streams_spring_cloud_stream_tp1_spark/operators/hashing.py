"""Cross-engine deterministic hashing.

The dedup/fingerprint operators need a hash that the DuckDB oracle can
reproduce bit-for-bit. Spark's `xxhash64`/`hash` and DuckDB's `hash`
are different algorithms, so we derive a 60-bit non-negative integer
from the md5 hex digest — md5 is identical everywhere:

    Spark :  CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
    DuckDB:  CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)

15 hex chars = 60 bits < 2^63, so the value is positive and XOR/shift
arithmetic on it stays inside BIGINT on both engines. MinHash
"permutations" are XOR masks (h XOR m_i) — overflow-free, order-
preserving-free (as required), and exactly reproducible in SQL,
unlike (a*h + b) mod p which overflows 64-bit multiplication.

Scale note: md5-via-hex costs more per row than xxhash64, but these
hashes are computed once per token/shingle inside a whole-stage-codegen
projection — still JVM-side, no Python. For a production deployment
where oracle parity is not needed, flip the one-line config
``SPARK_GRAFT_HASH=xxhash64`` (read per call; materialized shared_df
intermediates key on the lane so a mid-session flip can never mix
md5-built pair tables with xxhash64-built consumers; measured in
BASELINE.md §"Production-hash lane"): same 60-bit non-negative contract (xxhash64
masked to 60 bits), so every downstream XOR-mask/band construction is
unchanged — only oracle value-parity is given up.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60


def xhash(col: Column | str) -> Column:
    """60-bit deterministic hash of a string column (Spark side).

    Default lane is md5-hex (DuckDB-reproducible, oracle parity);
    ``SPARK_GRAFT_HASH=xxhash64`` switches to the cheaper native
    xxhash64 masked to the same non-negative 60-bit domain."""
    c = F.col(col) if isinstance(col, str) else col
    if os.environ.get("SPARK_GRAFT_HASH", "md5") == "xxhash64":
        return F.xxhash64(c).bitwiseAND(F.lit((1 << HASH_BITS) - 1))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def xhash_sql(expr: str) -> str:
    """The identical hash as DuckDB SQL over expression ``expr``."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def fan_out(df, key: str = "doc_id"):
    """Hash-repartition on ``key`` before CPU-heavy per-row operators.

    Tiny fixture files are a single parquet row-group → ONE input
    split, so without this every downstream array/higher-order-function
    expression runs on one core. The partition count is EXPLICIT
    (AQE honors user-specified counts) because AQE's size-based
    coalescing would merge a few-MB exchange back to one partition —
    it can't see that the post-exchange projection is CPU-bound, not
    IO-bound. Keyed repartition stays deterministic (hash, not
    round-robin).

    Conditional: a real 100 TB scan arrives in thousands of splits
    already — inserting an Exchange there would shuffle the full raw
    text for a projection that needs no co-location. Repartition ONLY
    when the input has fewer partitions than the target; otherwise
    return the input untouched (no Exchange in the plan)."""
    from pyspark.sql import functions as F  # local: avoid cycle at import

    if df.isStreaming:
        # no .rdd on unbounded frames; micro-batch sizing is the
        # trigger's job, not a static repartition's
        return df
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, F.col(key))


def perm_masks(k: int, salt: str = "perm") -> list[int]:
    """k deterministic XOR masks (the MinHash 'permutations'), derived
    the same way as `xhash` so they are plain literals in both engines."""
    return [int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:15], 16) for i in range(k)]
