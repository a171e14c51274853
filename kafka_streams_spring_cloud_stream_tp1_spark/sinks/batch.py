"""Batch sinks and physical table layout — where 100 TB performance is
won or lost before any query runs:

- **Partitioned parquet** (`partitionBy`): directory-level partition
  pruning — a filter on the partition column skips entire directories
  at planning time (`PartitionFilters` in the scan, zero IO for
  pruned partitions). Partition by LOW-cardinality columns only
  (date, region); high-cardinality partitioning produces millions of
  tiny files and kills the driver's file listing.
- **Bucketed tables** (`bucketBy`): rows pre-hashed into a fixed
  number of buckets by join/agg key at WRITE time. Two tables
  bucketed on the same key with the same bucket count join with NO
  exchange on either side — the shuffle is paid once at write, then
  amortized over every subsequent join/agg. The metastore records the
  layout, so Catalyst plans around it automatically.
- ``max_records_per_file`` bounds output file sizes; aim for
  ~128-512 MB parquet files at scale (row-group ≈ HDFS/S3 range-read
  sweet spot) — thousands of small files cost more in listing and
  footer reads than the data itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write parquet partitioned by ``partition_cols`` (directory
    pruning) with bounded file sizes."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and sorted) table on
    ``bucket_col``: subsequent equi-joins/aggs on that key skip the
    exchange entirely (co-located by construction). ``path`` makes it
    an external table; bucketing metadata requires the table catalog
    (plain `.parquet(path)` cannot record it)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col).sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def zorder_value(cols: list, bits: int = 16):
    """Morton (Z-order) index of 2+ non-negative integer columns —
    interleave the low ``bits`` bits of each column, column 0 in the
    lowest lane. Sorting/range-partitioning a table by this value
    before writing clusters rows so that parquet row-group min/max
    stats become selective on EVERY participating column at once:
    a multi-dimensional predicate then prunes row groups where a
    single-column sort order helps only its own column (the Delta/
    Iceberg OPTIMIZE ZORDER technique, here as a plain column
    expression). Pure integer bit math — exact, engine-portable,
    codegen-friendly; no UDF.

    Requires ``bits * len(cols) <= 63``: the interleave must fit a
    signed long without touching the sign bit (a 64th bit would turn
    some z-values negative and silently break the clustering order).
    Column values >= 2**bits contribute only their low bits —
    pre-bucket wider domains before z-ordering.
    """
    from pyspark.sql import functions as F

    k = len(cols)
    if bits * k > 63:
        raise ValueError(
            f"zorder_value: bits*len(cols) = {bits * k} > 63 — the "
            f"interleaved index must fit a signed long; use bits<={63 // k} "
            f"for {k} columns or z-order fewer columns"
        )
    cexp = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cexp):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bits: int = 16,
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by the Morton index of ``zcols``:
    a range-partitioned sort on the z-value (repartitionByRange keeps
    the sort distributed — no single-task global sort), so row-group
    stats are tight on all ``zcols`` simultaneously."""
    zv = zorder_value(zcols, bits=bits)
    (
        df.withColumn("__z", zv)
        .repartitionByRange("__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
