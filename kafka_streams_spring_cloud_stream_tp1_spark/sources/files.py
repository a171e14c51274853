"""Batch file sources beyond parquet: JSON-lines and CSV with explicit
schemas (SURVEY.md §2.2 scans row).

Schema is ALWAYS explicit — `inferSchema` costs a full extra pass over
the data (fatal at 100 TB) and guesses types non-deterministically;
the reference's schema is likewise compile-time fixed (PageEvent.java:5,
SURVEY.md §1.3). Both readers are splittable sources: JSON-lines and
(uncompressed) CSV split by byte ranges across executors. Parquet
stays the preferred format — columnar pruning and predicate pushdown
don't exist for row formats; these exist for interchange/ingest."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Read newline-delimited JSON with a fixed schema. Rows that
    don't parse land in the PERMISSIVE default's null columns rather
    than failing the job (pass mode=FAILFAST downstream if corruption
    must abort)."""
    return spark.read.schema(schema).json(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str, header: bool = True, sep: str = ","
) -> DataFrame:
    """Read CSV with a fixed schema (no inferSchema pass)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC — the other columnar interchange format (Hive-lineage
    shops). Same scan-level virtues as parquet: column pruning,
    predicate pushdown, stripe-parallel splits; the schema is read
    from the file footer (self-describing, no inference pass)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ORC (zlib default codec; splittable stripes)."""
    df.write.mode(mode).orc(path)
