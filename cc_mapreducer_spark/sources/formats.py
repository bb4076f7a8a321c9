"""File-format support beyond parquet (SURVEY §2.1 notes the reference is
plain-text-only; a usable engine needs the standard interchange formats).

CSV and JSON (line-delimited) readers/writers with explicit schemas —
schema inference is a convenience for exploration only; at 100 TB an
inference pass is a full extra scan, so production reads always pass the
schema (and get header/partition handling for free from the file source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.option("header", True).schema(schema).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC with zstd: the other columnar format a shared 100 TB lake
    actually contains (Hive/Trino heritage). Spark's ORC reader does the
    same predicate pushdown / column pruning as parquet, so every
    operator here runs unchanged over ORC tables."""
    df.write.mode("overwrite").option("compression", "zstd").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    # columnar + self-describing: no schema argument needed (unlike
    # CSV/JSONL where schema-on-read would cost an inference scan)
    return spark.read.orc(path)


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files were written under EVOLVING
    schemas (a long-lived ingest adds columns over time). mergeSchema
    unions the per-file footers: files predating a column surface NULLs
    for it, so consumers keep one logical schema across years of files.

    Cost note: schema merging reads every file footer at planning time —
    fine for a table's worth of files, wrong as a default (Spark's
    default off is deliberate). At 100 TB, pin the merged schema in a
    metastore and pass it explicitly; this helper is the
    migration-window form."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_parquet_tolerant(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory skipping corrupt files (truncated
    uploads, partial writes from dead executors). At 100 TB some file
    WILL be damaged; the default fail-fast read turns one bad file into
    a dead pipeline. Scoped via DataFrameReader option — not the
    session-wide conf, which would silently mask corruption for every
    other read in the session (the nanosAsLong lesson from ADVICE r2).

    Use for salvage/quarantine jobs; production tables pair this with a
    dq_checks row-count reconciliation so silent data loss is loud."""
    return spark.read.option("ignoreCorruptFiles", "true").parquet(path)
