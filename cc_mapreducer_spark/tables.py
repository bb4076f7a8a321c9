"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

All queries read through these so scans share one code path: parquet with
explicit column pruning left to Catalyst (ReadSchema) and predicate
pushdown (PushedFilters) — verified in tests/test_plans.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# scan-width probe results keyed by the scan's file set: the answer is a
# constant per (files, session), and df.rdd.getNumPartitions() instantiates
# the RDD lineage — pay that once per table, not once per query build.
_SPREAD_NPARTS: dict[tuple[str, ...], int] = {}


def spread(df: DataFrame) -> DataFrame:
    """Widen a narrow scan before CPU-heavy per-row expression work.

    The driver's tables are single parquet files, so a scan yields one
    input split and all downstream tokenize/hash work would run on one
    core. On a real cluster a 100 TB table arrives as thousands of splits
    and this is a no-op (returns df unchanged when the scan is already at
    least as wide as the default parallelism); locally it buys scan-stage
    parallelism for the price of shuffling the (small) input."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    files = tuple(df.inputFiles())  # metadata-only (FileIndex listing)
    nparts = _SPREAD_NPARTS.get(files)
    if nparts is None:
        nparts = df.rdd.getNumPartitions()
        _SPREAD_NPARTS[files] = nparts
    if nparts < target:
        return df.repartition(target)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        return _normalize_event_ts(_read_events(spark, sf_dir))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read events.parquet tolerating either physical type the driver has
    shipped for ts: INT64 TIMESTAMP(NANOS) (round 1), which Spark's reader
    rejects by default ([PARQUET_TYPE_ILLEGAL]) — hence nanosAsLong — or a
    plain TIMESTAMP(MICROS) (round 2+), which reads as TIMESTAMP_NTZ."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """Canonicalize events.ts to TIMESTAMP (ltz; session tz is pinned UTC)
    at microsecond precision — the one type every downstream operator,
    stream, and DuckDB oracle was built against. Long means nanos-as-long
    (truncate to micros, exactly how DuckDB surfaces the same column);
    anything else (TIMESTAMP_NTZ from a micros file) is a straight cast —
    same wall-clock values under the UTC session."""
    kind = dict(df.dtypes)["ts"]
    if kind == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))
