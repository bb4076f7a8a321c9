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
    rejects by default ([PARQUET_TYPE_ILLEGAL]), or a plain
    TIMESTAMP(MICROS) (round 2+), which reads as TIMESTAMP_NTZ.

    nanosAsLong is applied ONLY when the plain read actually fails on the
    nanos type (ADVICE r2): an unconditional session-wide legacy conf
    would leak into every other parquet read, where a future INT64-nanos
    column in another table should fail loudly rather than silently
    surface as bigint. It cannot be save/restored around the read — Spark
    re-resolves the conf when an ACTION on the returned DataFrame plans,
    so the conf must outlive this call; sessions that never touch a
    nanos file (round 2+ data) now never set it."""
    path = f"{sf_dir}/events.parquet"
    try:
        df = spark.read.parquet(path)
        df.schema  # schema resolution is where the nanos type is rejected
        return df
    except Exception as ex:
        if "PARQUET_TYPE_ILLEGAL" not in str(ex):
            raise
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path)


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """Canonicalize events.ts to TIMESTAMP (ltz; session tz is pinned UTC)
    at microsecond precision — the one type every downstream operator,
    stream, and DuckDB oracle was built against. Long means nanos-as-long
    (truncate to micros, exactly how DuckDB surfaces the same column);
    anything else (TIMESTAMP_NTZ from a micros file) is a straight cast —
    same wall-clock values ONLY under a UTC session, so that invariant is
    enforced here at the cast site rather than assumed from the callers
    that happen to pin it (ADVICE r2)."""
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "")
    if tz != "UTC":
        # registry._tune_session pins UTC for every registered query; a
        # direct load_table caller on an unpinned session would otherwise
        # get silently shifted wall-clock values from the NTZ->LTZ cast.
        df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    kind = dict(df.dtypes)["ts"]
    if kind == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))
