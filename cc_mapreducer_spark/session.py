"""SparkSession factory.

Local-mode settings mirror what we would set on a real cluster:
  - AQE on (runtime shuffle-partition coalescing, skew-join splitting) so
    the same plan survives a 100x scale-up without re-tuning.
  - UTC session timezone so timestamp semantics match the DuckDB oracle.
  - Arrow enabled for any Pandas-UDF path (the hot paths use none).
  - shuffle.partitions sized for local[32]; on a 1000-executor cluster this
    would be executors*cores*2-ish, but AQE coalescing makes the static
    number mostly a ceiling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "cc-mapreducer-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
