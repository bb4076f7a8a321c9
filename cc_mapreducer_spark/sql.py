"""SQL entry point: the reference has no query language (SURVEY §1 —
one fixed dataflow); this engine exposes full Spark SQL over the table
set, so any query in this repo — and any ad-hoc one — can run as a SQL
string too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cc_mapreducer_spark.tables import TABLE_NAMES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every driver table as a temp view (same names DuckDB's
    oracle layer uses), including the events nanos->micros normalization
    from load_table."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)
