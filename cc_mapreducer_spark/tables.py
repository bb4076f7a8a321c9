"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

All queries read through these so scans share one code path: parquet with
explicit column pruning left to Catalyst (ReadSchema) and predicate
pushdown (PushedFilters) — verified in tests/test_plans.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
