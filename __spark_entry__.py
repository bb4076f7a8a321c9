"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over cc_mapreducer_spark.registry: every operator module
registers a (query, oracle) pair; this file just exposes them.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable no matter where the driver launches from.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cc_mapreducer_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's anagram-group pipeline over
    documents.text at sf0.001 (SURVEY.md §2, M1). Uses the
    min_group_size=1 variant because the driver's synthetic corpus has no
    anagram pairs (strict HAVING>1 result is the empty set — verified
    against the oracle as `anagram_groups`)."""
    return registry.all_queries()["anagram_groups_all"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The driver-facing roster (≤50 keys; the driver caps its correctness
    table at 50 rows). Individually-registered singles that roll up into a
    suite key are excluded here but still parity-checked by pytest
    (tests/test_oracle_parity.py iterates registry.all_queries())."""
    return registry.driver_queries()


def oracle_sql() -> dict[str, str]:
    return registry.driver_oracles()
