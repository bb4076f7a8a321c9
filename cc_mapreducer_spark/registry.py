"""Central query/oracle registry backing ``__spark_entry__``.

Every operator module registers its public queries here:

    @register("anagram_groups", oracle=ANAGRAM_SQL)
    def anagram_groups(spark, sf_dir) -> DataFrame: ...

``oracle`` is the equivalent DuckDB SQL (ANSI where possible) over the
driver-registered views. Column names/aliases MUST match the Spark result —
the driver sorts columns by name before value-hashing. Queries whose
semantics DuckDB cannot express (streaming state, iterative) register with
oracle=None and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}
# Keys kept out of the driver-facing roster (the driver caps its
# correctness table at 50 rows). These are still first-class queries —
# pytest's parity gate (tests/test_oracle_parity.py) checks every
# registered pair — but the driver sees their consolidated suite key
# (e.g. the nine tpch_full singles roll up into `tpch_suite_extra`).
_PYTEST_ONLY: set[str] = set()


def _tune_session(spark: SparkSession) -> None:
    """Runtime confs every query depends on, applied defensively because
    the caller (the driver) brings its own SparkSession:

    - UTC session timezone: timestamp rendering/collection must match the
      DuckDB oracle's naive-UTC timestamps or every formatted ts drifts.
    - AQE: runtime partition coalescing + skew-join splitting; the plans
      here are sized assuming it (SURVEY §4).
    """
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass  # a locked-down conf is not worth failing the query over


def register(
    name: str, oracle: Optional[str] = None, driver: bool = True
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        if not driver:
            _PYTEST_ONLY.add(name)

        def tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
            _tune_session(spark)
            return fn(spark, sf_dir)

        tuned.__name__ = getattr(fn, "__name__", name)
        tuned.__doc__ = fn.__doc__
        _QUERIES[name] = tuned
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


def driver_queries() -> dict[str, QueryFn]:
    """The ≤50-key roster the driver hash-checks (suite keys cover the
    pytest-only singles)."""
    _ensure_loaded()
    return {k: v for k, v in _QUERIES.items() if k not in _PYTEST_ONLY}


def driver_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {k: v for k, v in _ORACLES.items() if k not in _PYTEST_ONLY}


_loaded = False


def _ensure_loaded() -> None:
    """Import operator modules for their registration side effects."""
    global _loaded
    if _loaded:
        return
    import cc_mapreducer_spark.operators  # noqa: F401

    _loaded = True
