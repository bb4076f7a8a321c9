"""Every registered (query, oracle) pair must match on sf0.01 — the local
replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from cc_mapreducer_spark import registry
from tests.conftest import SF_ORACLE
from tests.oracle import compare_frames, duckdb_connection

QUERIES = registry.all_queries()
ORACLES = registry.all_oracles()


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    spark_pdf = QUERIES[name](spark, SF_ORACLE).toPandas()
    oracle_pdf = duck.sql(ORACLES[name]).df()
    compare_frames(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Queries without an oracle still must run and return a stable schema."""
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.columns
    assert df.count() >= 0
