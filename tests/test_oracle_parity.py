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


# anagram_groups is faithfully EMPTY at every SF: the synthetic corpus has
# no anagram pairs, and the min_group_size>1 semantics of the reference
# (/root/reference/src/index.js:104-112) make the empty answer the correct
# one — it is separately driver-hashed against the equally-empty oracle.
EMPTY_OK = {"anagram_groups"}


@pytest.mark.parametrize("name", sorted(set(registry.driver_queries()) - EMPTY_OK))
def test_driver_keys_nonempty(spark, name):
    """Row-count floor for the driver roster (VERDICT r4 item 7): every
    driver-hashed key must return >0 rows at sf0.01, so a refactor can
    never silently turn a green hash into a vacuous empty-vs-empty match
    (the round-2 lesson, enforced)."""
    assert QUERIES[name](spark, SF_ORACLE).count() > 0, (
        f"{name}: driver key returned 0 rows at sf0.01 — a hash match "
        "would be vacuous"
    )
