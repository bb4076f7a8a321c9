"""The SQL-string surface: ad-hoc Spark SQL over the registered views
must agree with the DataFrame operators and the DuckDB oracle."""

from __future__ import annotations

from cc_mapreducer_spark import registry
from cc_mapreducer_spark.sql import sql
from tests.conftest import SF_ORACLE


def test_sql_matches_dataframe_q1(spark):
    df_rows = sorted(
        map(tuple, registry.all_queries()["q1_pricing_summary"](spark, SF_ORACLE).collect())
    )
    sql_rows = sorted(
        map(
            tuple,
            sql(
                spark,
                SF_ORACLE,
                """
                SELECT l_returnflag, l_linestatus,
                       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
                       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
                       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
                       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
                                * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
                       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
                       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
                       CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_disc,
                       count(*) AS count_order
                FROM lineitem
                WHERE l_shipdate <= TIMESTAMP '1998-09-02'
                GROUP BY l_returnflag, l_linestatus
                """,
            ).collect(),
        )
    )
    assert df_rows == sql_rows


def test_sql_anagram_pipeline_pure_sql(spark):
    """The reference's whole dataflow as ONE SQL string over the views."""
    rows = sql(
        spark,
        SF_ORACLE,
        """
        WITH toks AS (
            SELECT explode(split(regexp_replace(lower(text), '[^a-z]+', ' '), ' ')) AS word
            FROM documents
        ), words AS (
            SELECT word FROM toks WHERE length(word) > 1
        ), pairs AS (
            SELECT array_join(array_sort(split(word, '')), '') AS signature, word FROM words
        )
        SELECT signature, array_sort(collect_set(word)) AS ws
        FROM pairs GROUP BY signature
        """,
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert all("".join(sorted(w)) == r.signature for w in r.ws)


def test_sql_events_view_has_normalized_ts(spark):
    row = sql(spark, SF_ORACLE, "SELECT ts FROM events LIMIT 1").schema["ts"]
    assert "timestamp" in row.dataType.simpleString()


def test_query_views_join_base_tables(spark):
    from cc_mapreducer_spark.sql import register_query_views, sql
    from tests.conftest import SF_ORACLE

    registered = register_query_views(
        spark, SF_ORACLE, names=["cdc_snapshot", "text_profile"]
    )
    assert registered == ["cdc_snapshot", "text_profile"]
    # a derived view joins a base view in plain SQL
    df = sql(
        spark,
        SF_ORACLE,
        """
        SELECT s.user_id, count(*) AS n_live_items,
               count(DISTINCT e.event_id) AS n_events
        FROM cdc_snapshot s JOIN events e USING (user_id)
        GROUP BY s.user_id
        """,
    )
    rows = df.collect()
    assert rows and all(r["n_live_items"] >= 1 for r in rows)
