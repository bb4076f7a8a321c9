"""Stream-stream join + streaming dedup: batch-equivalence over the
finite replay, cross-checked against DuckDB."""

from __future__ import annotations

from cc_mapreducer_spark.streaming.events import (
    streaming_dedup_minutely,
    streaming_view_purchase_join,
)
from tests.conftest import SF_ORACLE
from tests.oracle import compare_frames, duckdb_connection


def test_stream_stream_interval_join_matches_batch(spark):
    out = streaming_view_purchase_join(spark, SF_ORACLE).toPandas()
    con = duckdb_connection(SF_ORACLE)
    oracle = con.sql(
        """
        SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
        FROM events v JOIN events p
          ON v.event_type = 'view' AND p.event_type = 'purchase'
         AND p.user_id = v.user_id
         AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
        """
    ).df()
    assert len(out) > 0, "fixture events should produce attribution matches"
    compare_frames(out, oracle, "stream_stream_interval_join")


def test_streaming_dedup_matches_batch_distinct(spark):
    out = streaming_dedup_minutely(spark, SF_ORACLE).toPandas()
    con = duckdb_connection(SF_ORACLE)
    oracle = con.sql(
        """
        SELECT DISTINCT user_id, event_type,
               strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS minute
        FROM events
        """
    ).df()
    assert len(out) < con.sql("SELECT count(*) FROM events").fetchone()[0]
    compare_frames(out, oracle, "streaming_dedup_minutely")


def test_stream_static_enrichment_matches_batch_join(spark):
    # stateless stream-static broadcast join: the drained replay must
    # equal the plain batch join (each event enriched exactly once,
    # no join state, no watermark needed)
    from cc_mapreducer_spark.streaming.events import streaming_enriched_events

    out = streaming_enriched_events(spark, SF_ORACLE).toPandas()
    con = duckdb_connection(SF_ORACLE)
    oracle = con.sql(
        """
        SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment, c.c_name
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        """
    ).df()
    assert len(out) > 0, "fixture events should enrich against customers"
    compare_frames(out, oracle, "stream_static_enrichment")
