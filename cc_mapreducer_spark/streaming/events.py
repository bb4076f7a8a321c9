"""Structured Streaming variants of the event operators (SURVEY.md §2.8).

The reference uses Pub/Sub purely as a control-plane trigger bus (messages
carry file pointers, never rows — SURVEY §2.7 "Streaming: none"); the
streaming surface a real pipeline needs is event-time processing over a
data stream. Here the driver's events parquet plays the stream via the
file source (`readStream` + availableNow trigger), exercising the actual
streaming machinery: incremental file discovery, event-time windows,
watermarks, and the session-window state store.

Batch equivalence is the test strategy (SURVEY §7 hard-part d): the
tumbling aggregation runs in `complete` output mode so its final result
equals the batch/DuckDB oracle exactly; the watermarked session query runs
in `append` mode, whose emitted rows are by design the watermark-closed
subset of the batch sessions — asserted as such in tests, registered
rows-only for the driver.

Scale notes: the same code targets Kafka by swapping the source; state
(session windows) is partitioned by the grouping key across executors —
nothing accumulates on the driver; memory-sink collection here is
test-scale only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.registry import register

_SINK_SEQ = 0

# One staging dir per events file, reused across invocations and removed at
# interpreter exit — repeated query runs must not leak temp dirs (ADVICE r1).
_STAGE_DIRS: dict[str, str] = {}

# Schema per (session, resolved events file): constant per file, so don't
# rebuild a batch DataFrame (parquet footer read) for every streaming
# query (ADVICE r2 — streaming_view_purchase_join builds two streams per
# run). Keyed by applicationId too: the schema for an INT64-nanos file is
# only readable because _read_events set the nanosAsLong conf on THAT
# session — a fresh session in the same process must re-derive it so the
# conf is re-applied, not inherit a schema its confs can't execute.
_SCHEMAS: dict[tuple[str, str], object] = {}


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet. ts normalization is
    shared with the batch path (tables._normalize_event_ts), tolerating
    both physical types the driver has shipped (INT64 nanos / micros).

    The file source requires a DIRECTORY; the driver ships a single
    parquet file, so stage a temp dir with a symlink to it (cached per
    source file, cleaned up via atexit)."""
    import atexit
    import os
    import shutil
    import tempfile

    from cc_mapreducer_spark.tables import _normalize_event_ts, _read_events

    path = os.path.abspath(f"{sf_dir}/events.parquet")
    app = spark.sparkContext.applicationId
    for k in [k for k in _SCHEMAS if k[0] != app]:  # evict stopped sessions
        del _SCHEMAS[k]
    schema_key = (app, path)
    schema = _SCHEMAS.get(schema_key)
    if schema is None:
        schema = _read_events(spark, sf_dir).schema
        _SCHEMAS[schema_key] = schema
    stage_dir = _STAGE_DIRS.get(path)
    if stage_dir is None:
        stage_dir = tempfile.mkdtemp(prefix="cc_mr_spark_stream_")
        os.symlink(path, os.path.join(stage_dir, "events.parquet"))
        _STAGE_DIRS[path] = stage_dir
        atexit.register(shutil.rmtree, stage_dir, ignore_errors=True)
    stream = spark.readStream.schema(schema).parquet(stage_dir)
    return _normalize_event_ts(stream)


def _run_to_memory(agg: DataFrame, mode: str) -> DataFrame:
    """Execute a streaming aggregation to completion (availableNow) into a
    memory sink; return the final table."""
    global _SINK_SEQ
    _SINK_SEQ += 1
    name = f"stream_sink_{_SINK_SEQ}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return agg.sparkSession.table(name)


# Same oracle as the batch event_tumbling_hourly: complete-mode streaming
# over a finite source must converge to the batch answer.
_TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


def streaming_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows computed BY THE STREAMING ENGINE (file
    source -> window() aggregation -> complete mode -> memory sink), then
    returned as a batch DataFrame. Result must equal the batch oracle —
    the batch-equivalence check for the streaming path."""
    stream = _events_stream(spark, sf_dir)
    agg = stream.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("total_value"),
    )
    result = _run_to_memory(agg, "complete")
    return result.select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


# Same oracle as the batch event_sliding_windows (time_bucket derivation).
_SLIDING_SQL = """
SELECT strftime(time_bucket(INTERVAL '15 minutes', ts) - (k * INTERVAL '15 minutes'),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events
FROM events CROSS JOIN range(0, 4) t(k)
GROUP BY 1, 2
"""


def streaming_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h/15min sliding windows computed by the streaming engine in
    complete mode — converges to the batch/DuckDB answer over the finite
    replay, like streaming_tumbling_hourly."""
    stream = _events_stream(spark, sf_dir)
    agg = stream.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type").agg(
        F.count("*").alias("n_events")
    )
    result = _run_to_memory(agg, "complete")
    return result.select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
    )


# Roster consolidation (round 2): the driver records correctness for at
# most 50 registered keys, so the two complete-mode streaming window
# aggregations merge into one tagged key. Each component still runs as its
# own streaming query (separate source -> sink lifecycles); the merged
# DataFrame unions their final memory-sink tables. Components stay
# importable functions with their own unit tests.
_STREAMING_WINDOWS_SQL = """
SELECT 'tumbling' AS kind,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 2, 3
UNION ALL
SELECT 'sliding' AS kind,
       strftime(time_bucket(INTERVAL '15 minutes', ts) - (k * INTERVAL '15 minutes'),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(NULL AS DOUBLE) AS total_value
FROM events CROSS JOIN range(0, 4) t(k)
GROUP BY 2, 3
"""


@register("streaming_windows", oracle=_STREAMING_WINDOWS_SQL)
def streaming_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union of the streaming window aggregations (both computed BY
    THE STREAMING ENGINE, complete mode over a finite replay — each must
    converge to the batch/DuckDB answer):

    * kind='tumbling' — 1-hour windows with event counts and value sums.
    * kind='sliding' — 1h/15min windows (counts only; total_value NULL).
    """
    tumbling = streaming_tumbling_hourly(spark, sf_dir).select(
        F.lit("tumbling").alias("kind"), "window_start", "event_type",
        "n_events", "total_value",
    )
    sliding = streaming_sliding_windows(spark, sf_dir).select(
        F.lit("sliding").alias("kind"), "window_start", "event_type",
        "n_events", F.lit(None).cast("double").alias("total_value"),
    )
    return tumbling.unionAll(sliding)


# Append-mode emission over a finite replay is deterministic (VERDICT r2
# item 4): the file source delivers the whole file in one micro-batch, the
# watermark then advances to max(ts) - 1h, and the closing empty batch
# emits exactly the sessions whose window end (last event + 30-min gap)
# is <= that final watermark — boundary semantics verified empirically: a
# session ending exactly AT the watermark IS emitted (<=, not <). So the
# oracle is the batch gap-sessionization plus that cutoff predicate.
_SESSIONIZE_WM_SQL = """
WITH ordered AS (
    SELECT user_id, event_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
), flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN prev_ts IS NULL
                  OR date_diff('microsecond', prev_ts, ts) > 1800000000
                THEN 1 ELSE 0 END AS new_session
    FROM ordered
), numbered AS (
    SELECT user_id, ts,
           sum(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_idx
    FROM flagged
), sess AS (
    SELECT user_id, min(ts) AS s_start, max(ts) AS s_end, count(*) AS n_events
    FROM numbered GROUP BY user_id, session_idx
), wm AS (
    -- Spark's EventTimeStats tracks event time in whole MILLISECONDS
    -- (eventTime/1000, floor), so the engine's watermark is
    -- floor_ms(max ts) - delay, not the exact-microsecond max. A session
    -- closing inside the sub-ms gap would be emitted by an exact oracle
    -- but withheld by Spark.
    SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 1 HOUR AS w FROM events
)
SELECT user_id,
       strftime(s_start, '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       n_events
FROM sess, wm
WHERE s_end + INTERVAL 30 MINUTE <= w
"""


@register("streaming_sessionize_watermarked", oracle=_SESSIONIZE_WM_SQL)
def streaming_sessionize_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked session windows (30-min gap, 1-hour late-data bound) in
    append mode — the real streaming-sessionization operator with state
    store + watermark eviction. Over a finite replay the emitted set is
    exactly the watermark-closed subset of the batch sessions, so the
    DuckDB oracle is the batch sessionization plus the final-watermark
    cutoff (see _SESSIONIZE_WM_SQL) — hash-checked, with the state-store
    path still doing the real work on the Spark side."""
    stream = _events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = stream.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count("*").alias("n_events")
    )
    result = _run_to_memory(agg, "append")
    return result.select(
        "user_id",
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        "n_events",
    )


def streaming_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each 'view' joins the same user's
    'purchase' events landing within the following hour — the canonical
    attribution join, run with real join-state machinery (two watermarked
    streams, symmetric state stores keyed by user_id, time-bound state
    eviction).

    The one-hour bound in the join condition is what makes this scale:
    it lets the engine evict buffered rows once the watermark passes
    view_ts + 1h, so state is O(events per hour), not O(stream). Inner
    join in append mode emits each match exactly once; over a finite
    replay the result equals the batch interval join (asserted against a
    DuckDB oracle in tests)."""
    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("user_id", "view_id", "purchase_id")
    return _run_to_memory(joined, "append")


def streaming_dedup_minutely(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming deduplication: first event per (user_id,
    event_type, minute) via dropDuplicates over a watermarked stream —
    the streaming form of exactly-once event dedup. State holds one key
    per distinct tuple and the watermark bounds it to the late-data
    horizon. Over a finite replay the kept-key set equals batch
    DISTINCT (asserted in tests)."""
    # Watermark AFTER the projection, on the surviving event-time column:
    # date_trunc's output does not inherit the eventTime metadata a
    # pre-projection withWatermark("ts", ...) attached, so the dedup
    # state would never be evicted on an unbounded stream (verified:
    # keyed.schema["minute"].metadata comes back empty the other way).
    keyed = _events_stream(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.date_trunc("minute", "ts").alias("minute"),
    ).withWatermark("minute", "1 hour")
    deduped = keyed.dropDuplicates(["user_id", "event_type", "minute"])
    result = _run_to_memory(deduped, "append")
    return result.select(
        "user_id",
        "event_type",
        F.date_format("minute", "yyyy-MM-dd HH:mm:ss").alias("minute"),
    )


def stream_events_to_partitioned_parquet(
    spark: SparkSession, sf_dir: str, out_path: str, checkpoint_path: str
) -> None:
    """Exactly-once file sink via foreachBatch + dynamic partition
    overwrite, partitioned by (event_date, batch_id): re-processing a
    batch after a failure rewrites exactly that batch's partitions and
    converges to the same files instead of appending duplicates —
    idempotence IS the exactly-once guarantee for object-store sinks.
    The checkpoint dir carries source progress; the partition overwrite
    carries sink atomicity.

    batch_id MUST be a partition column: dynamic overwrite keyed on
    event_date alone is idempotent only for re-running the SAME batch —
    when one date spans several micro-batches, a later batch would
    silently REPLACE the earlier batches' rows for that date. Scoping
    every partition to its writing batch makes the overwrite per-batch
    idempotent and cross-batch append-safe; readers still prune on the
    leading event_date directory."""

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            df.withColumn("event_date", F.to_date("ts"))
            .withColumn("batch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .partitionBy("event_date", "batch_id")
            .parquet(out_path)
        )

    q = (
        _events_stream(spark, sf_dir)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --------------------------------------------------------------------------
# stream-static enrichment join
# --------------------------------------------------------------------------

_ENRICH_SQL = """
SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment, c.c_name
FROM events e JOIN customer c ON e.user_id = c.c_custkey
"""


@register("streaming_enriched_events", oracle=_ENRICH_SQL, driver=False)
def streaming_enriched_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: each event micro-batch joins the static
    customer dimension — the canonical streaming lookup-join. The static
    side is broadcast (hinted; dimension tables are the small side by
    definition), so every micro-batch is a map-side hash join with ZERO
    join state in the state store — unlike the stream-stream interval
    join above, nothing is buffered and nothing needs watermark
    eviction; Spark re-plans the static side per batch, which is also
    what picks up dimension updates between batches at no extra cost.
    Stateless inner join in append mode emits each enriched event
    exactly once, so the finite replay equals the batch join — the
    DuckDB oracle states it directly."""
    from cc_mapreducer_spark.tables import load_table

    customers = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), "c_mktsegment", "c_name"
    )
    enriched = (
        _events_stream(spark, sf_dir)
        .join(F.broadcast(customers), F.col("user_id") == F.col("c_custkey"))
        .select("event_id", "user_id", "event_type", "c_mktsegment", "c_name")
    )
    return _run_to_memory(enriched, "append")
