"""Event-time windowing and sessionization over `events` (SURVEY.md §2.8).

The reference's only notion of time is its completion barrier (SURVEY
§2.6); these operators supply the event-time surface a pipeline needs:
tumbling windows, gap-based sessions, and per-user ordering — batch here,
with the streaming variants (same semantics, watermark + state store) in
cc_mapreducer_spark/streaming/events.py.

Determinism: window boundaries via date_trunc (not engine-specific window
structs), timestamps leave as formatted strings, gaps in exact integer
microseconds, value sums decimal-cast. Session derivation is the standard
lag -> new-session flag -> running count composition, identical SQL shape
in both engines.

Scale notes: everything partitions by user_id (or the window key) —
hash-uniform; a celebrity-user skew would be handled by AQE skew-join /
salting, noted per operator. State never lives on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes

# --------------------------------------------------------------------------
# tumbling / hourly windows
# --------------------------------------------------------------------------

_TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


def event_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (batch form of the streaming
    `window(ts, '1 hour')` aggregation — see streaming/events.py)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("total_value"),
    )


# --------------------------------------------------------------------------
# gap-based sessionization (lag -> flag -> cumulative session index)
# --------------------------------------------------------------------------

_SESSIONIZE_SQL = f"""
WITH ordered AS (
    SELECT user_id, event_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
), flagged AS (
    SELECT *,
           CASE WHEN prev_ts IS NULL
                  OR date_diff('microsecond', prev_ts, ts) > {SESSION_GAP_US}
                THEN 1 ELSE 0 END AS new_session
    FROM ordered
), numbered AS (
    SELECT user_id, event_id, ts, value,
           sum(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_idx
    FROM flagged
)
SELECT user_id,
       CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       date_diff('microsecond', min(ts), max(ts)) AS duration_us,
       CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, session_idx
"""


@register("event_sessionize", oracle=_SESSIONIZE_SQL)
def event_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30-min inactivity): lag over (user, time) marks
    session starts; a running sum numbers them; then per-session aggregates.
    Two window passes + one groupBy, all partitioned by user_id."""
    e = load_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_running = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(
            F.lag("ts").over(w_order).isNull()
            | (
                (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w_order)))
                > SESSION_GAP_US
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sum("new_session").over(w_running).cast("bigint").alias("session_idx"),
    )
    return numbered.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
        F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("total_value"),
    )


# --------------------------------------------------------------------------
# native session_window cross-check
# --------------------------------------------------------------------------

_SESSION_WINDOW_SQL = f"""
WITH ordered AS (
    SELECT user_id, event_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
), flagged AS (
    SELECT *,
           CASE WHEN prev_ts IS NULL
                  OR date_diff('microsecond', prev_ts, ts) > {SESSION_GAP_US}
                THEN 1 ELSE 0 END AS new_session
    FROM ordered
), numbered AS (
    SELECT user_id, event_id, ts,
           sum(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_idx
    FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       count(*) AS n_events
FROM numbered
GROUP BY user_id, session_idx
"""


def event_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in `session_window(ts, gap)` — the state-store-backed
    operator the streaming path uses — cross-checked against the DuckDB
    lag/cumsum derivation. session_window's start is the first event's ts;
    gap semantics: a new session iff the gap STRICTLY exceeds 30 min is
    matched by the oracle's `> gap` (session_window merges events within
    [ts, ts+gap])."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# per-user event ordering / funnel shape
# --------------------------------------------------------------------------

_FUNNEL_SQL = """
WITH seq AS (
    SELECT user_id, event_type, ts, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step
    FROM events
)
SELECT user_id,
       array_to_string(list(event_type ORDER BY step), '>') AS first5_path
FROM seq WHERE step <= 5
GROUP BY user_id
"""


@register("event_first5_path", oracle=_FUNNEL_SQL)
def event_first5_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's first-5-event path as a '>'-joined string (funnel
    analysis primitive): ordered collect via sort on (step) inside the
    group — array_sort on (step, event_type) structs keeps it
    deterministic without relying on collect order."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select("user_id", "event_type", F.row_number().over(w).alias("step")).filter(
        F.col("step") <= 5
    )
    return seq.groupBy("user_id").agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(step, event_type))), s -> s.event_type)"),
            ">",
        ).alias("first5_path")
    )


# --------------------------------------------------------------------------
# consolidated windowed-aggregation key (roster consolidation, round 2)
# --------------------------------------------------------------------------

# The driver records correctness for at most 50 registered keys, so the
# tumbling-window and sliding-window aggregations merge into one tagged
# key with a uniform schema (both compute the same measures). Components
# stay importable functions with their own unit tests.
_WINDOWED_AGGS_SQL = """
SELECT 'tumbling' AS kind,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 2, 3
UNION ALL
SELECT 'sliding' AS kind,
       strftime(time_bucket(INTERVAL '15 minutes', ts) - (k * INTERVAL '15 minutes'),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM events CROSS JOIN range(0, 4) t(k)
GROUP BY 2, 3
"""


@register("event_windowed_aggs", oracle=_WINDOWED_AGGS_SQL)
def event_windowed_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union of event-time window aggregations over events:

    * kind='tumbling' — 1-hour tumbling windows (date_trunc derivation).
    * kind='sliding' — 1h/15min sliding windows via Spark's window();
      each event lands in 4 windows (the oracle derives the same 4 starts
      per event from time_bucket).
    """
    e = load_table(spark, sf_dir, "events")
    measures = [
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("total_value"),
    ]
    tumbling = e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
    ).agg(*measures).select(
        F.lit("tumbling").alias("kind"), "window_start", "event_type",
        "n_events", "n_users", "total_value",
    )
    sliding = e.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type").agg(
        *measures
    ).select(
        F.lit("sliding").alias("kind"),
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "n_users",
        "total_value",
    )
    return tumbling.unionAll(sliding)


# --------------------------------------------------------------------------
# cohort retention (driver=False — roster cap; full oracle)
# --------------------------------------------------------------------------

_COHORT_SQL = """
WITH firsts AS (
    SELECT user_id, time_bucket(INTERVAL '1 day', min(ts)) AS cohort_day
    FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT e.user_id, f.cohort_day,
           CAST(date_diff('day', f.cohort_day,
                          time_bucket(INTERVAL '1 day', e.ts)) AS BIGINT) AS day_n
    FROM events e JOIN firsts f USING (user_id)
), sizes AS (
    SELECT cohort_day, count(*) AS cohort_size FROM firsts GROUP BY cohort_day
)
SELECT strftime(a.cohort_day, '%Y-%m-%d') AS cohort_day,
       a.day_n,
       count(*) AS n_active,
       s.cohort_size,
       round(count(*) / CAST(s.cohort_size AS DOUBLE), 6) AS retention
FROM activity a JOIN sizes s USING (cohort_day)
GROUP BY a.cohort_day, a.day_n, s.cohort_size
"""


@register("cohort_retention", oracle=_COHORT_SQL, driver=False)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, then for
    each later day the fraction of the cohort still active — the
    standard growth-analytics triangle.

    Two aggregations over events (first-touch per user; distinct active
    days per user), both keyed on user_id so they share one Exchange
    pattern; the cohort-size table is tiny and broadcasts into the
    final rollup. The retention ratio is one integer division on a 6dp
    grid."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day"))
            .cast("bigint")
            .alias("day_n"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        activity.groupBy("cohort_day", "day_n")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_n",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
    )


# --------------------------------------------------------------------------
# rolling z-score anomaly detection (driver=False — roster cap; full oracle)
# --------------------------------------------------------------------------

_ANOM_WIN = 20   # trailing baseline rows (current row excluded)
_ANOM_MIN = 5    # minimum baseline rows before scoring
_ANOM_Z = 2.0

_ANOMALY_SQL = f"""
WITH framed AS (
    SELECT event_id, user_id, event_type, value,
           count(value) OVER w AS n,
           sum(value) OVER w AS s1,
           sum(value * value) OVER w AS s2
    FROM events
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id
                 ROWS BETWEEN {_ANOM_WIN} PRECEDING AND 1 PRECEDING)
), scored AS (
    SELECT event_id, user_id, event_type, value, n,
           (s2 - s1 * s1 / n) / (n - 1) AS var
    , s1 / n AS mean
    FROM framed WHERE n >= {_ANOM_MIN}
)
SELECT event_id, user_id, event_type, value,
       round((value - mean) / sqrt(var), 6) AS zscore
FROM scored
WHERE var > 0 AND abs(round((value - mean) / sqrt(var), 6)) > {_ANOM_Z}
"""


@register("event_anomalies", oracle=_ANOMALY_SQL, driver=False)
def event_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags: each event's value scored against
    the trailing _ANOM_WIN(=20)-row baseline of its (user, event_type)
    stream — the streaming-metrics outlier gate, as ONE window pass.

    The baseline frame EXCLUDES the current row (an outlier must not
    dilute its own baseline) and needs >= _ANOM_MIN(=5) prior rows.
    Moments are computed explicitly from windowed sum / sum-of-squares
    with the identical formula in both engines — built-in stddev
    implementations (Welford vs sum-of-squares) are NOT cross-engine
    bit-stable, the explicit form is; the 6dp grid absorbs sliding-
    window summation-order ulps. One Exchange on (user_id, event_type).
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-_ANOM_WIN, -1)
    )
    framed = e.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.count("value").over(w).alias("n"),
        F.sum("value").over(w).alias("s1"),
        F.sum(F.col("value") * F.col("value")).over(w).alias("s2"),
    ).filter(F.col("n") >= _ANOM_MIN)
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (
        F.col("n") - 1
    )
    z = F.round((F.col("value") - mean) / F.sqrt(var), 6)
    return framed.filter(var > 0).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        z.alias("zscore"),
    ).filter(F.abs(F.col("zscore")) > _ANOM_Z)


# --------------------------------------------------------------------------
# strict ordered funnel (driver=False — roster cap; full oracle)
# --------------------------------------------------------------------------

_FUNNEL_STEPS = ("view", "click", "purchase")

_FUNNEL_CASE = (
    "CASE "
    + " ".join(
        f"WHEN acc = '{i}' AND t = '{step}' THEN '{i + 1}'"
        for i, step in enumerate(_FUNNEL_STEPS)
    )
    + " ELSE acc END"
)

_ORDERED_FUNNEL_SQL = f"""
WITH seq AS (
    SELECT user_id,
           array_agg(event_type ORDER BY ts, event_id) AS types
    FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(types) AS BIGINT) AS n_events,
       CAST(list_reduce(list_prepend('0', types),
                        (acc, t) -> {_FUNNEL_CASE}) AS BIGINT) AS funnel_stage,
       list_reduce(list_prepend('0', types),
                   (acc, t) -> {_FUNNEL_CASE}) = '{len(_FUNNEL_STEPS)}'
         AS converted
FROM seq
"""


@register("ordered_funnel", oracle=_ORDERED_FUNNEL_SQL, driver=False)
def ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered-funnel conversion: how far each user progressed
    through view -> click -> purchase IN ORDER (later steps only count
    after all earlier ones; interleaved other events are fine) — the
    product-analytics question event_first5_path's raw paths don't
    answer directly.

    The stage is a left fold over the user's time-ordered event types —
    a tiny deterministic state machine expressed with the built-in
    `aggregate` HOF in Spark and `list_reduce` in DuckDB, the SAME CASE
    transition table generated from one Python source for both engines.
    ONE shuffle (the per-user collect); the fold runs at scan speed."""
    e = load_table(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, event_type))),"
            " x -> x.event_type)"
        ).alias("types")
    )
    fold = (
        "aggregate(types, '0', (acc, t) -> " + _FUNNEL_CASE + ")"
    )
    return seq.select(
        "user_id",
        F.size("types").cast("bigint").alias("n_events"),
        F.expr(fold).cast("bigint").alias("funnel_stage"),
        (F.expr(fold) == str(len(_FUNNEL_STEPS))).alias("converted"),
    )
