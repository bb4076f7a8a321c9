"""Custom stateful per-group operator via applyInPandas (SURVEY §2.7 UDF
story: built-ins first; this is the documented escape hatch for semantics
no built-in expresses).

Time-decayed EMA is genuinely recursive — ema_i depends on ema_{i-1} with
a data-dependent decay factor exp(-dt/tau) — so no SQL window/aggregate
can express it (SQL recursion over ordered rows would need a recursive CTE
keyed per group; neither engine vectorizes that). The right Spark tool is
`groupBy(key).applyInPandas`: Arrow ships each user's events to Python
once, NumPy computes the recurrence, Arrow ships results back.

Scale notes: shuffle key is user_id (hash-uniform); each group must fit in
one task's memory — true for per-user event histories; a pathological key
would be windowed by (user_id, month) first. This is the batch twin of
`applyInPandasWithState` on the streaming side.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table

EMA_TAU_SECONDS = 3600.0  # 1-hour decay constant

EMA_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("event_ts", StringType()),
        StructField("value", DoubleType()),
        StructField("ema", DoubleType()),
    ]
)


def _ema_group(pdf: pd.DataFrame) -> pd.DataFrame:
    import math

    pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    # Exact integer microsecond timestamps (ns//1000 regardless of the
    # Arrow batch's datetime64 unit): the step deltas must be EXACT ints
    # so dt_us/1e6 is the same IEEE double DuckDB gets from
    # date_diff('microsecond', ...)/1e6 — converting each epoch to float
    # seconds first loses ~256ns per value (epoch-ns > 2^53) and would
    # drift the decay weights off the oracle. math.exp (libm), not
    # np.exp (SIMD polynomial), for the same last-ULP reason.
    ts_us = (
        pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64").to_numpy()
        // 1000
    )
    vals = pdf["value"].to_numpy(dtype="float64")
    ema = np.empty_like(vals)
    ema[0] = vals[0]
    for i in range(1, len(vals)):
        w = math.exp(-(int(ts_us[i] - ts_us[i - 1]) / 1e6) / EMA_TAU_SECONDS)
        ema[i] = w * ema[i - 1] + (1.0 - w) * vals[i]
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "event_ts": pdf["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
            "value": vals,
            "ema": np.round(ema, 9),
        }
    )


# The recurrence is per-row sequential, but over a FINITE ordered group it
# IS SQL-expressible as a recursive CTE stepping rn -> rn+1 (VERDICT r2
# item 3): each iteration joins the frontier to the next event per user,
# applying the identical w*prev + (1-w)*v update in the identical order.
# Both engines therefore execute the same IEEE op sequence (see
# _ema_group's exactness notes); the 9dp output rounding absorbs any
# residual last-ULP libm drift exactly as the cosine queries do.
_EMA_SQL = f"""
WITH RECURSIVE ordered AS (
    SELECT user_id, event_id, ts, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
), rec AS (
    SELECT user_id, event_id, ts, value, rn, CAST(value AS DOUBLE) AS ema
    FROM ordered WHERE rn = 1
    UNION ALL
    SELECT o.user_id, o.event_id, o.ts, o.value, o.rn,
           exp(-(date_diff('microsecond', r.ts, o.ts) / 1e6) / {EMA_TAU_SECONDS!r}) * r.ema
           + (1 - exp(-(date_diff('microsecond', r.ts, o.ts) / 1e6) / {EMA_TAU_SECONDS!r}))
             * CAST(o.value AS DOUBLE) AS ema
    FROM rec r JOIN ordered o ON o.user_id = r.user_id AND o.rn = r.rn + 1
)
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS event_ts,
       value,
       round(ema, 9) AS ema
FROM rec
"""


@register("event_ema_decayed", oracle=_EMA_SQL)
def event_ema_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-decayed EMA of event values (tau = 1h). The one
    registered operator that runs Python — deliberately, as the
    applyInPandas reference implementation (see module docstring).
    Hash-checked against a DuckDB recursive-CTE oracle executing the same
    recurrence in the same order; tests additionally verify the
    recurrence against a pure-Python reference."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    return e.groupBy("user_id").applyInPandas(_ema_group, EMA_SCHEMA)
