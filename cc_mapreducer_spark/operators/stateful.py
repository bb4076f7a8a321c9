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
    pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    # normalize to ns regardless of the Arrow batch's datetime64 unit
    ts = pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64").to_numpy() / 1e9
    vals = pdf["value"].to_numpy(dtype="float64")
    ema = np.empty_like(vals)
    ema[0] = vals[0]
    for i in range(1, len(vals)):
        w = np.exp(-(ts[i] - ts[i - 1]) / EMA_TAU_SECONDS)
        ema[i] = w * ema[i - 1] + (1.0 - w) * vals[i]
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "event_ts": pdf["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f"),
            "value": vals,
            "ema": ema,
        }
    )


@register("event_ema_decayed")  # rows-only: recursive semantics, not SQL-expressible
def event_ema_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-decayed EMA of event values (tau = 1h). The one
    registered operator that runs Python — deliberately, as the
    applyInPandas reference implementation (see module docstring). The
    driver records a rows-only check; tests pin determinism and verify
    the recurrence against a pure-Python reference."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    return e.groupBy("user_id").applyInPandas(_ema_group, EMA_SCHEMA)
