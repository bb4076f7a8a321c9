"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.8 / streaming north-star).

Running per-user aggregates with explicit GroupState — the streaming twin
of operators/stateful.py's batch applyInPandas. State (count, value sum,
last-seen ts) lives in the executor state store partitioned by user_id;
each micro-batch updates it and emits the new running totals.

Over the driver's finite single-file replay the file source delivers ONE
micro-batch, so the emitted rows equal the batch per-user aggregates —
which gives this streaming-stateful operator a real DuckDB oracle.

Scale notes: state size is O(distinct users), hash-partitioned across
executors; a timeout (GroupStateTimeout) would evict idle users in a
production stream — not set here because the replay is finite.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.streaming.events import _events_stream, _run_to_memory

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("value_sum_cents", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, value-sum) per user. Values are summed as exact
    integer cents inside the state (floats in a state store accumulate
    FP error across batches)."""
    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        # per-ROW cents rounding, then integer sum — matches the oracle's
        # sum(CAST(round(value*100) AS BIGINT)) exactly; rounding a float
        # batch-sum would only coincide by luck
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
    )


_STATEFUL_SQL = """
SELECT user_id,
       count(*) AS n_events,
       CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
"""


@register("streaming_stateful_user_totals", oracle=_STATEFUL_SQL)
def streaming_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running totals per user, executed by the
    streaming engine over the finite replay (single micro-batch -> emitted
    rows == batch aggregates, hence the oracle)."""
    stream = _events_stream(spark, sf_dir)
    updated = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(updated, "update")


# --------------------------------------------------------------------------
# streaming rolling z-score anomalies (custom windowed state)
# --------------------------------------------------------------------------

from pyspark.sql.types import ArrayType, StringType  # noqa: E402

ANOM_STATE_SCHEMA = StructType(
    [StructField("recent", ArrayType(DoubleType()))]
)

ANOM_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("zscore", DoubleType()),
    ]
)

# the batch twin's parameters, imported so the two paths cannot drift
from cc_mapreducer_spark.operators.sessionize import (  # noqa: E402
    _ANOM_MIN,
    _ANOM_WIN,
    _ANOM_Z,
)


def _round_half_away(x: float, dp: int) -> float:
    """Spark's F.round / DuckDB round use HALF-AWAY-FROM-ZERO; Python's
    round() is half-to-even — a z landing exactly on a 6dp tie would
    differ between the streaming and batch paths without this."""
    import math

    scale = 10.0 ** dp
    return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale


def _update_anomaly_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Trailing-window z-score per (user_id, event_type): the state is
    the last <= _ANOM_WIN values IN EVENT ORDER; each incoming row is
    scored against the window BEFORE being appended (an outlier must
    not dilute its own baseline — same contract as the batch
    event_anomalies). Moments are a left-to-right Python fold, the same
    sequential op order as the batch window sum, so a finite in-order
    replay reproduces the batch flags exactly.

    NULL values mirror the batch frame semantics precisely: a null row
    OCCUPIES a window slot (the batch frame is ROWS-based) but
    contributes to neither moment (count(value)/sum skip nulls), and is
    never scored itself. Stored as NaN in state and filtered out of the
    folds.

    State is O(window) doubles per live key — bounded regardless of
    stream age, the property that lets this run forever."""
    import math

    recent = list(state.get[0]) if state.exists else []
    rows = pd.concat(list(batches))
    rows = rows.sort_values(["ts", "event_id"])  # per-batch event order
    out = {c.name: [] for c in ANOM_OUTPUT_SCHEMA.fields}
    for r in rows.itertuples():
        value_is_null = r.value is None or (
            isinstance(r.value, float) and math.isnan(r.value)
        )
        live = [v for v in recent if not math.isnan(v)]
        n = len(live)
        if n >= _ANOM_MIN and not value_is_null:
            s1 = 0.0
            for v in live:
                s1 += v
            s2 = 0.0
            for v in live:
                s2 += v * v
            mean = s1 / n
            var = (s2 - s1 * s1 / n) / (n - 1)
            if var > 0:
                z = _round_half_away((r.value - mean) / math.sqrt(var), 6)
                if abs(z) > _ANOM_Z:
                    out["event_id"].append(r.event_id)
                    out["user_id"].append(key[0])
                    out["event_type"].append(key[1])
                    out["value"].append(r.value)
                    out["zscore"].append(z)
        recent.append(float("nan") if value_is_null else float(r.value))
        if len(recent) > _ANOM_WIN:
            recent.pop(0)
    state.update((recent,))
    yield pd.DataFrame(out)


def streaming_event_anomalies(
    spark: SparkSession, source_path: str, schema, max_files_per_trigger=None
) -> DataFrame:
    """Run the rolling-anomaly operator over a file-source replay of
    ``source_path`` (pytest-only: the registered batch twin is
    event_anomalies; the parity test replays time-sliced files and
    asserts identical flags — SURVEY's streaming==batch discipline)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    flagged = stream.groupBy("user_id", "event_type").applyInPandasWithState(
        _update_anomaly_state,
        outputStructType=ANOM_OUTPUT_SCHEMA,
        stateStructType=ANOM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(flagged, "update")


# --------------------------------------------------------------------------
# streaming ordered funnel (cross-batch stage state)
# --------------------------------------------------------------------------

from pyspark.sql.types import BooleanType  # noqa: E402

from cc_mapreducer_spark.operators.sessionize import _FUNNEL_STEPS  # noqa: E402

FUNNEL_STATE_SCHEMA = StructType(
    [StructField("stage", LongType()), StructField("n_events", LongType())]
)

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("funnel_stage", LongType()),
        StructField("converted", BooleanType()),
    ]
)


def _update_funnel_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user funnel progression as GroupState: the state is just
    (stage, n_events) — the entire fold accumulator of the batch
    ordered_funnel, so state is O(1) per user forever and a finite
    in-order replay reproduces the batch result exactly (tested).
    Events are applied in (ts, event_id) order within each batch; the
    stage only ever advances (monotone), which is what makes carrying
    it across arbitrary batch boundaries sound."""
    stage, n = state.get if state.exists else (0, 0)
    rows = pd.concat(list(batches)).sort_values(["ts", "event_id"])
    for r in rows.itertuples():
        n += 1
        if stage < len(_FUNNEL_STEPS) and r.event_type == _FUNNEL_STEPS[stage]:
            stage += 1
    state.update((stage, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "funnel_stage": [stage],
            "converted": [stage == len(_FUNNEL_STEPS)],
        }
    )


def streaming_ordered_funnel(
    spark: SparkSession, source_path: str, schema, max_files_per_trigger=None
) -> DataFrame:
    """Run the funnel state machine over a file-source replay; update
    mode emits the running stage per user each batch — the LAST
    emission per user equals the batch ordered_funnel row (pytest
    parity over a time-sliced replay)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path).select(
        "event_id", "ts", "user_id", "event_type"
    )
    updated = stream.groupBy("user_id").applyInPandasWithState(
        _update_funnel_state,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(updated, "update")
