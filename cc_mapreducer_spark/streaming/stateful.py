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
