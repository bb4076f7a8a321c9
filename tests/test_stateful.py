"""applyInPandas EMA operator: determinism + recurrence correctness
against a pure-Python reference on a hand-built group."""

from __future__ import annotations

import math

from cc_mapreducer_spark import registry
from cc_mapreducer_spark.operators.stateful import EMA_TAU_SECONDS
from tests.conftest import SF_SMOKE


def test_ema_deterministic(spark):
    q = registry.all_queries()["event_ema_decayed"]
    a = sorted(map(tuple, q(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, q(spark, SF_SMOKE).collect()))
    assert a == b and len(a) > 0


def test_ema_matches_reference_recurrence(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (7, i, base + dt.timedelta(minutes=30 * i), float(v))
        for i, v in enumerate([10.0, 20.0, 0.0, 40.0])
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])
    from cc_mapreducer_spark.operators.stateful import EMA_SCHEMA, _ema_group

    out = {r.event_id: r.ema for r in df.groupBy("user_id").applyInPandas(_ema_group, EMA_SCHEMA).collect()}

    ema, prev_ts = None, None
    expected = {}
    for _, eid, ts, v in rows:
        if ema is None:
            ema = v
        else:
            w = math.exp(-((ts - prev_ts).total_seconds()) / EMA_TAU_SECONDS)
            ema = w * ema + (1 - w) * v
        prev_ts = ts
        expected[eid] = ema
    # the operator rounds to 9dp (cross-engine oracle grid); compare on it
    for eid, e in expected.items():
        assert abs(out[eid] - round(e, 9)) < 1e-12
