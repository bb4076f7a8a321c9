"""Streaming rolling-anomaly operator: multi-micro-batch replay over
time-sliced files must reproduce the batch event_anomalies flags
exactly (streaming == batch discipline), with state carrying the
trailing window across batch boundaries."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.sessionize import event_anomalies
from cc_mapreducer_spark.streaming.stateful import streaming_event_anomalies
from cc_mapreducer_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _write_time_slices(spark, events, src, n_slices=3):
    """Write events as n time-ordered parquet files with ascending
    mtimes so the file source replays them in event-time order —
    required for exact batch parity (the operator is order-sensitive
    by definition; production pairs it with a watermark + source that
    preserves per-key order, e.g. a keyed log)."""
    rows = events.orderBy("ts", "event_id").collect()
    os.makedirs(src, exist_ok=True)
    per = (len(rows) + n_slices - 1) // n_slices
    for i in range(n_slices):
        chunk = rows[i * per : (i + 1) * per]
        if not chunk:
            continue
        path = f"{src}/slice_{i:02d}.parquet"
        spark.createDataFrame(chunk, events.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/_tmp_{i}")
        part = [
            f
            for f in os.listdir(f"{src}/_tmp_{i}")
            if f.endswith(".parquet")
        ][0]
        os.rename(f"{src}/_tmp_{i}/{part}", path)
        import shutil

        shutil.rmtree(f"{src}/_tmp_{i}")
        ts = time.time() + i  # strictly ascending mtimes
        os.utime(path, (ts, ts))


def test_streaming_anomalies_match_batch_flags(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "slices")
    _write_time_slices(spark, events, src, n_slices=3)

    got = streaming_event_anomalies(
        spark, src, events.schema, max_files_per_trigger=1
    )
    stream_rows = {
        r["event_id"]: (r["user_id"], r["event_type"], r["zscore"])
        for r in got.collect()
    }
    batch_rows = {
        r["event_id"]: (r["user_id"], r["event_type"], r["zscore"])
        for r in event_anomalies(spark, SF_SMOKE).collect()
    }
    # identical flag SETS, identical keys, zscores equal to the 6dp grid
    assert set(stream_rows) == set(batch_rows)
    for eid, (u, t, z) in batch_rows.items():
        su, st, sz = stream_rows[eid]
        assert (su, st) == (u, t)
        assert abs(sz - z) < 1e-9


def test_streaming_anomalies_state_spans_batches(spark, tmp_path):
    # one user, constant baseline then a spike in the LAST slice: the
    # spike is only flaggable if the baseline window survived earlier
    # micro-batches in state
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "view", 10.0 + (i % 3) * 0.5, "{}")
        for i in range(12)
    ] + [(99, "2024-01-01 00:59:00", 1, "view", 999.0, "{}")]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "slices")
    _write_time_slices(spark, events, src, n_slices=3)
    got = streaming_event_anomalies(
        spark, src, events.schema, max_files_per_trigger=1
    ).collect()
    flagged = {r["event_id"] for r in got}
    assert 99 in flagged  # the spike, scored against cross-batch state


def test_null_values_occupy_slots_but_never_poison_moments(spark, tmp_path):
    # a NULL value takes a window slot (the batch frame is ROWS-based)
    # but contributes to neither moment and is never scored; the stream
    # must keep flagging afterwards — matching batch event_anomalies
    from cc_mapreducer_spark.operators.sessionize import event_anomalies

    rows = (
        [
            (i, f"2024-01-01 00:{i:02d}:00", 1, "view",
             10.0 + (i % 3) * 0.5, "{}")
            for i in range(8)
        ]
        + [(50, "2024-01-01 00:40:00", 1, "view", None, "{}")]
        + [(60, "2024-01-01 00:50:00", 1, "view", 999.0, "{}")]
    )
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sf = str(tmp_path / "table")
    os.makedirs(sf, exist_ok=True)
    events.coalesce(1).write.parquet(f"{sf}/events.parquet")

    batch_flags = {
        r["event_id"]: r["zscore"]
        for r in event_anomalies(spark, sf).collect()
    }
    src = str(tmp_path / "slices")
    _write_time_slices(
        spark,
        events.select("event_id", "ts", "user_id", "event_type", "value"),
        src,
        n_slices=2,
    )
    stream_flags = {
        r["event_id"]: r["zscore"]
        for r in streaming_event_anomalies(
            spark,
            src,
            events.select(
                "event_id", "ts", "user_id", "event_type", "value"
            ).schema,
            max_files_per_trigger=1,
        ).collect()
    }
    assert 60 in batch_flags  # spike still caught despite the null
    assert set(stream_flags) == set(batch_flags)
    for eid, z in batch_flags.items():
        assert abs(stream_flags[eid] - z) < 1e-9


def test_streaming_funnel_matches_batch_over_replay(spark, tmp_path):
    """The funnel stage carried as O(1) GroupState across 3 micro-batches
    must land exactly on the batch ordered_funnel result per user."""
    from cc_mapreducer_spark.operators.sessionize import ordered_funnel
    from cc_mapreducer_spark.streaming.stateful import streaming_ordered_funnel

    events = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    src = str(tmp_path / "slices")
    _write_time_slices(spark, events, src, n_slices=3)
    emitted = streaming_ordered_funnel(
        spark, src, events.schema, max_files_per_trigger=1
    ).collect()
    # update mode emits once per (user, batch); keep the final emission
    final = {}
    for r in emitted:
        prev = final.get(r["user_id"])
        if prev is None or r["n_events"] > prev["n_events"]:
            final[r["user_id"]] = r
    batch = {
        r["user_id"]: r for r in ordered_funnel(spark, SF_SMOKE).collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        f = final[uid]
        assert (f["n_events"], f["funnel_stage"], f["converted"]) == (
            b["n_events"],
            b["funnel_stage"],
            b["converted"],
        )
    # multiple emissions per user prove the state really spanned batches
    from collections import Counter

    per_user = Counter(r["user_id"] for r in emitted)
    assert any(v > 1 for v in per_user.values())
