"""Incremental rollup: multi-batch replay equals the batch aggregate,
partial re-writes are idempotent, compaction preserves totals."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cc_mapreducer_spark.streaming.agg_sink import (
    compact_partials,
    read_rollup,
    stream_user_rollup,
    write_partial,
)
from cc_mapreducer_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _batch_expected(spark):
    return {
        (r["user_id"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    }


def _view(spark, path):
    return {
        (r["user_id"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in read_rollup(spark, path).collect()
    }


def test_multibatch_rollup_equals_batch_aggregate(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)
    rollup = str(tmp_path / "rollup")
    stream_user_rollup(
        spark, src, events.schema, rollup, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    # 3 partial partitions landed
    parts = [d for d in os.listdir(rollup) if d.startswith("batch_id=")]
    assert len(parts) == 3
    got = _view(spark, rollup)
    expected = _batch_expected(spark)
    assert set(got) == set(expected)
    for k in expected:
        assert got[k][0] == expected[k][0]
        assert abs(got[k][1] - expected[k][1]) < 1e-6

    # compaction folds to one partition without changing totals
    assert compact_partials(spark, rollup) == 3
    parts = [d for d in os.listdir(rollup) if d.startswith("batch_id=")]
    assert parts == ["batch_id=-1"]
    after = _view(spark, rollup)
    assert set(after) == set(got)
    for k in got:
        assert after[k][0] == got[k][0]
        assert abs(after[k][1] - got[k][1]) < 1e-6


def test_replayed_partial_does_not_double_count(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    rollup = str(tmp_path / "rollup")
    write_partial(events, 0, rollup)
    once = _view(spark, rollup)
    write_partial(events, 0, rollup)  # checkpoint-rollback replay
    assert _view(spark, rollup) == once
    # a genuinely NEW batch does accumulate
    write_partial(events.limit(10), 1, rollup)
    again = _view(spark, rollup)
    assert sum(v[0] for v in again.values()) == sum(
        v[0] for v in once.values()
    ) + 10


def test_resolve_keyed_changelog_null_key_fails_fast(spark):
    # ADVICE r3: a null user_id hashed to a null bucket, which would
    # stage under __HIVE_DEFAULT_PARTITION__ while the swap looked for
    # kb=None — silently dropping that bucket's merge. The kb expression
    # now raises executor-side instead.
    import pytest
    from pyspark.sql import Row
    from cc_mapreducer_spark.streaming.cdc_sink import resolve_keyed_changelog

    df = spark.createDataFrame(
        [(None, 9, "click", 1.0, "2024-01-01 00:00:00", '{"k": 1}')],
        "user_id long, event_id long, event_type string, value double, "
        "ts string, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(Exception, match="null user_id"):
        resolve_keyed_changelog(df).collect()
