"""Resample + LOCF gap-fill and OHLC buckets: planted-frame semantics,
dense-grid invariants, and the one-semantic-shuffle plan claim. DuckDB
hash parity for the registered keys runs via test_oracle_parity."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.timeseries import (
    event_ohlc_buckets,
    event_resample_locf,
    resample_locf,
)
from cc_mapreducer_spark.plans.inspect import count_exchanges
from tests.conftest import SF_ORACLE


def _ts(day, hour, minute=0):
    return datetime(2024, 3, day, hour, minute)


def _planted(spark):
    # user 1: events in hours 0 and 8 of one day -> with a 4h grid the
    # 04:00 bucket is a GAP that must carry 10.0 forward; user 2: single
    # event (degenerate one-bucket grid, no gaps possible)
    rows = [
        (1, _ts(1, 0, 5), 10.0, 100),
        (1, _ts(1, 0, 45), 12.0, 101),  # same bucket, later -> locf source
        (1, _ts(1, 8, 30), 99.0, 102),
        (2, _ts(2, 13, 0), 7.0, 200),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )


def test_locf_semantics_planted(spark):
    out = {
        (r.user_id, r.bucket_start): r
        for r in resample_locf(
            _planted(spark), "user_id", "ts", "value", "event_id", 4 * 3600
        ).collect()
    }
    assert len(out) == 4  # user1: 00/04/08 buckets; user2: 12 bucket
    b00 = out[(1, "2024-03-01 00:00:00")]
    assert (b00.n_events, b00.sum_value, b00.locf_value, b00.is_gap) == (
        2,
        22.0,
        12.0,  # LATER event in the bucket wins (ts,event_id order)
        False,
    )
    gap = out[(1, "2024-03-01 04:00:00")]
    assert (gap.n_events, gap.sum_value, gap.locf_value, gap.is_gap) == (
        0,
        0.0,
        12.0,  # carried forward across the gap
        True,
    )
    b08 = out[(1, "2024-03-01 08:00:00")]
    assert (b08.locf_value, b08.is_gap) == (99.0, False)
    one = out[(2, "2024-03-02 12:00:00")]
    assert (one.n_events, one.locf_value, one.is_gap) == (1, 7.0, False)


def test_grid_is_dense_and_locf_never_null(spark):
    out = event_resample_locf(spark, SF_ORACLE)
    per_user = out.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.countDistinct("bucket_start").alias("nd"),
        F.min("bucket_start").alias("b0"),
        F.max("bucket_start").alias("b1"),
        F.sum(F.col("locf_value").isNull().cast("int")).alias("nulls"),
    )
    for r in per_user.collect():
        # dense: bucket count == span/step + 1, all distinct
        t0 = datetime.strptime(r.b0, "%Y-%m-%d %H:%M:%S")
        t1 = datetime.strptime(r.b1, "%Y-%m-%d %H:%M:%S")
        expect = int((t1 - t0).total_seconds()) // (4 * 3600) + 1
        assert r.n == r.nd == expect, f"user {r.user_id} grid not dense"
        # the first bucket always has an event, so LOCF can never be null
        assert r.nulls == 0


def test_resample_shuffles_raw_data_once(spark):
    """The raw events must be scanned and shuffled exactly once (into
    the cached bucket aggregate); any further exchange may only move
    bucket-aggregate rows. Plan contract: 1 parquet scan, <= 2
    Exchanges total (raw repartition + span-agg over the aggregate)."""
    from cc_mapreducer_spark.plans.inspect import formatted_plan

    import re

    df = event_resample_locf(spark, SF_ORACLE)
    plan = formatted_plan(df)
    # count distinct scan NODES (the tree renders a cached subtree once
    # per consumer, but shared nodes keep one id / one detail header)
    scans = {
        m.group(1) for m in re.finditer(r"^\((\d+)\) Scan parquet", plan, re.M)
    }
    assert len(scans) == 1, f"raw input scanned more than once: {scans}"
    n = count_exchanges(df)
    assert n <= 2, f"expected <=2 Exchanges, plan has {n}"


def test_ohlc_planted(spark):
    import calendar

    df = _planted(spark).withColumn("event_type", F.lit("t"))
    bucket = (F.floor(F.unix_timestamp("ts") / 14400) * 14400).cast("bigint")
    ordered = F.struct("ts", "event_id", "value")
    got = {
        (r.bucket, r.event_type): r
        for r in df.groupBy(bucket.alias("bucket"), "event_type")
        .agg(
            F.min(ordered).getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(ordered).getField("value").alias("close"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }
    epoch = calendar.timegm(datetime(2024, 3, 1).timetuple())  # UTC, tz-proof
    first = got[(epoch // 14400 * 14400, "t")]
    assert (first.open, first.high, first.low, first.close, first.n_events) == (
        10.0,
        12.0,
        10.0,
        12.0,
        2,
    )


def test_ohlc_registered_runs_nonempty(spark):
    out = event_ohlc_buckets(spark, SF_ORACLE)
    assert out.count() > 0
    # high >= low always; close/open within [low, high]
    bad = out.filter(
        (F.col("high") < F.col("low"))
        | (F.col("open") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("close") > F.col("high"))
        | (F.col("close") < F.col("low"))
    ).count()
    assert bad == 0
