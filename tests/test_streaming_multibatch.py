"""Multi-micro-batch streaming: state must accumulate across batches.

The registered streaming queries replay one file = one batch; this test
splits events into 3 files and forces maxFilesPerTrigger=1, so the
applyInPandasWithState operator runs 3 micro-batches and its GroupState
must carry totals between them. The LAST emission per user must equal the
batch aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from cc_mapreducer_spark.streaming.stateful import (
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
    _update_user_state,
)
from cc_mapreducer_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_state_accumulates_across_batches(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    src = str(tmp_path / "ev_parts")
    # 3 files -> 3 micro-batches under maxFilesPerTrigger=1
    events.repartition(3).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    updated = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        updated.writeStream.format("memory")
        .queryName("multibatch_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table("multibatch_state").collect()
    # multiple emissions per user prove multiple batches ran
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in emitted:
        per_user[r.user_id].append((r.n_events, r.total_value))
    assert any(len(v) > 1 for v in per_user.values()), "expected >1 micro-batch"

    # the final (max n_events) emission must equal the batch aggregate
    batch = {
        r.user_id: (r.n, round(r.cents) / 100.0)
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("cents"),
        )
        .collect()
    }
    for uid, emissions in per_user.items():
        final = max(emissions)
        assert final == batch[uid], f"user {uid}: {final} != {batch[uid]}"


def test_partitioned_sink_keeps_rows_across_batches(spark, tmp_path):
    """The exactly-once file sink must not lose earlier batches' rows when
    one event_date spans several micro-batches: dynamic overwrite keyed on
    event_date alone would REPLACE the date's partition per batch; the
    per-batch partition scoping keeps every row exactly once."""
    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "ev_parts")
    # 3 files over the SAME date range -> every date spans all 3 batches
    events.repartition(3).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")

    def write_batch(df, epoch_id):
        df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            df.withColumn("event_date", F.to_date("ts"))
            .withColumn("batch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .partitionBy("event_date", "batch_id")
            .parquet(out)
        )

    q = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    assert back.select("batch_id").distinct().count() > 1  # really multi-batch
    assert back.count() == events.count()  # no batch overwrote another
    assert sorted(r.event_id for r in back.collect()) == sorted(
        r.event_id for r in events.collect()
    )
