"""Streaming CDC materialization: keep a keyed snapshot table current
as changelog micro-batches arrive — the streaming complement of
operators/cdc.py (which resolves a complete changelog in batch).

Shape: readStream over the changelog -> foreachBatch -> per-batch
latest-per-key resolution -> bucket-partitioned stage-and-swap merge
into the snapshot. Only the hash buckets a batch touches are read and
rewritten; at 100 TB the bucket count is sized so a bucket is a few GB
(here 8, the test scale).

Exactly-once: the merge re-resolves latest-per-key over
(existing ∪ batch), which is idempotent — re-processing a batch after a
checkpoint rollback converges to the identical snapshot instead of
double-applying (asserted in tests). Tombstones ('error' ops) are
MATERIALIZED with is_deleted=true rather than dropped: a later
out-of-order upsert with a lower version must lose to the tombstone,
which it can only do if the tombstone is still there to compare
against. read_current_snapshot() filters them out for consumers.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

N_BUCKETS = 8


def resolve_keyed_changelog(df: DataFrame) -> DataFrame:
    """events-shaped rows -> keyed changelog rows with the snapshot
    schema: (kb, user_id, item_k, last_event_type, last_value, ts,
    event_id, is_deleted). kb is the hash-bucket partition column.

    A NULL user_id fails the batch fast (executor-side raise inside the
    kb expression — no extra validation job): a null bucket key would
    stage under Spark's __HIVE_DEFAULT_PARTITION__ directory while the
    swap looked for kb=None, silently dropping that bucket's merge; and
    a keyless changelog row has no merge semantics to begin with."""
    kb = F.when(
        F.col("user_id").isNotNull(),
        F.pmod(F.col("user_id"), F.lit(N_BUCKETS)).cast("int"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("null user_id in changelog row (event_id="),
                F.coalesce(F.col("event_id").cast("string"), F.lit("?")),
                F.lit(") — keyless rows cannot be merged"),
            )
        ).cast("int")
    )
    return df.select(
        kb.alias("kb"),
        "user_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("item_k"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        "ts",
        "event_id",
        (F.col("event_type") == "error").alias("is_deleted"),
    )


def _latest_per_key(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id", "item_k").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def merge_cdc_batch(
    spark: SparkSession, snapshot_path: str, batch: DataFrame
) -> None:
    """Merge one changelog micro-batch into the bucket-partitioned
    snapshot. Reads ONLY the buckets the batch touches (partition-pruned
    IN filter), resolves latest-per-key over existing ∪ batch, and
    stage-and-swaps those bucket directories (same protocol as
    operators/cdc.merge_into_partitioned — resilient to buckets emptied
    by compaction, no read-while-overwrite race)."""
    from cc_mapreducer_spark.operators.cdc import (
        _journaled_swap,
        _partition_dir,
        recover_interrupted_swap,
    )

    recover_interrupted_swap(snapshot_path)  # self-heal interrupted merges
    keyed = _latest_per_key(resolve_keyed_changelog(batch))
    touched = [r[0] for r in keyed.select("kb").dropDuplicates().collect()]
    if not touched:
        return
    if os.path.isdir(snapshot_path) and any(
        e.startswith("kb=") for e in os.listdir(snapshot_path)
    ):
        existing = spark.read.parquet(snapshot_path).filter(
            F.col("kb").isin(touched)
        )
        merged = _latest_per_key(existing.unionByName(keyed))
    else:
        merged = keyed
    staging = f"{snapshot_path.rstrip('/')}_stage_{uuid.uuid4().hex[:8]}"
    try:
        (
            merged.repartition("kb")
            .write.mode("overwrite")
            .partitionBy("kb")
            .parquet(staging)
        )
    except BaseException:
        # staging never published: snapshot is the intact old state
        shutil.rmtree(staging, ignore_errors=True)
        raise
    os.makedirs(snapshot_path, exist_ok=True)
    # Journaled commit, same protocol (and same escaped-path rendering)
    # as operators/cdc.merge_into_partitioned: a crash mid-swap leaves
    # journal + staging for the next batch's recover call to roll
    # forward — the snapshot is always all-old or all-new, never mixed.
    # kb is a non-null int today (resolve_keyed_changelog raises on null
    # keys), but the naming must stay in lockstep with what Spark wrote
    # if that ever changes.
    _journaled_swap(
        snapshot_path, staging, [_partition_dir("kb", v) for v in touched]
    )


def read_current_snapshot(spark: SparkSession, snapshot_path: str) -> DataFrame:
    """Consumer view: live keys only (tombstones filtered)."""
    return spark.read.parquet(snapshot_path).filter(~F.col("is_deleted"))


def stream_cdc_snapshot(
    spark: SparkSession,
    source_path: str,
    schema,
    snapshot_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Run the streaming materialization until the source is drained
    (availableNow trigger): each micro-batch merges into the snapshot
    via merge_cdc_batch; the checkpoint carries source offsets so a
    restart resumes from the last committed batch."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def _apply(df: DataFrame, epoch_id: int) -> None:
        merge_cdc_batch(df.sparkSession, snapshot_path, df)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
