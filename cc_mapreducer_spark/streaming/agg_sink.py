"""Incrementally-maintained aggregate table (materialized rollup).

streaming/cdc_sink.py materializes keyed STATE (latest row per key);
this materializes a keyed AGGREGATE (count/sum per key) — the rollup a
dashboard or feature store reads without rescanning history.

Sums are not idempotent: naively adding a replayed batch into a running
total double-counts. The standard fix, used here: each micro-batch
writes its PARTIAL aggregate into a `batch_id=N` partition with dynamic
partition overwrite — replaying batch N overwrites partition N with
identical content instead of adding to it (same protocol as
streaming/events.py:stream_events_to_partitioned_parquet, which solved
idempotence for raw appends; here the payload is a partial agg). The
serving view is a sum over partials — associative/commutative, so
partials in any batch arrangement give the same totals — and
compact_partials() periodically folds completed partitions into one
base partition so the view's read cost stays bounded by key
cardinality, not stream age.

Scale: each partial is |keys-in-batch| rows (map-side combined), the
view shuffles |keys| * |partitions| rows, and compaction restores
|keys|. No driver state, no unbounded anything.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

_AGG_KEYS = ["user_id", "event_type"]

_BASE_PARTITION = -1  # batch_id of the compacted base partial


def _partial_agg(df: DataFrame) -> DataFrame:
    return df.groupBy(*_AGG_KEYS).agg(
        F.count("*").alias("cnt"),
        F.sum("value").alias("sum_value"),
    )


def stream_user_rollup(
    spark: SparkSession,
    source_path: str,
    schema,
    rollup_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain the source (availableNow), writing one idempotent partial
    aggregate partition per micro-batch."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def _apply(df: DataFrame, epoch_id: int) -> None:
        write_partial(df, epoch_id, rollup_path)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def write_partial(df: DataFrame, batch_id: int, rollup_path: str) -> None:
    """One micro-batch -> one `batch_id=N` partial partition. Dynamic
    overwrite makes a checkpoint-rollback replay rewrite the partition
    byte-equivalently instead of double-counting."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            _partial_agg(df)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(rollup_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """Serving view: totals per key = sum over all partial partitions."""
    return (
        spark.read.parquet(rollup_path)
        .groupBy(*_AGG_KEYS)
        .agg(
            F.sum("cnt").alias("n_events"),
            F.sum("sum_value").alias("total_value"),
        )
    )


def compact_partials(spark: SparkSession, rollup_path: str) -> int:
    """Fold every partial partition into the single base partition
    (batch_id = -1), bounding view read cost. Safe only for batch ids
    the stream has committed (availableNow drains guarantee that here);
    a live deployment compacts batches older than the checkpoint's
    committed offset. Returns the number of partitions folded.

    Uses the snapshots stage-and-swap idiom: the folded base is staged
    beside the table, then old partitions are removed and the base
    moved in — a reader mid-compaction sees either layout, both of
    which sum to identical totals."""
    import shutil
    import uuid

    parts = [
        d
        for d in os.listdir(rollup_path)
        if d.startswith("batch_id=")
    ]
    if len(parts) <= 1:
        return 0
    folded = (
        spark.read.parquet(rollup_path)
        .groupBy(*_AGG_KEYS)
        .agg(F.sum("cnt").alias("cnt"), F.sum("sum_value").alias("sum_value"))
    )
    staging = f"{rollup_path.rstrip('/')}_compact_{uuid.uuid4().hex[:8]}"
    try:
        folded.coalesce(1).write.parquet(staging)
        base = os.path.join(rollup_path, f"batch_id={_BASE_PARTITION}")
        for d in parts:
            shutil.rmtree(os.path.join(rollup_path, d))
        os.makedirs(base, exist_ok=True)
        for f in os.listdir(staging):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(staging, f), os.path.join(base, f))
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return len(parts)
