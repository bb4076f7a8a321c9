"""Streaming corpus ingest with Bloom-gated exact dedup — the
continuous form of operators/bloom.py's batch gate.

A training corpus at 100 TB is not rebuilt; it ACCRETES: crawl batches
arrive continuously and each must be deduplicated against everything
accepted so far without rescanning it. This sink maintains two
artifacts next to the corpus:

  accepted/   parquet of every accepted (doc_id, text_sha) row
  bloom/      the membership bitmap over accepted content hashes
              (bloom.bin + params.json), a few bytes per document

and per micro-batch:

  1. dedups WITHIN the batch (first doc_id per content hash — a batch
     can repeat itself),
  2. probes the bitmap join-free: never-seen rows are accepted outright,
  3. sends only bitmap hits (true dupes + ~fpp false positives) through
     the exact anti-join against the accepted table,
  4. ORs the accepted rows' probe bits into the bitmap, persists it
     atomically (tmp + rename), THEN appends to accepted/.

Crash-safety hinges on the ORDER of step 4 (bitmap BEFORE append):

  * replayed batch after a clean commit: every row is in the bitmap ->
    candidates -> anti-join rejects all -> nothing double-appends. The
    Bloom gate itself is what makes replay idempotent — no batch-id
    bookkeeping needed for the append path.
  * crash BETWEEN bitmap write and append: the replay sees rows in the
    bitmap but absent from accepted/ -> they flow through the exact
    verify leg -> accepted and appended. Cost: a false-positive-sized
    verify, never lost or duplicated data.
  * the reverse order (append first) would be UNSAFE: on replay the
    bitmap misses, the definitely-new leg skips the join, and the rows
    append twice. Pinned in tests by simulating the torn state.

Bitmap sizing is fixed up front from the expected corpus cardinality
(the production choice — a filter that resizes must rehash everything);
overfill degrades fpp gracefully, it never drops accepted rows.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cc_mapreducer_spark.operators.bloom import (
    _bloom_params,
    _key_col,
    bloom_might_contain,
    build_bloom,
)


def _bloom_files(bloom_dir: str) -> tuple[str, str]:
    return os.path.join(bloom_dir, "bloom.bin"), os.path.join(
        bloom_dir, "params.json"
    )


def init_bloom_dir(bloom_dir: str, expected_docs: int, fpp: float = 0.01) -> None:
    """Create an empty bitmap sized for the corpus this ingest will
    accrete. Idempotent: an existing bitmap is left untouched (a
    restarted pipeline must keep its accumulated state)."""
    os.makedirs(bloom_dir, exist_ok=True)
    bin_path, params_path = _bloom_files(bloom_dir)
    if os.path.exists(bin_path):
        return
    m, k = _bloom_params(expected_docs, fpp)
    with open(params_path, "w") as f:
        json.dump({"m": m, "k": k}, f)
    _atomic_write(bin_path, bytes(m // 8))


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic on POSIX


def _load_bloom(bloom_dir: str) -> tuple[bytes, int, int]:
    bin_path, params_path = _bloom_files(bloom_dir)
    with open(params_path) as f:
        p = json.load(f)
    with open(bin_path, "rb") as f:
        return f.read(), p["m"], p["k"]


def first_wins(df: DataFrame, key: str = "text_sha") -> DataFrame:
    """Within-batch dedup: lowest doc_id per content key survives."""
    w = Window.partitionBy(key).orderBy("doc_id")
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def gate_batch(
    spark: SparkSession,
    uniq: DataFrame,
    accepted_path: str,
    bloom_dir: str,
) -> int:
    """Commit the never-seen rows of a within-batch-unique frame. The
    frame must carry ``text_sha``; every other column rides along into
    accepted/ unchanged (the acquisition ingest carries the cleaned text
    and canonical URL through). Returns the number accepted.

    Plan per batch: a join-free bitmap probe, then an anti-join whose
    LEFT side is only the bitmap hits. The accepted/ scan on the right
    side reads just the text_sha column (pruned); at scale that table is
    bucketed by text_sha so the verify join is shuffle-free on the
    corpus side."""
    cols = uniq.columns
    # accepted_path is schema-owned by ONE pipeline (ADVICE r7): parquet
    # appends with a different column set would leave mixed-schema files
    # whose later reads bind to an arbitrary footer and silently drop
    # columns — refuse loudly instead.
    if os.path.isdir(accepted_path) and any(
        f.endswith(".parquet") for f in os.listdir(accepted_path)
    ):
        existing = set(spark.read.parquet(accepted_path).columns)
        if existing != set(cols):
            raise ValueError(
                f"gate_batch: accepted/ at {accepted_path} holds columns "
                f"{sorted(existing)} but the incoming frame carries "
                f"{sorted(cols)} — one accepted_path per pipeline schema"
            )
    bloom, m, k = _load_bloom(bloom_dir)
    probed = bloom_might_contain(
        uniq.withColumn("key", _key_col("text_sha")), bloom, m, k
    )
    definitely_new = probed.filter(~F.col("maybe_seen")).select(*cols)
    candidates = probed.filter(F.col("maybe_seen")).select(*cols)
    if os.path.isdir(accepted_path) and any(
        f.endswith(".parquet") for f in os.listdir(accepted_path)
    ):
        corpus_hashes = spark.read.parquet(accepted_path).select("text_sha")
        verified = candidates.join(corpus_hashes, "text_sha", "left_anti")
    else:
        verified = candidates
    accepted = definitely_new.unionByName(verified).localCheckpoint()
    n = accepted.count()
    if n == 0:
        return 0
    # ORDER MATTERS (module docstring): bitmap first, append second —
    # a crash in between costs a false-positive verify on replay, while
    # the reverse order would double-append.
    add = build_bloom(
        accepted.select(_key_col("text_sha").alias("key")), m, k
    )
    merged = (
        np.frombuffer(bloom, dtype=np.uint8)
        | np.frombuffer(add, dtype=np.uint8)
    ).tobytes()
    _atomic_write(_bloom_files(bloom_dir)[0], merged)
    accepted.write.mode("append").parquet(accepted_path)
    return n


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    accepted_path: str,
    bloom_dir: str,
) -> int:
    """Gate one micro-batch (doc_id, text columns) against the accreted
    corpus and commit the survivors. Returns the number accepted.

    Plan per batch: one within-batch shuffle on text_sha (first-wins)
    plus gate_batch's probe + verify anti-join."""
    hashed = batch.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("text_sha")
    )
    return gate_batch(spark, first_wins(hashed), accepted_path, bloom_dir)


def stream_ingest_dedup(
    spark: SparkSession,
    source_path: str,
    schema,
    accepted_path: str,
    bloom_dir: str,
    checkpoint_path: str,
    expected_docs: int = 1_000_000,
    max_files_per_trigger: int | None = None,
) -> None:
    """Run the ingest until the source drains (availableNow): readStream
    over arriving document files -> foreachBatch(ingest_batch). The
    checkpoint replays uncommitted batches on restart; the Bloom-first
    commit order makes those replays converge instead of duplicating."""
    init_bloom_dir(bloom_dir, expected_docs)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def _apply(df: DataFrame, epoch_id: int) -> None:
        ingest_batch(df.sparkSession, df, accepted_path, bloom_dir)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
