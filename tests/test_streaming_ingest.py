"""Streaming Bloom-gated corpus ingest (streaming/ingest.py): the
accreted corpus equals the batch gate's answer, replays are idempotent,
the torn crash state (bitmap written, append lost) self-heals, and the
end-to-end readStream drain matches a single-shot ingest."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.bloom import _key_col, build_bloom
from cc_mapreducer_spark.streaming.ingest import (
    _atomic_write,
    _bloom_files,
    _load_bloom,
    ingest_batch,
    init_bloom_dir,
    stream_ingest_dedup,
)

SCHEMA = "doc_id long, text string"


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _accepted(spark, path):
    if not os.path.isdir(path):
        return {}
    return {
        r["text_sha"]: r["doc_id"]
        for r in spark.read.parquet(path).collect()
    }


def test_ingest_batches_accrete_and_reject_dupes(spark, tmp_path):
    acc = str(tmp_path / "accepted")
    bl = str(tmp_path / "bloom")
    init_bloom_dir(bl, expected_docs=10_000)
    b1 = [(i, f"first wave doc {i}") for i in range(50)]
    assert ingest_batch(spark, _docs_df(spark, b1), acc, bl) == 50
    # second wave: 30 new + 20 exact repeats of wave one
    b2 = [(100 + i, f"second wave doc {i}") for i in range(30)] + [
        (200 + i, f"first wave doc {i}") for i in range(20)
    ]
    assert ingest_batch(spark, _docs_df(spark, b2), acc, bl) == 30
    got = _accepted(spark, acc)
    assert len(got) == 80
    # the repeats kept their ORIGINAL doc_ids (wave-one winners)
    assert all(v < 100 or 100 <= v < 130 for v in got.values())


def test_within_batch_first_wins(spark, tmp_path):
    acc = str(tmp_path / "accepted")
    bl = str(tmp_path / "bloom")
    init_bloom_dir(bl, expected_docs=1_000)
    batch = [(7, "same text"), (3, "same text"), (9, "other text")]
    assert ingest_batch(spark, _docs_df(spark, batch), acc, bl) == 2
    got = _accepted(spark, acc)
    assert sorted(got.values()) == [3, 9]  # lowest doc_id per hash


def test_replay_is_idempotent(spark, tmp_path):
    acc = str(tmp_path / "accepted")
    bl = str(tmp_path / "bloom")
    init_bloom_dir(bl, expected_docs=1_000)
    batch = _docs_df(spark, [(i, f"doc {i}") for i in range(40)])
    assert ingest_batch(spark, batch, acc, bl) == 40
    # full replay (checkpoint rollback): nothing double-appends
    assert ingest_batch(spark, batch, acc, bl) == 0
    assert spark.read.parquet(acc).count() == 40


def test_torn_crash_state_self_heals(spark, tmp_path):
    # simulate the crash between bitmap write and append: keys ARE in
    # the bitmap but accepted/ never got the rows. The replay must
    # accept them through the exact verify leg — exactly once.
    acc = str(tmp_path / "accepted")
    bl = str(tmp_path / "bloom")
    init_bloom_dir(bl, expected_docs=1_000)
    batch = _docs_df(spark, [(i, f"torn doc {i}") for i in range(25)])
    bloom, m, k = _load_bloom(bl)
    hashed = batch.select(F.sha2(F.col("text"), 256).alias("text_sha"))
    add = build_bloom(hashed.select(_key_col("text_sha").alias("key")), m, k)
    import numpy as np

    merged = (
        np.frombuffer(bloom, dtype=np.uint8)
        | np.frombuffer(add, dtype=np.uint8)
    ).tobytes()
    _atomic_write(_bloom_files(bl)[0], merged)  # bitmap committed...
    assert not os.path.isdir(acc)  # ...append lost (the torn state)
    assert ingest_batch(spark, batch, acc, bl) == 25  # self-heals
    assert spark.read.parquet(acc).count() == 25
    assert ingest_batch(spark, batch, acc, bl) == 0  # and stays stable


def test_stream_drain_equals_single_shot(spark, tmp_path):
    # three source files, streamed one per trigger, must accrete the
    # same accepted SET as ingesting the union in one call
    src = str(tmp_path / "src")
    os.makedirs(src)
    waves = [
        [(i, f"wave0 doc {i}") for i in range(20)],
        [(100 + i, f"wave1 doc {i}") for i in range(15)]
        + [(150 + i, f"wave0 doc {i}") for i in range(5)],  # cross-batch dupes
        [(200 + i, f"wave2 doc {i}") for i in range(10)],
    ]
    for j, rows in enumerate(waves):
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        pq.write_table(t, f"{src}/wave{j}.parquet")
    acc = str(tmp_path / "accepted")
    bl = str(tmp_path / "bloom")
    stream_ingest_dedup(
        spark,
        src,
        SCHEMA,
        acc,
        bl,
        checkpoint_path=str(tmp_path / "ckpt"),
        expected_docs=10_000,
        max_files_per_trigger=1,
    )
    streamed = set(_accepted(spark, acc))
    acc2 = str(tmp_path / "accepted2")
    bl2 = str(tmp_path / "bloom2")
    init_bloom_dir(bl2, expected_docs=10_000)
    union = [r for rows in waves for r in rows]
    ingest_batch(spark, _docs_df(spark, union), acc2, bl2)
    assert streamed == set(_accepted(spark, acc2))
    assert len(streamed) == 45  # 20 + 15 + 10 distinct texts


def test_gate_batch_refuses_schema_drift(spark, tmp_path):
    """accepted/ is schema-owned by one pipeline (ADVICE r7): a second
    caller appending a different ride-along column set must fail loudly
    instead of accreting mixed-schema parquet that later reads would
    silently truncate."""
    import pytest

    from cc_mapreducer_spark.streaming.ingest import first_wins, gate_batch

    acc, bl = str(tmp_path / "acc"), str(tmp_path / "bloom")
    init_bloom_dir(bl, expected_docs=100)
    w1 = spark.createDataFrame(
        [(1, "a" * 64, "https://x.org/1")],
        "doc_id long, text_sha string, canonical_url string",
    )
    assert gate_batch(spark, first_wins(w1), acc, bl) == 1
    w2 = spark.createDataFrame(
        [(2, "b" * 64)], "doc_id long, text_sha string"
    )
    with pytest.raises(ValueError, match="one accepted_path per pipeline"):
        gate_batch(spark, first_wins(w2), acc, bl)
    # the matching schema still flows
    w3 = spark.createDataFrame(
        [(3, "c" * 64, "https://x.org/3")],
        "doc_id long, text_sha string, canonical_url string",
    )
    assert gate_batch(spark, first_wins(w3), acc, bl) == 1
