"""Byte-grain binary dedup over content-defined chunks — the storage
layer of the dedup stack (functions/cdc_chunker.py for the algorithm).

Where the text/image operators ask "is this the same CONTENT", this one
asks "do these artifacts share BYTES": the question a 100 TB object
store answers for media re-uploads, shard rebuilds, and checkpoint
series, where a one-byte insertion shifts every later offset and
defeats fixed-block dedup but not content-defined cuts.

Plan shape: chunking rides the scan (mapInPandas over the binary
payload column — the multimodal pattern); the only corpus-wide shuffle
keys are chunk sha256s (near-uniform by construction); the per-type
rollup is one more groupBy. Chunk rows are the standing artifact a real
deployment materializes (the chunk index parquet); cross-corpus
incremental dedup then reuses the Bloom-gated ingest machinery
unchanged (streaming/ingest.gate_batch keyed on chunk shas).

The fixture plants the alignment story explicitly: every 5th document's
payload is a RE-UPLOAD of the previous document's payload with a small
header insertion — fixed-block dedup shares ~nothing, CDC re-syncs
after one chunk (tests measure both and pin the gap).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cc_mapreducer_spark.functions.cdc_chunker import chunk_payload
from cc_mapreducer_spark.operators.multimodal import _encode_one
from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table, spread

CHUNK_SCHEMA = StructType(
    [
        StructField("artifact_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("variant", StringType()),
        StructField("chunk_idx", IntegerType()),
        StructField("offset", LongType()),
        StructField("length", LongType()),
        StructField("chunk_sha", StringType()),
    ]
)

# fixture-scaled CDC parameters: the container payloads are 100s of
# bytes to a few KB, so the defaults (2 KiB expected chunks) would put
# every payload in one chunk and test nothing — expected ~128+64 bytes
# here; a real object store runs the 2-8 KiB defaults
_MASK_BITS, _MIN_SIZE, _MAX_SIZE = 7, 64, 1024


def _doc_body(doc_id: int, text: str, n: int = 2048) -> bytes:
    """A deterministic, NON-repetitive ~n-byte body per doc (a sha256
    stream keyed on the text): tiled text would dedup against itself
    and muddy the re-upload witness; real media bodies are
    high-entropy, and so is this."""
    import hashlib

    out = bytearray()
    i = 0
    seed = text.encode("utf-8")
    while len(out) < n:
        out += hashlib.sha256(b"%d:%d:" % (doc_id, i) + seed).digest()
        i += 1
    return bytes(out[:n])


def _artifacts_for(doc_id: int, text: str, n_chars: int):
    """The crawled binaries for a doc: its container header + a ~2 KB
    high-entropy body (so every payload spans many chunks) — and for
    every 5th doc ALSO a RE-UPLOAD of the same bytes behind a 13-byte
    header insertion (a new crawl id in front): the shifted-offsets case
    fixed-block dedup loses and CDC re-syncs through."""
    mt, container = _encode_one(doc_id, text, n_chars)
    payload = container + _doc_body(doc_id, text)
    out = [(doc_id * 10, "base", mt, payload)]
    if doc_id % 5 == 0:
        out.append(
            (
                doc_id * 10 + 1,
                "reupload",
                mt,
                (b"reupload:%04d" % (doc_id % 10000)) + payload,
            )
        )
    return out


def _chunk_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if not len(pdf):
            continue
        rows = {k.name: [] for k in CHUNK_SCHEMA.fields}
        for doc_id, text, n_chars in zip(
            pdf["doc_id"], pdf["text"], pdf["n_chars"]
        ):
            for art_id, variant, mt, payload in _artifacts_for(
                int(doc_id), str(text), int(n_chars)
            ):
                chunks = chunk_payload(
                    payload, _MASK_BITS, _MIN_SIZE, _MAX_SIZE
                )
                for idx, (off, ln, sha) in enumerate(chunks):
                    rows["artifact_id"].append(art_id)
                    rows["doc_id"].append(doc_id)
                    rows["media_type"].append(mt)
                    rows["variant"].append(variant)
                    rows["chunk_idx"].append(idx)
                    rows["offset"].append(off)
                    rows["length"].append(ln)
                    rows["chunk_sha"].append(sha)
        yield pd.DataFrame(rows)


def chunk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per content-defined chunk of every payload."""
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", "n_chars"
    )
    return docs.mapInPandas(_chunk_rows, CHUNK_SCHEMA)


@register("binary_chunk_dedup", driver=False)  # rolling hash: replica-pinned
def binary_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media-type byte dedup report over the CDC chunk index:
    physical bytes, unique chunk bytes (what a content-addressed store
    would hold), the dedup ratio, and chunk counts. ONE groupBy on
    chunk_sha (unique-bytes election: each sha counts its length once)
    + one rollup groupBy. rows-only for the driver (a rolling hash is
    not SQL-expressible); pytest pins chunk boundaries/invariants, the
    re-sync property vs fixed blocking, and the stats against a python
    replica over the same payloads."""
    chunks = chunk_table(spark, sf_dir)
    uniq = chunks.groupBy("media_type", "chunk_sha").agg(
        F.first("length").alias("length"),  # same sha => same bytes
        F.count("*").alias("n_refs"),
    )
    per_type = uniq.groupBy("media_type").agg(
        F.sum(F.col("length") * F.col("n_refs")).cast("bigint").alias(
            "total_bytes"
        ),
        F.sum("length").cast("bigint").alias("unique_bytes"),
        F.sum("n_refs").cast("bigint").alias("n_chunks"),
        F.count("*").cast("bigint").alias("n_unique_chunks"),
    )
    return per_type.select(
        "media_type",
        "total_bytes",
        "unique_bytes",
        "n_chunks",
        "n_unique_chunks",
        F.round(
            (F.col("total_bytes") - F.col("unique_bytes"))
            / F.greatest(F.col("total_bytes"), F.lit(1)),
            6,
        ).alias("dedup_ratio"),
    )


@register("binary_dedup_suite")  # rolling hash: rows-only + replica-pinned
def binary_dedup_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver key for the byte-grain dedup family, registered at CHUNK
    grain so the driver's rows-only check is boundary-sensitive: one
    'chunk' row per content-defined chunk (entity carries artifact,
    index, offset, length, AND the chunk sha — any boundary or content
    drift changes the row count or the entity set) plus the per-type
    'rollup' legs of binary_chunk_dedup. No DuckDB oracle on purpose:
    the Buzhash rolling cut is not SQL-expressible (and 1/3 of the
    payloads ride zlib PNG containers), so cross-engine value parity is
    impossible here — the VALUES are pinned in pytest against a pure
    python replica over the same payloads (tests/test_binary_dedup.py),
    and the suite itself is pinned leg-by-leg against its components."""

    def leg(df: DataFrame, component: str, entity, value) -> DataFrame:
        return df.select(
            F.lit(component).alias("component"),
            entity.cast("string").alias("entity"),
            value.cast("double").alias("value"),
        )

    chunks = chunk_table(spark, sf_dir)
    rollup = binary_chunk_dedup(spark, sf_dir)
    return (
        leg(
            chunks,
            "chunk",
            F.concat_ws(
                "|", "artifact_id", "chunk_idx", "offset", "length", "chunk_sha"
            ),
            F.lit(1.0),
        )
        .unionByName(
            leg(rollup, "rollup:bytes", F.col("media_type"), F.col("total_bytes"))
        )
        .unionByName(
            leg(rollup, "rollup:uniq", F.col("media_type"), F.col("unique_bytes"))
        )
        .unionByName(
            leg(rollup, "rollup:chunks", F.col("media_type"), F.col("n_chunks"))
        )
        .unionByName(
            leg(
                rollup,
                "rollup:uchunks",
                F.col("media_type"),
                F.col("n_unique_chunks"),
            )
        )
        .unionByName(
            leg(rollup, "rollup:ratio", F.col("media_type"), F.col("dedup_ratio"))
        )
    )
