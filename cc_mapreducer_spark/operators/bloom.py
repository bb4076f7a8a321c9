"""Bloom-gated cross-corpus exact dedup — the cheap membership gate in
front of the expensive exact join on the ingest path.

At 100 TB, "is this new document already in the corpus?" cannot be a
plain anti-join per ingest batch: that shuffles the batch against the
full corpus key set every time. The standard production shape is a
Bloom filter over the corpus's content hashes — a bitmap of a few GB for
10^10 keys at 1% fpp, built ONCE per corpus snapshot and shipped to every
ingest executor — so the overwhelmingly-common case (genuinely new
document) is answered locally with k bit probes and never shuffles at
all. Only the ~fpp fraction of false positives plus the true duplicates
go through the exact verification join, which therefore runs on a
candidate set ~100x smaller than the batch.

The result is EXACT, not approximate: a Bloom filter has no false
negatives, so "bitmap says unseen" is definitely new, and everything the
bitmap flags is re-checked with an exact anti-join. The registered
query's oracle is the plain `NOT IN (corpus hashes)` SQL — bit-identical
output, which is the point: the bloom changes the PLAN, not the answer.

Spark internals note: Spark ships BloomFilterAggregate/might_contain for
its runtime join filters, but does not expose them in the SQL function
registry (checked against this pyspark 4.1.2: UNRESOLVED_ROUTINE), so
the build here is the same two-phase shape implemented with public
APIs: per-partition Arrow-batched partial bitmaps (mapInPandas, one
numpy bitmap row per partition) OR-merged into the final filter — which
is exactly how the internal aggregate's update/merge pair works. The
probe ships the bitmap in the task closure like any broadcast constant.

Hashing: k probe positions derive from two independent 64-bit values
produced by splitmix64 (Steele et al., "Fast Splittable Pseudorandom
Number Generators", OOPSLA'14 — the standard integer finalizer, fully
vectorizable in numpy uint64 arithmetic) over the document's sha256
content hash, combined as h1 + i*h2 (Kirsch & Mitzenmacher's
double-hashing construction). Deterministic everywhere; the oracle never
needs to reproduce it because the final answer is bloom-independent.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table

_FPP = 0.01  # designed false-positive rate of the gate


def _bloom_params(n_keys: int, fpp: float = _FPP) -> tuple[int, int]:
    """(m bits, k probes) for n keys at the target fpp — the textbook
    m = -n ln p / ln^2 2, k = (m/n) ln 2, floors at one byte / one probe
    so degenerate corpora still build a valid filter."""
    n = max(1, n_keys)
    m = max(8, math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 7) // 8 * 8  # whole bytes
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 — the mixing step
    that turns the (already uniform) sha256 prefix into independent
    probe streams."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _probe_positions(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: pos_i = h1 + i*h2 mod m."""
    h1 = _splitmix64(keys)
    h2 = _splitmix64(h1) | np.uint64(1)  # odd -> full-period stride
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(
        np.int64
    )


def _key_col(text_hash_col: str) -> F.Column:
    """64-bit integer key: xxhash64 of the sha256 content hash (signed
    long on the Spark side, reinterpreted as uint64 bits in numpy —
    uniformity is what matters, and staying integer end-to-end keeps the
    Arrow transfer compact)."""
    return F.xxhash64(F.col(text_hash_col))


def _as_uint64(series: pd.Series) -> np.ndarray:
    return series.values.astype(np.int64).view(np.uint64)


def build_bloom(keys_df: DataFrame, m: int, k: int) -> bytes:
    """Build the bitmap: one partial bitmap per partition (Arrow-batched
    numpy, zero shuffle), OR-merged at the driver. The merge volume is
    n_partitions x m/8 bytes — the same driver-side merge Spark's own
    BloomFilterAggregate performs for its runtime filters; at 10^10 keys
    the bitmap is ~1.5 GB and the partial count is what you size
    (coalesce the build input) — the corpus itself never moves."""

    def partial(batches):
        bm = np.zeros(m // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            keys = _as_uint64(pdf["key"])
            pos = _probe_positions(keys, m, k).ravel()
            np.bitwise_or.at(bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = keys_df.mapInPandas(partial, "bm binary").collect()
    out = np.zeros(m // 8, dtype=np.uint8)
    for r in parts:
        out |= np.frombuffer(r["bm"], dtype=np.uint8)
    return out.tobytes()


def bloom_might_contain(
    df: DataFrame, bloom: bytes, m: int, k: int, out_col: str = "maybe_seen"
) -> DataFrame:
    """Probe column: True = possibly in the filter (verify exactly),
    False = DEFINITELY not (no false negatives). The bitmap rides in the
    task closure; the probe is k bit tests per row, no shuffle, no join."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    bm = np.frombuffer(bloom, dtype=np.uint8)
    # fresh StructType — StructType.add() MUTATES, and df.schema hands
    # back the DataFrame's cached instance, so adding in place poisons
    # df.columns with the not-yet-existing output column
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, BooleanType())]
    )

    def probe(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            keys = _as_uint64(pdf["key"])
            pos = _probe_positions(keys, m, k)
            hit = (bm[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
            pdf[out_col] = hit.all(axis=1)
            yield pdf

    return df.mapInPandas(probe, schema)


def bloom_gate_new_docs(
    spark: SparkSession,
    sf_dir: str,
    min_doc_id: int,
    fpp: float = _FPP,
) -> DataFrame:
    """Exact cross-corpus dedup of an ingest batch (doc_id >= min_doc_id)
    against the corpus (doc_id < min_doc_id), Bloom-gated:

      1. corpus content hashes -> bitmap (built once; at scale this
         persists next to the corpus snapshot and amortizes over every
         batch — see tests for the build/probe split),
      2. batch probes the bitmap locally: rows the filter has never seen
         are emitted as new WITHOUT any join,
      3. only 'maybe seen' rows (true dupes + ~fpp false positives) hit
         the exact LEFT ANTI join against corpus hashes.

    Returns (doc_id, text_sha) of genuinely-new batch documents —
    bit-identical to the plain anti-join the oracle states.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.sha2(F.col("text"), 256).alias("text_sha")
    )
    corpus = docs.filter(F.col("doc_id") < min_doc_id)
    batch = docs.filter(F.col("doc_id") >= min_doc_id)

    n_corpus = corpus.count()
    m, k = _bloom_params(n_corpus, fpp)
    bloom = build_bloom(
        corpus.select(_key_col("text_sha").alias("key")), m, k
    )

    probed = bloom_might_contain(
        batch.select("doc_id", "text_sha", _key_col("text_sha").alias("key")),
        bloom,
        m,
        k,
    )
    definitely_new = probed.filter(~F.col("maybe_seen")).select(
        "doc_id", "text_sha"
    )
    candidates = probed.filter(F.col("maybe_seen")).select(
        "doc_id", "text_sha"
    )
    verified_new = candidates.join(
        corpus.select("text_sha"), "text_sha", "left_anti"
    ).select("doc_id", "text_sha")
    return definitely_new.unionByName(verified_new)


# Batch = the top fifth of doc_ids; corpus = the rest. The driver corpus
# has no planted cross-boundary exact dupes, so every batch doc is new —
# which is exactly what makes the FULL gate path observable: all rows
# must come out, the overwhelming majority via the join-free
# definitely-new leg (asserted in tests), any false positives via the
# verify leg, and one dropped-or-duplicated row anywhere fails the hash.
# tests/test_bloom.py additionally plants true duplicates and checks
# they are removed and the measured fpp tracks the design point.
_BLOOM_GATE_SQL_TMPL = """
WITH hashed AS (
    SELECT doc_id, sha256(text) AS text_sha FROM documents
), bounds AS (
    SELECT CAST(max(doc_id) * 4 / 5 AS BIGINT) + 1 AS min_new FROM documents
)
SELECT h.doc_id, h.text_sha
FROM hashed h, bounds b
WHERE h.doc_id >= b.min_new
  AND h.text_sha NOT IN (
      SELECT text_sha FROM hashed, bounds WHERE doc_id < min_new
  )
"""


@register("bloom_gate_new_docs", oracle=_BLOOM_GATE_SQL_TMPL, driver=False)
def q_bloom_gate_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface: gate the top-fifth doc_id batch against the
    rest of the corpus. driver=False (roster at its 50-key cap); hash
    parity vs the plain anti-join SQL runs in test_oracle_parity.py."""
    max_id = (
        load_table(spark, sf_dir, "documents")
        .agg(F.max("doc_id"))
        .first()[0]
    )
    if max_id is None:  # empty corpus -> empty, schema-stable
        return spark.createDataFrame([], "doc_id long, text_sha string")
    return bloom_gate_new_docs(spark, sf_dir, min_doc_id=max_id * 4 // 5 + 1)
