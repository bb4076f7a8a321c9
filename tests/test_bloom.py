"""Bloom-gated cross-corpus exact dedup (operators/bloom.py): exactness
against the plain anti-join, no-false-negative guarantee under planted
duplicates, measured fpp near the design point, and the scale claim —
the overwhelming majority of a fresh batch exits through the join-free
definitely-new leg. Oracle parity runs in test_oracle_parity.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.bloom import (
    _bloom_params,
    _key_col,
    bloom_gate_new_docs,
    bloom_might_contain,
    build_bloom,
)
from tests.conftest import SF_ORACLE


def _write_docs(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_gate_equals_plain_anti_join_with_planted_dupes(spark, tmp_path):
    # corpus = 40 docs; batch = 20 docs of which 8 duplicate corpus texts
    corpus = [f"corpus document number {i} with unique text" for i in range(40)]
    batch = [f"fresh batch document {i}" for i in range(12)] + [
        corpus[i] for i in (0, 5, 9, 14, 20, 26, 31, 39)  # true dupes
    ]
    sf = _write_docs(tmp_path, corpus + batch)
    got = {
        r["doc_id"]
        for r in bloom_gate_new_docs(spark, sf, min_doc_id=40).collect()
    }
    assert got == set(range(40, 52))  # the 12 fresh docs, none of the dupes


def test_no_false_negatives_and_fpp_near_design(spark):
    # no false negatives is structural (probe of an inserted key hits all
    # its own bits); measure the fpp on keys NOT inserted and check it
    # tracks the design point within a loose factor
    n = 20_000
    inserted = spark.range(0, n).select(
        _key_col_for_range("id").alias("key")
    )
    m, k = _bloom_params(n, 0.01)
    bloom = build_bloom(inserted, m, k)
    hits_in = (
        bloom_might_contain(inserted, bloom, m, k)
        .filter(F.col("maybe_seen"))
        .count()
    )
    assert hits_in == n  # zero false negatives
    fresh = spark.range(n, 3 * n).select(_key_col_for_range("id").alias("key"))
    fp = (
        bloom_might_contain(fresh, bloom, m, k)
        .filter(F.col("maybe_seen"))
        .count()
    )
    fpp = fp / (2 * n)
    assert fpp < 0.03, f"measured fpp {fpp} vs design 0.01"


def _key_col_for_range(col):
    # integer ids -> well-mixed 64-bit keys, same path the operator uses
    return F.xxhash64(F.sha2(F.col(col).cast("string"), 256))


def test_majority_exits_join_free(spark):
    # the scale claim: on the driver corpus (no cross-boundary dupes) the
    # definitely-new leg must carry ~(1 - fpp) of the batch — that is the
    # fraction that never joins at any corpus size
    from cc_mapreducer_spark.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents").select(
        "doc_id", F.sha2(F.col("text"), 256).alias("text_sha")
    )
    max_id = docs.agg(F.max("doc_id")).first()[0]
    cut = max_id * 4 // 5 + 1
    corpus = docs.filter(F.col("doc_id") < cut)
    batch = docs.filter(F.col("doc_id") >= cut)
    m, k = _bloom_params(corpus.count(), 0.01)
    bloom = build_bloom(corpus.select(_key_col("text_sha").alias("key")), m, k)
    probed = bloom_might_contain(
        batch.select("doc_id", _key_col("text_sha").alias("key")), bloom, m, k
    )
    n_batch = batch.count()
    n_maybe = probed.filter(F.col("maybe_seen")).count()
    # driver corpus plants no cross-boundary exact dupes -> every maybe
    # is a false positive; at 1% design fpp even 5% would be broken
    assert n_maybe <= max(2, int(0.05 * n_batch)), (n_maybe, n_batch)


def test_bloom_params_formula():
    m, k = _bloom_params(1_000_000, 0.01)
    assert 9.5 < m / 1_000_000 < 9.7  # -ln(.01)/ln2^2 = 9.585, byte-rounded
    assert k == 7
    # degenerate corpora still build a valid filter
    assert _bloom_params(0, 0.01)[0] >= 8


def test_positions_deterministic_and_spread():
    from cc_mapreducer_spark.operators.bloom import _probe_positions

    keys = np.arange(1000, dtype=np.uint64)
    a = _probe_positions(keys, 2**20, 7)
    b = _probe_positions(keys, 2**20, 7)
    assert (a == b).all()
    assert a.shape == (1000, 7)
    # double hashing must not collapse: the 7 positions per key distinct
    # for virtually every key, and global occupancy near-uniform
    distinct_per_key = np.array([len(set(r)) for r in a[:100]])
    assert (distinct_per_key == 7).mean() > 0.95
