"""Contrastive negative mining: near-duplicates are never emitted as
negatives (the false-negative filter), ranks are dense and capped,
determinism across runs. Oracle parity runs in test_oracle_parity.py."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from cc_mapreducer_spark.operators.contrastive import (
    _KN,
    contrastive_negatives,
)


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


def test_near_duplicates_never_sampled_as_negatives(spark, tmp_path):
    # docs 0 and 1 are near-identical (share every shingle -> every
    # band); with only 3 docs the 12 hash jumps cover all ids, so the
    # filter is what keeps 1 out of 0's negatives and vice versa
    base = "the quick brown fox jumps over the lazy dog again and again"
    sf = _write_docs(
        tmp_path,
        [
            base,
            base + " extra",
            "completely different text about spark shuffles and parquet footers",
        ],
    )
    rows = contrastive_negatives(spark, sf).collect()
    negs = {}
    for r in rows:
        negs.setdefault(r["doc_id"], set()).add(r["neg_id"])
    assert 1 not in negs.get(0, set())
    assert 0 not in negs.get(1, set())
    # the distinct doc is a legitimate negative for both near-dups
    assert 2 in negs.get(0, set())
    assert 2 in negs.get(1, set())
    # and no anchor ever lists itself
    for r in rows:
        assert r["neg_id"] != r["doc_id"]


def test_ranks_dense_capped_and_deterministic(spark):
    sf = "/root/testdata/sf0.01"
    a = contrastive_negatives(spark, sf).collect()
    b = contrastive_negatives(spark, sf).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_doc = {}
    for r in a:
        per_doc.setdefault(r["doc_id"], []).append(r["rank"])
    for doc, ranks in per_doc.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), doc
        assert len(ranks) <= _KN
    # duplicates collapse: a negative appears at most once per anchor
    for doc in per_doc:
        ids = [r["neg_id"] for r in a if r["doc_id"] == doc]
        assert len(ids) == len(set(ids))
