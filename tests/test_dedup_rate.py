"""Per-source dedup telemetry (dedup.dedup_rate_by_source): canonical
ownership is the GLOBAL min doc_id, so a source re-hosting another
source's content is charged for the copies while the originating source
keeps the canonical."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from cc_mapreducer_spark.operators.dedup import dedup_rate_by_source


def test_cross_source_copy_attribution(spark, tmp_path):
    rows = [
        # srcA originates two documents (doc 1 canonical of "alpha beta")
        (1, "alpha beta gamma", "srcA"),
        (2, "delta epsilon", "srcA"),
        # srcB re-hosts doc 1's content twice and adds one original
        (3, "alpha beta gamma", "srcB"),
        (4, "alpha beta gamma", "srcB"),
        (5, "zeta eta theta iota", "srcB"),
    ]
    docs = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    d = str(tmp_path)
    pq.write_table(docs, f"{d}/documents.parquet")
    out = {r["source"]: r for r in dedup_rate_by_source(spark, d).collect()}
    a, b = out["srcA"], out["srcB"]
    assert a["n_docs"] == 2 and a["n_dup_docs"] == 0 and a["tokens_wasted"] == 0
    assert b["n_docs"] == 3 and b["n_canonical"] == 1  # only its original
    assert b["n_dup_docs"] == 2
    assert b["tokens_wasted"] == 6  # two 3-token copies
    assert abs(b["dup_doc_frac"] - round(2 / 3, 6)) < 1e-9
