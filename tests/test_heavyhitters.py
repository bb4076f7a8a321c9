"""Misra-Gries heavy hitters: the superset guarantee (hypothesis over
the pure kernel), exactness on a planted corpus, and the candidate
cardinality bound. Oracle parity runs in test_oracle_parity.py."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.heavyhitters import (
    _MG_K,
    _merge_summaries,
    _mg_fold,
    heavy_hitters_exact,
    mg_candidates,
)


def test_mg_superset_guarantee_property():
    # for ANY stream and any k: every item with true count > n/(k+1)
    # must survive the fold+merge — the guarantee the exact verify
    # stage builds on (a false negative is unrecoverable)
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        stream=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=500),
        k=st.integers(min_value=2, max_value=20),
        n_parts=st.integers(min_value=1, max_value=5),
    )
    def run(stream, k, n_parts):
        # partition the stream, fold each part, merge
        parts = []
        step = max(1, len(stream) // n_parts)
        for i in range(0, len(stream), step):
            counts: dict = {}
            for item in stream[i : i + step]:
                _mg_fold(counts, item, 1, k)
            parts.append(counts)
        merged = _merge_summaries(parts, k)
        true = Counter(stream)
        n = len(stream)
        for item, c in true.items():
            if c > n / (k + 1):
                assert item in merged, (item, c, n, k)

    run()


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


def test_planted_heavy_hitters_exact(spark, tmp_path):
    # 'whale' appears 300 times, 'minnow' 4 times, filler words once
    # each; threshold 10 must return exactly the whale with its exact
    # count — sketch-gated path vs ground truth
    texts = ["whale " * 30] * 10 + ["minnow unique%d word%d" % (i, i) for i in range(4)]
    sf = _write_docs(tmp_path, texts)
    from cc_mapreducer_spark.operators.text_analysis import _SPARK_WORDS
    from cc_mapreducer_spark.tables import load_table, spread

    words = spread(load_table(spark, sf, "documents")).select(
        F.explode(F.expr(_SPARK_WORDS)).alias("word")
    )
    got = {(r["word"], r["cnt"]) for r in heavy_hitters_exact(words, "word", 10).collect()}
    assert got == {("whale", 300)}


def test_candidate_set_bounded_by_k(spark, tmp_path):
    texts = [" ".join(f"w{i}_{j}" for j in range(50)) for i in range(40)]
    sf = _write_docs(tmp_path, texts)
    from cc_mapreducer_spark.operators.text_analysis import _SPARK_WORDS
    from cc_mapreducer_spark.tables import load_table, spread

    words = spread(load_table(spark, sf, "documents")).select(
        F.explode(F.expr(_SPARK_WORDS)).alias("word")
    )
    cand = mg_candidates(words, "word")
    # 2000 distinct words, but the candidate set (the only thing that
    # reaches the exact count's shuffle) stays <= k
    assert len(cand) <= _MG_K
