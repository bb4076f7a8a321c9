"""Count-min sketch: one-sided guarantee on a planted corpus, exactness
for isolated heavy items, mergeability (cell-wise sum == rebuild over
the union), and the bounded-cell invariant. Oracle parity for
cms_word_counts runs in test_oracle_parity.py."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.sketches import (
    _CMS_D,
    _CMS_W,
    build_cms,
    cms_estimate,
    merge_cms,
)


def _write_docs(tmp_path, texts, sub="sf"):
    d = tmp_path / sub
    d.mkdir(exist_ok=True)
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, f"{d}/documents.parquet")
    return str(d)


def _words(spark, sf):
    from cc_mapreducer_spark.operators.text_analysis import _SPARK_WORDS
    from cc_mapreducer_spark.tables import load_table, spread

    return spread(load_table(spark, sf, "documents")).select(
        F.explode(F.expr(_SPARK_WORDS)).alias("word")
    )


def test_cms_never_underestimates(spark, tmp_path):
    # the one-sided guarantee holds for EVERY item, not just heavy ones
    texts = ["whale " * 40] * 5 + [
        "minnow shrimp krill plankton barnacle urchin"
    ] * 3
    words = _words(spark, _write_docs(tmp_path, texts))
    sketch = build_cms(words)
    true = words.groupBy("word").agg(F.count("*").alias("true_cnt"))
    est = cms_estimate(sketch, true.select("word"))
    rows = true.join(est, "word").collect()
    assert rows, "planted corpus produced no words"
    for r in rows:
        assert r["cms_est"] >= r["true_cnt"], r


def test_cms_cell_count_bounded(spark, tmp_path):
    # 2000 distinct words, but the sketch (the only groupBy output) has
    # at most d*w rows — the constant-shuffle claim
    texts = [" ".join(f"w{i}x{j}" for j in range(50)) for i in range(40)]
    words = _words(spark, _write_docs(tmp_path, texts))
    sketch = build_cms(words).collect()
    assert len(sketch) <= _CMS_D * _CMS_W
    assert {(r["i"]) for r in sketch} <= set(range(_CMS_D))
    assert all(0 <= r["col"] < _CMS_W for r in sketch)


def test_cms_merge_equals_rebuild(spark, tmp_path):
    # linearity: sketch(A) + sketch(B) == sketch(A ++ B), cell for cell
    texts_a = ["alpha beta gamma " * 5] * 4
    texts_b = ["beta delta epsilon " * 3] * 6
    wa = _words(spark, _write_docs(tmp_path, texts_a, "a"))
    wb = _words(spark, _write_docs(tmp_path, texts_b, "b"))
    merged = {
        (r["i"], r["col"]): r["c"]
        for r in merge_cms(build_cms(wa), build_cms(wb)).collect()
    }
    rebuilt = {
        (r["i"], r["col"]): r["c"]
        for r in build_cms(wa.unionByName(wb)).collect()
    }
    assert merged == rebuilt


def test_cms_exact_when_no_collisions(spark, tmp_path):
    # a single very heavy word: its estimate can only be inflated by the
    # few filler words, so est - true <= total filler occurrences; and
    # with the filler count tiny relative to the heavy count the probe
    # identifies the heavy item's count to within that slack
    texts = ["whale " * 100] * 10 + ["plankton krill"]
    words = _words(spark, _write_docs(tmp_path, texts))
    sketch = build_cms(words)
    est = {
        r["word"]: r["cms_est"]
        for r in cms_estimate(
            sketch, spark.createDataFrame([("whale",)], "word string")
        ).collect()
    }
    assert 1000 <= est["whale"] <= 1002


def test_cms_registered_contract(spark, tmp_path):
    from cc_mapreducer_spark.operators.sketches import cms_word_counts

    texts = ["whale " * 50] * 6 + ["minnow shrimp krill"] * 2
    sf = _write_docs(tmp_path, texts)
    rows = cms_word_counts(spark, sf).collect()
    by_word = {r["word"]: r for r in rows}
    assert by_word["whale"]["true_cnt"] == 300
    for r in rows:
        assert r["overcount"] >= 0
        assert r["cms_est"] == r["true_cnt"] + r["overcount"]


def test_cms_empty_corpus(spark, tmp_path):
    from cc_mapreducer_spark.operators.sketches import cms_word_counts

    sf = _write_docs(tmp_path, [])
    assert cms_word_counts(spark, sf).count() == 0


def test_cms_unseen_item_estimates_zero_when_cells_clear(spark, tmp_path):
    # an item the stream never touched estimates via min over its cells
    # INCLUDING absent (zero) ones: with a near-empty sketch the unseen
    # probe must come back 0, not inflated or missing
    texts = ["whale whale whale"]
    words = _words(spark, _write_docs(tmp_path, texts))
    sketch = build_cms(words)
    est = cms_estimate(
        sketch,
        spark.createDataFrame([("zorbulon",), ("whale",)], "word string"),
    ).collect()
    by = {r["word"]: r["cms_est"] for r in est}
    assert by["whale"] == 3
    # 4 cells vs a 1-item sketch: collision of ALL 4 is md5-improbable;
    # any clear cell forces the min to 0
    assert by["zorbulon"] == 0
