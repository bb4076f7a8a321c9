"""Streaming Misra-Gries heavy hitters (streaming/heavyhitters.py):
the drained stream equals the batch operator on the real corpus, a
planted hot token survives real decrements at small k, replays are
byte-idempotent, and the n/(k+1) mergeable-summaries bound holds
item-wise."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.heavyhitters import heavy_hitter_words
from cc_mapreducer_spark.operators.text_analysis import _SPARK_WORDS
from cc_mapreducer_spark.streaming.heavyhitters import (
    read_mg_summary,
    stream_word_hitters,
    streaming_heavy_hitters_exact,
    write_mg_partial,
)

SF_ORACLE = "/root/testdata/sf0.01"
DOC_SCHEMA = "doc_id long, text string"


def _slice_documents(spark, dst, n_slices=3):
    docs = spark.read.parquet(os.path.join(SF_ORACLE, "documents.parquet")).select(
        "doc_id", "text"
    )
    for i in range(n_slices):
        docs.filter(F.col("doc_id") % n_slices == i).coalesce(1).write.parquet(
            os.path.join(dst, f"slice{i}")
        )
    # flatten: the readStream source dir wants files, not subdirs
    import shutil

    for i in range(n_slices):
        sub = os.path.join(dst, f"slice{i}")
        for f in os.listdir(sub):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(sub, f), os.path.join(dst, f"s{i}.parquet"))
        shutil.rmtree(sub)
    return docs


def _words(df):
    return df.select(F.explode(F.expr(_SPARK_WORDS)).alias("word"))


def test_drained_stream_equals_batch_operator(spark, tmp_path):
    """availableNow drain over 3 corpus slices, then the gated exact
    answer == the batch heavy_hitter_words rows exactly."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    docs = _slice_documents(spark, src)
    path, ckpt = str(tmp_path / "mg"), str(tmp_path / "ckpt")
    stream_word_hitters(
        spark, src, DOC_SCHEMA, path, ckpt, k=512, max_files_per_trigger=1
    )
    corpus_words = _words(spark.read.parquet(src))
    n = corpus_words.count()
    threshold = -(-n // 200)
    got = sorted(
        map(tuple, streaming_heavy_hitters_exact(
            spark, path, corpus_words, "word", threshold, k=512
        ).collect())
    )
    want = sorted(map(tuple, heavy_hitter_words(spark, SF_ORACLE).collect()))
    assert got == want and len(got) > 0
    # the stream really was sliced: one partial partition per file
    batches = {d for d in os.listdir(path) if d.startswith("batch_id=")}
    assert len(batches) == 3


def test_planted_hot_token_survives_small_k(spark, tmp_path):
    """k=8 over a >8-word vocabulary forces real fold decrements; the
    planted hot word must survive every cut and the exact verify must
    discard all false positives."""
    # letter-only words: the shared tokenizer strips digits
    vocab = [f"w{chr(97 + i // 5)}{chr(97 + i % 5)}" for i in range(20)]
    rows = []
    doc = 0
    for b in range(3):
        for i, w in enumerate(vocab):
            rows.append((doc, (w + " ") * (2 + (i + b) % 3)))
            doc += 1
        rows.append((doc, "hotword " * 120))
        doc += 1
    path = str(tmp_path / "mg")
    for b in range(3):
        batch = spark.createDataFrame(rows[b * 21 : (b + 1) * 21], DOC_SCHEMA)
        write_mg_partial(_words(batch), b, path, "word", k=8)

    corpus = _words(spark.createDataFrame(rows, DOC_SCHEMA))
    exact = {r["word"]: r["cnt"] for r in corpus.groupBy("word").agg(
        F.count("*").cast("bigint").alias("cnt")
    ).collect()}
    n = sum(exact.values())
    assert len(exact) > 8  # decrement regime is real

    cand, n_read = read_mg_summary(spark, path, k=8)
    assert n_read == n  # sentinel accounting is exact
    lower = {r["item"]: r["c_lower"] for r in cand.collect()}
    assert len(lower) <= 8
    assert "hotword" in lower  # 360 occurrences > n/9: certified survival

    bound = n // 9
    for item, lo in lower.items():
        assert lo <= exact[item] <= lo + bound
    for item, c in exact.items():
        if item not in lower:
            assert c <= bound  # only sub-line items may be cut

    threshold = bound + 1
    got = sorted(map(tuple, streaming_heavy_hitters_exact(
        spark, path, corpus, "word", threshold, k=8
    ).collect()))
    want = sorted((w, c) for w, c in exact.items() if c >= threshold)
    assert got == want == [("hotword", 360)]


def test_replay_is_idempotent(spark, tmp_path):
    """Re-writing a batch's partial with the same data (checkpoint
    rollback) leaves the serving summary identical — dynamic overwrite
    rewrites, never adds."""
    path = str(tmp_path / "mg")
    batches = [
        spark.createDataFrame(
            [(i, "alpha beta gamma " * (b + 1)) for i in range(4)], DOC_SCHEMA
        )
        for b in range(3)
    ]
    for b, df in enumerate(batches):
        write_mg_partial(_words(df), b, path, "word", k=16)
    before_cand, before_n = read_mg_summary(spark, path, k=16)
    before = sorted(map(tuple, before_cand.collect()))

    write_mg_partial(_words(batches[1]), 1, path, "word", k=16)  # replay
    after_cand, after_n = read_mg_summary(spark, path, k=16)
    assert sorted(map(tuple, after_cand.collect())) == before
    assert after_n == before_n


def test_threshold_below_guarantee_line_is_rejected(spark, tmp_path):
    """A threshold the summary cannot certify must raise, not silently
    return false negatives."""
    import pytest

    path = str(tmp_path / "mg")
    df = spark.createDataFrame([(0, "x y z " * 50)], DOC_SCHEMA)
    write_mg_partial(_words(df), 0, path, "word", k=2)
    corpus = _words(df)
    with pytest.raises(ValueError, match="certified line"):
        streaming_heavy_hitters_exact(spark, path, corpus, "word", 10, k=2)
