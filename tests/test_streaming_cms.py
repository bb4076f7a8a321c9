"""Streaming count-min (streaming/cms.py): the drained stream's merged
sketch is cell-identical to the batch sketch over the whole corpus
(linearity), the length sentinel accretes exactly, replays are
byte-idempotent, and estimates from the merged sketch keep the
one-sided guarantee."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.sketches import build_cms, cms_estimate
from cc_mapreducer_spark.operators.text_analysis import _SPARK_WORDS
from cc_mapreducer_spark.streaming.cms import (
    read_cms,
    stream_word_cms,
    write_cms_partial,
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
    import shutil

    for i in range(n_slices):
        sub = os.path.join(dst, f"slice{i}")
        for f in os.listdir(sub):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(sub, f), os.path.join(dst, f"s{i}.parquet"))
        shutil.rmtree(sub)


def _words(df):
    return df.select(F.explode(F.expr(_SPARK_WORDS)).alias("word"))


def _cells(df):
    return {(r["i"], r["col"]): r["c"] for r in df.collect()}


def test_drained_stream_sketch_equals_batch_sketch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _slice_documents(spark, src)
    path, ckpt = str(tmp_path / "cms"), str(tmp_path / "ckpt")
    stream_word_cms(
        spark, src, DOC_SCHEMA, path, ckpt, max_files_per_trigger=1
    )
    corpus_words = _words(spark.read.parquet(src))
    merged, n = read_cms(spark, path)
    assert n == corpus_words.count()
    assert _cells(merged) == _cells(build_cms(corpus_words))
    # estimates from the merged sketch keep the one-sided guarantee
    true = corpus_words.groupBy("word").agg(F.count("*").alias("t"))
    est = cms_estimate(merged, true.select("word"))
    for r in true.join(est, "word").collect():
        assert r["cms_est"] >= r["t"], r


def test_replay_is_idempotent(spark, tmp_path):
    # rewriting batch 1 with the same slice leaves the merged sketch and
    # the length sentinel unchanged — dynamic overwrite, not append
    src = str(tmp_path / "src")
    os.makedirs(src)
    _slice_documents(spark, src)
    path = str(tmp_path / "cms")
    slices = sorted(
        f for f in os.listdir(src) if f.endswith(".parquet")
    )
    for i, f in enumerate(slices):
        words = _words(spark.read.parquet(os.path.join(src, f)))
        write_cms_partial(words, i, path)
    before_cells = _cells(read_cms(spark, path)[0])
    before_n = read_cms(spark, path)[1]
    # checkpoint rollback: batch 1 fires again with identical content
    words1 = _words(spark.read.parquet(os.path.join(src, slices[1])))
    write_cms_partial(words1, 1, path)
    merged, n = read_cms(spark, path)
    assert _cells(merged) == before_cells
    assert n == before_n


def test_empty_batch_writes_only_sentinel(spark, tmp_path):
    path = str(tmp_path / "cms")
    empty = spark.createDataFrame([], "word string")
    write_cms_partial(empty, 0, path)
    merged, n = read_cms(spark, path)
    assert n == 0
    assert merged.count() == 0
