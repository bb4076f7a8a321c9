"""Sources (§2.1 source_list/source_read) and sinks (sink_stage/
sink_concat) — driven end-to-end through real files."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cc_mapreducer_spark import registry
from cc_mapreducer_spark.sources import read_text_corpus, read_wholetext_corpus
from cc_mapreducer_spark.sources.sinks import write_concat_text, write_stage
from tests.conftest import SF_SMOKE


def _make_corpus(tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("Listen silent\nenlist")
    (d / "b.txt").write_text("dog god")
    return str(d)


def test_read_text_corpus_line_granular(spark, tmp_path):
    path = _make_corpus(tmp_path)
    df = read_text_corpus(spark, f"{path}/*.txt")
    rows = df.collect()
    assert len(rows) == 3  # 2 lines + 1 line
    assert all(r.file.endswith(".txt") for r in rows)


def test_read_wholetext_corpus_one_row_per_file(spark, tmp_path):
    path = _make_corpus(tmp_path)
    df = read_wholetext_corpus(spark, f"{path}/*.txt")
    rows = {os.path.basename(r.file): r.value for r in df.collect()}
    assert rows["a.txt"] == "Listen silent\nenlist"
    assert rows["b.txt"] == "dog god"


def test_anagram_pipeline_over_file_corpus(spark, tmp_path):
    """The reference's actual input contract: *.txt files in, one text
    file of `sig: { members }` lines out (D1 -> D4 through real files)."""
    from cc_mapreducer_spark.operators.anagram import (
        op_filter_minlen,
        op_filter_stopwords,
        op_group_anagrams,
        op_map_signature,
        op_tokenize,
    )

    path = _make_corpus(tmp_path)
    docs = read_text_corpus(spark, f"{path}/*.txt").select(F.col("value").alias("text"))
    groups = op_group_anagrams(
        op_map_signature(op_filter_stopwords(op_filter_minlen(op_tokenize(docs))))
    )
    lines = groups.select(
        F.format_string("%s: { %s }", "signature", F.array_join("words", ", ")).alias("line")
    )
    out = str(tmp_path / "out")
    part = write_concat_text(lines, "line", out)
    content = sorted(open(part).read().strip().split("\n"))
    assert content == ["dgo: { dog, god }", "eilnst: { enlist, listen, silent }"]


def test_write_stage_roundtrip(spark, tmp_path):
    from cc_mapreducer_spark.operators.anagram import q_tokenize_wordcount as q
    df = q(spark, SF_SMOKE)
    out = str(tmp_path / "stage")
    write_stage(df, out)
    back = spark.read.parquet(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_write_stage_partitioned(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], ["id", "k"])
    out = str(tmp_path / "part")
    write_stage(df, out, partition_by=["k"])
    assert os.path.isdir(os.path.join(out, "k=a"))
    back = spark.read.parquet(out)
    assert back.count() == 3


def test_write_concat_text_preserves_null_rows(spark, tmp_path):
    """NULL column values must still produce a line (empty), keeping the
    one-line-per-row contract — the text writer silently omits null rows."""
    from cc_mapreducer_spark.sources.sinks import write_concat_text

    df = spark.createDataFrame([("a",), (None,), ("b",)], "v string")
    part = write_concat_text(df, "v", str(tmp_path / "out"))
    with open(part) as f:
        lines = f.read().splitlines()
    assert sorted(lines) == ["", "a", "b"]
