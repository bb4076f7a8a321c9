"""Text-corpus sources (SURVEY §2.1 source_list / source_read).

The reference enumerates `input/*.txt` GCS objects and downloads each whole
object as one string (src/index.js:145-146,182). Spark's file source
subsumes both: a glob scan enumerates + splits files in parallel, and
`wholetext` reproduces the one-string-per-file semantics when per-document
granularity matters. `input_file_name()` recovers the per-file lineage the
reference encodes in its `map_<name>` object names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Line-granular scan: DataFrame[file: string, value: string].

    For tokenization workloads line granularity is equivalent to whole-file
    (tokens never span a source line in the corpus contract) and splits far
    better at scale: a 10 GB file becomes many input splits instead of one
    128 MB+ single-task string."""
    return spark.read.text(path).withColumn("file", F.input_file_name())


def read_wholetext_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file semantics, byte-faithful to the reference's
    `bucket.file(f).download()` (src/index.js:182). One row per file — only
    for small-document corpora; prefer read_text_corpus at scale."""
    return (
        spark.read.format("text")
        .option("wholetext", True)
        .load(path)
        .withColumn("file", F.input_file_name())
    )
