"""Sinks (SURVEY.md §2.1: sink_stage / sink_concat / sink_cleanup).

The reference materializes EVERY stage to GCS (its only inter-operator
channel, src/index.js:188,229,276-277,335) and finishes by concatenating
partition files into one text object (src/index.js:368-377) then deleting
temps (src/index.js:382). In Spark, stages pipeline in memory, so:

  sink_stage    -> an explicit checkpoint write (parquet), used only where
                   an intermediate is genuinely reused across jobs
  sink_concat   -> single-file text output; coalesce(1) at small scale
                   (one writer task), partitioned write + manual cat for
                   outputs too large for one task
  sink_cleanup  -> nothing to clean (no cross-stage temp objects); callers
                   may clear the table cache

Scale note: coalesce(1) funnels the whole result through one task — fine
for the reference's ~KB result file, wrong for bulk data. write_stage is
the bulk path (parallel writers, partitionBy pruning).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, functions as F


def write_stage(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Checkpoint an intermediate as parquet (the reference's sink_stage,
    minus the per-stage mandatory materialization)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_concat_text(df: DataFrame, column: str, out_dir: str) -> str:
    """sink_concat: one text file with one line per row of `column`
    (the reference's OUTPUT_PATH/<runId>.txt). Returns the part-file path.

    coalesce(1) (not repartition(1)) — upstream stages keep their
    parallelism; only the final write funnels to one task. NULL values
    render as empty lines: the text writer OMITS null rows entirely,
    which would silently break the one-line-per-row contract."""
    df.select(
        F.coalesce(F.col(column).cast("string"), F.lit("")).alias("value")
    ).coalesce(1).write.mode("overwrite").text(out_dir)
    parts = glob.glob(os.path.join(out_dir, "part-*"))
    assert len(parts) == 1, f"expected one part file, got {parts}"
    return parts[0]
