"""Resumable staged pipelines: the reference's stage chain, Spark-style.

The reference engine (/root/reference/src/index.js) runs read -> map ->
shuffle -> reduce -> concat as separate invocations handing off through
materialized intermediate files, which buys it one property Spark's
single-plan execution doesn't give by default: a crashed run resumes
from the last completed stage instead of starting over. At 100 TB that
property matters again — a 12-hour curation DAG should not repeat its
finished dedup pass because packing died.

run_stages() provides it on Spark terms:

  * each stage is fn(spark, upstream_results) -> DataFrame,
  * results materialize to `<workdir>/<stage>` parquet via the atomic
    _SUCCESS marker Spark's committer already writes,
  * a stage whose output exists is SKIPPED — downstream stages read the
    parquet (which also truncates lineage between stages, the same role
    localCheckpoint plays in the iterative operators),
  * force=[names] re-runs EXACTLY those stages — downstream stages are
    NOT invalidated in the same call (read their existing parquet); pass
    them in force too to propagate. (Invalidation is by name;
    content-addressed fingerprints are the production extension and are
    deliberately out of scope — at scale they live in the orchestrator,
    not the engine).

This is scheduling-as-data, not scheduling-as-code: the stage list IS
the DAG (linear chains cover the reference's shape; fan-in arrives via
the results dict each fn receives).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

StageFn = Callable[[SparkSession, dict[str, DataFrame]], DataFrame]


def stage_complete(workdir: str, name: str) -> bool:
    return os.path.exists(os.path.join(workdir, name, "_SUCCESS"))


def run_stages(
    spark: SparkSession,
    stages: list[tuple[str, StageFn]],
    workdir: str,
    force: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Run (or resume) a staged pipeline. Returns {stage: DataFrame}
    reading each stage's materialized parquet — completed stages are
    never recomputed unless named in ``force``. Raises on duplicate
    stage names (silent shadowing would corrupt resumes)."""
    names = [n for n, _ in stages]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate stage names: {names}")
    force_set = set(force or [])
    unknown = force_set - set(names)
    if unknown:  # a typo'd force name must not silently re-run nothing
        raise ValueError(f"force names not in pipeline: {sorted(unknown)}")
    results: dict[str, DataFrame] = {}
    for name, fn in stages:
        out = os.path.join(workdir, name)
        if name in force_set or not stage_complete(workdir, name):
            fn(spark, results).write.mode("overwrite").parquet(out)
        results[name] = spark.read.parquet(out)
    return results
