"""Streaming PSI drift monitor: a multi-batch replay of the current
slice against a frozen reference must reproduce the batch
`psi_value_drift` report EXACTLY (shared bin expression + shared PSI
arithmetic make the equality structural), and replays must not
double-count."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.dq import _PSI_SPLIT, psi_value_drift
from cc_mapreducer_spark.streaming.drift import (
    read_psi_drift,
    reference_bin_counts,
    stream_psi_partials,
    write_psi_partial,
)
from cc_mapreducer_spark.tables import load_table
from tests.conftest import SF_ORACLE


def _halves(spark):
    e = load_table(spark, SF_ORACLE, "events")
    cut = F.lit(_PSI_SPLIT).cast("timestamp")
    return e.filter(F.col("ts") < cut), e.filter(F.col("ts") >= cut)


def test_streamed_psi_equals_batch_report(spark, tmp_path):
    ref_df, cur_df = _halves(spark)
    reference = reference_bin_counts(ref_df).cache()
    src = str(tmp_path / "cur_src")
    cur_df.repartition(3).write.parquet(src)
    partials = str(tmp_path / "psi_partials")
    stream_psi_partials(
        spark, src, cur_df.schema, partials, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    assert (
        len([d for d in os.listdir(partials) if d.startswith("batch_id=")]) == 3
    )
    got = sorted(map(tuple, read_psi_drift(spark, partials, reference).collect()))
    expect = sorted(map(tuple, psi_value_drift(spark, SF_ORACLE).collect()))
    assert got == expect


def test_replayed_batch_does_not_double_count(spark, tmp_path):
    ref_df, cur_df = _halves(spark)
    reference = reference_bin_counts(ref_df).cache()
    partials = str(tmp_path / "psi_partials")
    write_psi_partial(cur_df, 0, partials)
    once = sorted(map(tuple, read_psi_drift(spark, partials, reference).collect()))
    write_psi_partial(cur_df, 0, partials)  # checkpoint-rollback replay
    assert (
        sorted(map(tuple, read_psi_drift(spark, partials, reference).collect()))
        == once
    )
    # a genuinely new batch DOES shift the distribution
    write_psi_partial(cur_df.filter(F.col("value") > 400), 1, partials)
    shifted = {
        r.bin: r.n_cur
        for r in read_psi_drift(spark, partials, reference).collect()
    }
    base = {r[0]: r[2] for r in once}
    assert sum(shifted.values()) > sum(base.values())


def test_identical_distributions_read_near_zero_psi(spark, tmp_path):
    ref_df, _ = _halves(spark)
    reference = reference_bin_counts(ref_df).cache()
    partials = str(tmp_path / "psi_partials")
    write_psi_partial(ref_df, 0, partials)  # stream the reference itself
    rows = read_psi_drift(spark, partials, reference).collect()
    assert rows and all(abs(r.psi_total) < 0.001 for r in rows)
