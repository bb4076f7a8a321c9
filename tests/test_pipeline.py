"""Resumable staged pipelines: completed stages skipped on resume,
forced stages re-run, results correct end-to-end."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cc_mapreducer_spark.plans.pipeline import run_stages, stage_complete
from cc_mapreducer_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _stages():
    def tokenize(spark, _):
        docs = load_table(spark, SF_SMOKE, "documents")
        return docs.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(
                        F.regexp_replace(F.lower("text"), "[^a-z]+", " "), " "
                    ),
                    lambda w: w != F.lit(""),
                )
            ).alias("word"),
        )

    def counts(spark, results):
        return results["tokenize"].groupBy("word").agg(
            F.count("*").alias("n")
        )

    def top(spark, results):
        return results["counts"].orderBy(F.desc("n"), "word").limit(5)

    return [("tokenize", tokenize), ("counts", counts), ("top", top)]



def _mtimes_for(workdir, names):
    out = {}
    for name in names:
        d = os.path.join(workdir, name)
        out[name] = {
            f: os.stat(os.path.join(d, f)).st_mtime_ns
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }
    return out


def _mtimes(workdir):
    return _mtimes_for(workdir, ("tokenize", "counts", "top"))


def test_pipeline_runs_resumes_and_forces(spark, tmp_path):
    wd = str(tmp_path / "wd")
    r1 = run_stages(spark, _stages(), wd)
    assert all(stage_complete(wd, n) for n in ("tokenize", "counts", "top"))
    top1 = [(r["word"], r["n"]) for r in r1["top"].collect()]
    assert len(top1) == 5 and top1 == sorted(top1, key=lambda t: (-t[1], t[0]))

    before = _mtimes(wd)
    r2 = run_stages(spark, _stages(), wd)  # resume: nothing recomputed
    assert _mtimes(wd) == before
    assert [(r["word"], r["n"]) for r in r2["top"].collect()] == top1

    r3 = run_stages(spark, _stages(), wd, force=["top"])  # re-run one
    after = _mtimes(wd)
    assert after["tokenize"] == before["tokenize"]
    assert after["counts"] == before["counts"]
    assert after["top"] != before["top"]  # rewritten
    assert [(r["word"], r["n"]) for r in r3["top"].collect()] == top1


def test_pipeline_resumes_from_crash_point(spark, tmp_path):
    import shutil

    wd = str(tmp_path / "wd")
    run_stages(spark, _stages(), wd)
    # simulate a crash mid-pipeline: the LAST stage's output vanished
    shutil.rmtree(os.path.join(wd, "top"))
    before = _mtimes_for(wd, ("tokenize",))
    r = run_stages(spark, _stages(), wd)
    # earlier stages untouched; the missing one re-ran
    assert _mtimes_for(wd, ("tokenize",)) == before
    assert r["top"].count() == 5


def test_pipeline_rejects_duplicate_names(spark, tmp_path):
    import pytest

    s = _stages()
    with pytest.raises(ValueError):
        run_stages(spark, s + [s[0]], str(tmp_path / "wd"))
    with pytest.raises(ValueError):  # typo'd force must fail loudly
        run_stages(spark, s, str(tmp_path / "wd2"), force=["tpo"])


def test_resumable_curation_dag_end_to_end(spark, tmp_path):
    """The REAL curation DAG's outputs materialized behind _SUCCESS
    markers with a no-recompute resume. (Stage fns here rebuild the
    curate_corpus plan rather than reading `results` — this test pins
    materialization + resume of the DAG outputs; the parquet handoff
    BETWEEN stages is pinned by the wordcount pipeline tests above.)"""
    from cc_mapreducer_spark.operators.curation import curate_corpus

    def mk(stage_name):
        def fn(spark_, results):
            # curate_corpus is lazy; re-invoking it per stage is plan
            # construction only — materialization happens via run_stages
            return curate_corpus(spark_, SF_SMOKE)[stage_name]

        return fn

    stages = [(n, mk(n)) for n in ("quality", "keepers", "train", "packed")]
    wd = str(tmp_path / "wd")
    r1 = run_stages(spark, stages, wd)
    counts1 = {n: r1[n].count() for n in r1}
    assert counts1["quality"] > 0
    assert 0 < counts1["keepers"] <= counts1["quality"]
    assert 0 < counts1["train"] <= counts1["keepers"]
    assert counts1["packed"] > 0

    before = _mtimes_for(wd, list(r1))
    r2 = run_stages(spark, stages, wd)  # resume: byte-for-byte untouched
    assert _mtimes_for(wd, list(r2)) == before
    assert {n: r2[n].count() for n in r2} == counts1

