"""Deterministic sampling / split operators: DuckDB hash-parity (every
operator is oracle-expressible by design), determinism across reruns,
and the exactness guarantees the docstrings promise."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.sampling import (
    bernoulli_sample,
    deterministic_split,
    domain_quota,
    stratified_exact_sample,
    uniform_topk,
)
from cc_mapreducer_spark.tables import load_table
from tests.conftest import SF_ORACLE
from tests.oracle import compare_frames, duckdb_connection

_HASH = (
    "(('0x' || substr(md5('{salt}:' || CAST({key} AS VARCHAR)), 1, 8))::BIGINT"
    " / 4294967296.0)"
)


def _docs(spark):
    return load_table(spark, SF_ORACLE, "documents")


def test_split_parity_and_coverage(spark):
    out = deterministic_split(
        _docs(spark).select("doc_id"), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    h = _HASH.format(salt="split-v1", key="doc_id")
    con = duckdb_connection(SF_ORACLE)
    oracle = con.sql(
        f"""
        SELECT doc_id,
               CASE WHEN {h} < 0.8 THEN 'train'
                    WHEN {h} < 0.9 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
        """
    ).df()
    compare_frames(out.toPandas(), oracle, "deterministic_split")
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert n == _docs(spark).count()
    assert abs(counts["train"] / n - 0.8) < 0.05


def test_bernoulli_parity(spark):
    out = bernoulli_sample(_docs(spark).select("doc_id"), "doc_id", 0.3)
    h = _HASH.format(salt="sample-v1", key="doc_id")
    con = duckdb_connection(SF_ORACLE)
    oracle = con.sql(
        f"SELECT doc_id FROM documents WHERE {h} < 0.3"
    ).df()
    compare_frames(out.toPandas(), oracle, "bernoulli_sample")
    assert 0 < out.count() < _docs(spark).count()


def test_stratified_exact_parity(spark):
    frac = 0.25
    out = stratified_exact_sample(
        _docs(spark).select("doc_id", "source"), "source", "doc_id", frac
    )
    h = _HASH.format(salt="strata-v1", key="doc_id")
    con = duckdb_connection(SF_ORACLE)
    oracle = con.sql(
        f"""
        WITH ranked AS (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source ORDER BY {h}, doc_id) AS rn,
                   count(*) OVER (PARTITION BY source) AS n
            FROM documents
        )
        SELECT doc_id, source FROM ranked WHERE rn <= ceil(n * 0.25)
        """
    ).df()
    compare_frames(out.toPandas(), oracle, "stratified_exact_sample")
    # exactly ceil(frac * n) per stratum
    full = {r.source: r.n for r in _docs(spark).groupBy("source").agg(F.count("*").alias("n")).collect()}
    got = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for s, n in full.items():
        assert got[s] == math.ceil(n * frac)


def test_domain_quota_parity_and_cap(spark):
    quota = 30
    out = domain_quota(_docs(spark).select("doc_id", "source"), "source", "doc_id", quota)
    h = _HASH.format(salt="quota-v1", key="doc_id")
    con = duckdb_connection(SF_ORACLE)
    oracle = con.sql(
        f"""
        WITH ranked AS (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source ORDER BY {h}, doc_id) AS rn
            FROM documents
        )
        SELECT doc_id, source FROM ranked WHERE rn <= {quota}
        """
    ).df()
    compare_frames(out.toPandas(), oracle, "domain_quota")
    for r in out.groupBy("source").agg(F.count("*").alias("n")).collect():
        assert r.n <= quota


def test_domain_quota_salted_equals_single_window(spark):
    """The two-phase sharded execution must be row-identical to the
    naive one-window formulation for every shard count — sharding is
    placement, never semantics."""
    from cc_mapreducer_spark.operators.sampling import _unit_hash
    from pyspark.sql import Window

    docs = _docs(spark).select("doc_id", "source")
    quota = 17
    w = Window.partitionBy("source").orderBy(
        _unit_hash(F.col("doc_id"), "quota-v1"), F.col("doc_id")
    )
    naive = sorted(
        (r.doc_id, r.source)
        for r in docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
        .collect()
    )
    for shards in (1, 3, 32):
        got = sorted(
            (r.doc_id, r.source)
            for r in domain_quota(
                docs, "source", "doc_id", quota, shards=shards
            ).collect()
        )
        assert got == naive, f"shards={shards} diverged from single-window"


def test_grouped_topk_pass1_is_shard_partitioned(spark):
    """Plan shape: the first window's partition spec must include the
    shard column (the skew-immunity mechanism), and the second window
    must exist over the bounded survivor set."""
    docs = _docs(spark).select("doc_id", "source")
    plan = (
        domain_quota(docs, "source", "doc_id", 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__shard" in plan  # pass-1 partition key carries the shard
    assert plan.count("Window") >= 2  # two bounded passes, not one global


def test_uniform_topk_exact_k_and_parity(spark):
    k = 40
    out = uniform_topk(_docs(spark).select("doc_id"), "doc_id", k)
    h = _HASH.format(salt="topk-v1", key="doc_id")
    con = duckdb_connection(SF_ORACLE)
    oracle = con.sql(
        f"SELECT doc_id FROM documents ORDER BY {h}, doc_id LIMIT {k}"
    ).df()
    compare_frames(out.toPandas(), oracle, "uniform_topk")
    assert out.count() == k
    # plan shape: distributed top-k, not a global sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_split_is_stable_across_runs(spark):
    a = {
        r.doc_id: r.split
        for r in deterministic_split(
            _docs(spark).select("doc_id"), "doc_id", {"train": 0.9, "val": 0.1}
        ).collect()
    }
    b = {
        r.doc_id: r.split
        for r in deterministic_split(
            _docs(spark).select("doc_id").repartition(13), "doc_id", {"train": 0.9, "val": 0.1}
        ).collect()
    }
    assert a == b


def test_split_rejects_bad_weights(spark):
    import pytest

    with pytest.raises(ValueError):
        deterministic_split(_docs(spark), "doc_id", {"train": 0.5, "val": 0.2})


def test_weighted_topk_is_deterministic_and_weight_biased(spark):
    from cc_mapreducer_spark.operators.sampling import weighted_topk

    # 200 light rows (w=1) + 20 heavy rows (w=50): the heavy minority
    # must dominate the sample, and the draw must be retry-stable
    rows = [(i, 1.0) for i in range(200)] + [
        (1000 + i, 50.0) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "k long, w double")
    a = sorted(r["k"] for r in weighted_topk(df, "k", "w", 20).collect())
    b = sorted(
        r["k"]
        for r in weighted_topk(df.repartition(7), "k", "w", 20).collect()
    )
    assert a == b and len(a) == 20  # partition-layout independent
    heavy = sum(1 for x in a if x >= 1000)
    # uniform sampling would give ~20/220 * 20 = 1.8 heavies; the seeded
    # weighted draw yields 11 — an unmistakable weight bias
    assert heavy >= 10

    # zero/negative weights can never be drawn
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, 5.0)], "k long, w double"
    )
    assert [r["k"] for r in weighted_topk(df2, "k", "w", 3).collect()] == [3]


def test_weighted_topk_plan_avoids_global_sort(spark):
    from cc_mapreducer_spark.operators.sampling import weighted_topk
    from cc_mapreducer_spark.plans.inspect import formatted_plan

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    plan = formatted_plan(weighted_topk(df, "k", "w", 10))
    assert "TakeOrderedAndProject" in plan
