"""Record linkage: threshold behavior on the planted perturbations,
signature-level correctness of resolved links, and one-best-per-record
resolution. DuckDB parity runs via test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.linkage import (
    MATCH_THRESHOLD,
    record_linkage_parts,
)
from cc_mapreducer_spark.tables import load_table
from tests.conftest import SF_ORACLE


def _linked(spark):
    return {r.b_id: r for r in record_linkage_parts(spark, SF_ORACLE).collect()}


def test_threshold_rejects_double_mangled_only(spark):
    """A record mangled in BOTH name (k%3==0) and brand (k%11==0) can
    reach at most score 3 against its true master — every UNLINKED b
    must be one of those; everything else must link."""
    linked = _linked(spark)
    n = load_table(spark, SF_ORACLE, "part").count()
    missing = [b - 100000 for b in range(100000, 100000 + n) if b not in linked]
    assert missing, "planted double-mangles should exist"
    assert all(k % 33 == 0 for k in missing)
    # single-field mangles always link (name intact XOR brand intact
    # keeps the score at >= 4)
    for k in range(n):
        if k % 33 != 0:
            assert (k + 100000) in linked, f"b for part {k} should have linked"


def test_links_are_signature_correct(spark):
    """Duplicate names make exact-master recovery impossible in
    general; what linkage GUARANTEES is signature-level identity: for a
    b with intact name and brand, the resolved a must carry the true
    master's exact (name, brand, type)."""
    linked = _linked(spark)
    part = {
        r.p_partkey: (r.p_name, r.p_brand, r.p_type)
        for r in load_table(spark, SF_ORACLE, "part").collect()
    }
    checked = 0
    for k, sig in part.items():
        if k % 3 == 0 or k % 11 == 0:
            continue  # perturbed fields — covered by the threshold test
        r = linked[k + 100000]
        assert part[r.a_id] == sig, f"b of part {k} linked across signatures"
        assert r.score == 6 and r.dist == 0
        checked += 1
    assert checked > 1000
    # and a healthy majority recover the exact master key
    exact = sum(1 for b, r in linked.items() if r.a_id == b - 100000)
    assert exact / len(linked) > 0.8


def test_resolution_is_one_best_per_record(spark):
    df = record_linkage_parts(spark, SF_ORACLE)
    assert df.count() == df.select("b_id").distinct().count()
    assert df.filter(F.col("score") < MATCH_THRESHOLD).count() == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
