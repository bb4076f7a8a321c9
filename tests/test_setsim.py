"""Exact prefix-filtering set-similarity join: brute-force equality on a
planted corpus, losslessness cross-validation against the MinHash-LSH
path (LSH pairs must be a SUBSET of the exact join's pairs — that is
the whole point of having both), pruning-actually-prunes, and plan
shape. The registered key's DuckDB parity runs via test_oracle_parity.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.dedup import NEAR_DUP_JACCARD, near_dedup_minhash
from cc_mapreducer_spark.operators.setsim import (
    prefix_length,
    set_similarity_join,
    setsim_exact_pairs,
)
from tests.conftest import SF_ORACLE


def _planted(spark):
    # 8 sets with hand-checkable overlaps: 0/1 near-identical, 2/3
    # overlapping, the rest mutual strangers with a couple of shared
    # high-frequency tokens (to exercise the rarest-first ordering)
    rows = [
        (0, ["a", "b", "c", "d", "e"]),
        (1, ["a", "b", "c", "d", "f"]),
        (2, ["p", "q", "r", "s"]),
        (3, ["p", "q", "r", "t"]),
        (4, ["x", "y", "z", "a"]),
        (5, ["m", "n", "o", "a"]),
        (6, ["u", "v", "w"]),
        (7, ["u", "v", "w"]),
    ]
    return rows, spark.createDataFrame(rows, "id long, toks array<string>")


def _brute(rows, t):
    out = {}
    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
        a, b = set(sa), set(sb)
        j = len(a & b) / len(a | b)
        if j >= t:
            out[(ia, ib)] = round(j, 9)
    return out


def test_planted_equals_brute_force(spark):
    rows, df = _planted(spark)
    for t in (0.5, 0.75, 1.0):
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in set_similarity_join(df, "id", "toks", t).collect()
        }
        assert got == _brute(rows, t), f"threshold {t}"


def test_zero_false_negatives_vs_lsh(spark):
    """Every pair the probabilistic LSH path reports must re-appear in
    the exact join with the identical Jaccard — if the exact join ever
    misses one, prefix filtering lost a candidate it provably must
    keep."""
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in setsim_exact_pairs(spark, SF_ORACLE).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in near_dedup_minhash(spark, SF_ORACLE).collect()
    }
    missing = {p: j for p, j in lsh.items() if exact.get(p) != j}
    assert not missing, f"LSH pairs absent from exact join: {missing}"
    # and the exact join finds at least as many (it is lossless; LSH
    # trades recall at low thresholds for candidate volume)
    assert len(exact) >= len(lsh)


def test_prefix_pruning_actually_prunes(spark):
    """At a high threshold the candidate join must touch far fewer pairs
    than n*(n-1)/2: count candidates by re-deriving the prefix join
    (same construction the operator uses)."""
    rows, df = _planted(spark)
    t = 0.75
    n = len(rows)
    base = df.select(
        F.col("id").alias("__id"), F.col("toks").alias("__ss"), F.size("toks").alias("__n")
    )
    toks = base.select("__id", "__n", F.explode("__ss").alias("__tok"))
    dfreq = toks.groupBy("__tok").agg(F.count("*").alias("__df"))
    from pyspark.sql import Window

    w = Window.partitionBy("__id").orderBy("__df", "__tok")
    prefix = (
        toks.join(dfreq, "__tok")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__n") - F.ceil(F.lit(t) * F.col("__n")) + 1)
    )
    cands = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.__tok") == F.col("b.__tok"))
            & (F.col("a.__id") < F.col("b.__id"))
            & (F.least("a.__n", "b.__n") >= F.lit(t) * F.greatest("a.__n", "b.__n")),
        )
        .select(F.col("a.__id"), F.col("b.__id"))
        .distinct()
        .count()
    )
    assert cands < n * (n - 1) / 2  # 28 all-pairs; prefixes must prune
    # prefix length formula: |s|=5 at t=0.75 -> 5 - 4 + 1 = 2
    assert prefix_length(5, 0.75) == 2
    assert prefix_length(4, 1.0) == 1  # exact-duplicate probe = 1 token


def test_plan_has_no_cartesian(spark):
    plan = (
        setsim_exact_pairs(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_threshold_validation(spark):
    import pytest

    _, df = _planted(spark)
    with pytest.raises(ValueError):
        set_similarity_join(df, "id", "toks", 0.0)
    with pytest.raises(ValueError):
        set_similarity_join(df, "id", "toks", 1.5)
