"""Scale patterns: bucketing for co-located joins, salting for skew.

These are the two knobs SURVEY §2.8 / the build brief call out beyond what
AQE does automatically. Both are demonstrated as library functions with
plan/equivalence tests (tests/test_scale_patterns.py) rather than
registered queries — they change HOW a plan executes, not WHAT it returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 8) -> None:
    """Persist a table bucketed+sorted by the join key. Two tables bucketed
    the same way join WITHOUT any Exchange (shuffle-free sort-merge join) —
    the 100 TB answer for a fact-fact join that repeats every run."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Skew-salted inner equi-join: the big (skewed) side gets a random
    salt in [0, n_salts); the small side is exploded n_salts times so
    every (key, salt) bucket finds its match. Result set is identical to
    an unsalted join; the shuffle spreads a hot key over n_salts
    partitions. (AQE's skew-join handles post-hoc splitting; salting is
    the a-priori form that also works for aggregations.)"""
    salted_big = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(salted_small, [key, "__salt"]).drop("__salt")
    return out
