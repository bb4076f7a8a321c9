"""percent_rank_by_group: equality with Spark's own window function
(tie semantics included), degenerate groups, and partition invariance.
DuckDB parity for the registered key runs via test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from cc_mapreducer_spark.operators.features import (
    percent_rank_by_group,
    price_percent_rank,
)
from tests.conftest import SF_ORACLE
from cc_mapreducer_spark.tables import load_table


def test_equals_window_percent_rank_with_ties(spark):
    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 3.0),  # ties share min rank
        ("b", 5.0),                                       # singleton -> 0.0
        ("c", 7.0), ("c", 7.0),                           # all-ties -> 0.0
    ]
    df = spark.createDataFrame(rows, "g string, v double").withColumn(
        "rid", F.monotonically_increasing_id()
    )
    w = Window.partitionBy("g").orderBy("v")
    expect = {
        (r.g, r.v): r.pr
        for r in df.withColumn("pr", F.percent_rank().over(w)).collect()
    }
    got = {
        (r.g, r.v): r.pct_rank
        for r in percent_rank_by_group(df, "g", "v").collect()
    }
    assert got == expect
    assert got[("b", 5.0)] == 0.0 and got[("c", 7.0)] == 0.0


def test_registered_key_matches_row_level_window(spark):
    li = load_table(spark, SF_ORACLE, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    expect = sorted(
        (r.l_orderkey, r.l_linenumber, round(r.pr, 9))
        for r in li.withColumn("pr", F.percent_rank().over(w)).collect()
    )
    got = sorted(
        (r.l_orderkey, r.l_linenumber, r.pct_rank)
        for r in price_percent_rank(spark, SF_ORACLE).collect()
    )
    assert got == expect


def test_window_runs_over_distinct_values_not_rows(spark):
    """The plan's Window must consume the (group, value) AGGREGATE — the
    skew-immunity mechanism — never the raw row stream."""
    from cc_mapreducer_spark.plans.inspect import formatted_plan

    import re

    plan = formatted_plan(price_percent_rank(spark, SF_ORACLE))
    # exactly one Window NODE (tree + detail render the same id twice),
    # and a HashAggregate exists beneath it (the distinct-value table)
    win_ids = {m.group(1) for m in re.finditer(r"^\((\d+)\) Window", plan, re.M)}
    assert len(win_ids) == 1, f"expected 1 Window node, got {win_ids}"
    win_pos = plan.index(") Window")
    assert "HashAggregate" in plan[win_pos:], "window input is not aggregated"


def test_partition_invariance(spark):
    li = load_table(spark, SF_ORACLE, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    a = sorted(map(tuple, percent_rank_by_group(li, "l_returnflag", "l_extendedprice").collect()))
    b = sorted(
        map(
            tuple,
            percent_rank_by_group(
                li.repartition(13), "l_returnflag", "l_extendedprice"
            ).collect(),
        )
    )
    assert a == b
