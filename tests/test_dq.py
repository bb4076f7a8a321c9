"""Data-quality operators: profile single-scan plan, constraint
verdicts on clean and planted-dirty data. Oracle parity for
dq_profile / dq_checks runs in test_oracle_parity.py."""

from __future__ import annotations

from cc_mapreducer_spark.operators.dq import dq_checks, dq_profile
from cc_mapreducer_spark.plans.inspect import formatted_plan
from tests.conftest import SF_ORACLE


def test_profile_single_scan(spark):
    # one wide agg row unpivoted: exactly ONE parquet scan of orders
    # (multi-distinct lowers to Expand over the same scan, not re-reads)
    import re

    plan = formatted_plan(dq_profile(spark, SF_ORACLE))
    scan_ids = set(re.findall(r"Scan parquet\s*\((\d+)\)", plan))
    assert len(scan_ids) == 1
    assert "Expand" in plan


def test_profile_values_sane(spark):
    pdf = dq_profile(spark, SF_ORACLE).toPandas().set_index("col_name")
    assert pdf.loc["o_orderkey", "n_nulls"] == 0
    # PK column: distinct == row count == distinct orderkeys
    assert pdf.loc["o_orderkey", "n_distinct"] == 15000
    assert pdf.loc["o_orderkey", "min_num"] >= 0
    # string columns carry min/max in the _str pair, not the numeric one
    import pandas as pd

    assert pd.isna(pdf.loc["o_orderstatus", "min_num"])
    assert isinstance(pdf.loc["o_orderstatus", "min_str"], str)
    assert pd.isna(pdf.loc["o_totalprice", "min_str"])


def test_checks_all_pass_on_driver_data(spark):
    pdf = dq_checks(spark, SF_ORACLE).toPandas()
    assert len(pdf) == 6
    assert pdf["passed"].all()
    assert (pdf["observed"] == 0).all()


def test_checks_fk_customer_broadcasts(spark):
    plan = formatted_plan(dq_checks(spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan


def test_skew_profile_flags_planted_hot_key(spark, tmp_path):
    # 1000 rows on one key + 100 singleton keys: skew_ratio must scream
    sf = str(tmp_path)
    rows = [(7, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None)] * 1000 + [
        (1000 + i, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None)
        for i in range(100)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.parquet(f"{sf}/lineitem.parquet")
    from cc_mapreducer_spark.operators.dq import key_skew_profile

    prof = {
        r["key_col"]: r for r in key_skew_profile(spark, sf).collect()
    }
    hot = prof["l_orderkey"]
    assert hot["max_per_key"] == 1000
    assert hot["skew_ratio"] > 80  # max/avg with avg ~10.9
    uniform = prof["l_partkey"]  # every row same key: one key, ratio 1.0
    assert uniform["skew_ratio"] == 1.0


def test_checks_catch_planted_violations(spark, tmp_path):
    # a dirty replica: duplicate PK, dangling FK, out-of-range quantity,
    # negative price, null orderdate — every check must flip to failed
    sf = str(tmp_path)
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 5.0, None, "1-URGENT"),
            (1, 99, "F", 7.0, None, "2-HIGH"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [(10, "a", 0, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 1, 1, 1, 99.0, -5.0, 0.0, 0.0, "N", "O", None),
            (777, 1, 1, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", None),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    orders.write.parquet(f"{sf}/orders.parquet")
    customer.write.parquet(f"{sf}/customer.parquet")
    lineitem.write.parquet(f"{sf}/lineitem.parquet")

    got = {
        r["check_name"]: (r["observed"], r["passed"])
        for r in dq_checks(spark, sf).collect()
    }
    assert got["pk_unique_orderkey"] == (1, False)
    assert got["completeness_orderdate"] == (2, False)
    assert got["fk_orders_customer"] == (1, False)
    assert got["fk_lineitem_orders"] == (1, False)
    assert got["range_quantity_1_50"] == (1, False)
    assert got["nonneg_extendedprice"] == (1, False)
