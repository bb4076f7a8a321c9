"""TPC-H completeness (22/22) and planted-scenario pins for the round-3
additions. Parity vs DuckDB at sf0.01 is covered by test_oracle_parity
(every registered single has an oracle); these tests pin *semantics* on
corpora constructed to exercise the edge cases the synthetic sf data may
not contain."""

from __future__ import annotations

from datetime import datetime

from cc_mapreducer_spark import registry


def test_tpch_22_of_22_registered():
    """Every TPC-H query shape is registered (some adapted to the test
    schema — see tpch_full.py docstrings for the substitutions)."""
    have = set(registry.all_queries())
    expected = {
        1: "q1_pricing_summary",
        2: "q2_min_cost_supplier",
        3: "q3_shipping_priority",
        4: "q4_order_priority",
        5: "q5_local_supplier_volume",
        6: "q6_forecast_revenue",
        7: "q7_nation_volume",
        8: "q8_market_share",
        9: "q9_product_type_profit",
        10: "q10_returned_items",
        11: "q11_important_parts",
        12: "q12_priority_lines",
        13: "q13_customer_distribution",
        14: "q14_promo_share",
        15: "q15_top_supplier",
        16: "q16_parts_supplier_relation",
        17: "q17_small_quantity",
        18: "q18_large_volume_customers",
        19: "q19_disjunctive_revenue",
        20: "q20_dominant_suppliers",
        21: "q21_blocking_suppliers",
        22: "q22_global_sales_opportunity",
    }
    missing = {n for n, k in expected.items() if k not in have}
    assert not missing, f"TPC-H queries missing from registry: {sorted(missing)}"


def _write_tables(spark, tmp_path, tables: dict[str, tuple[list, str]]) -> str:
    sf_dir = str(tmp_path / "planted")
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
            f"{sf_dir}/{name}.parquet"
        )
    return sf_dir


def test_q21_blame_semantics_planted(spark, tmp_path):
    """Planted orders pin the EXISTS / NOT-EXISTS correlation:
    - order 1 (F): s1 ships after s2 -> only s1 blamed
    - order 2 (F): single supplier   -> nobody (EXISTS fails)
    - order 3 (O): excluded by status entirely
    - order 4 (F): s1 and s2 ship the same max date -> both blamed
    """
    from cc_mapreducer_spark.operators.tpch_full import q21_blocking_suppliers

    ts = datetime
    li_schema = (
        "l_orderkey long, l_suppkey long, l_shipdate timestamp, "
        "l_partkey long, l_quantity double, l_extendedprice double, l_discount double"
    )
    lineitem = [
        (1, 1, ts(2020, 1, 5), 1, 1.0, 1.0, 0.0),
        (1, 2, ts(2020, 1, 3), 1, 1.0, 1.0, 0.0),
        (2, 3, ts(2020, 1, 4), 1, 1.0, 1.0, 0.0),
        (3, 1, ts(2020, 1, 6), 1, 1.0, 1.0, 0.0),
        (3, 2, ts(2020, 1, 7), 1, 1.0, 1.0, 0.0),
        (4, 1, ts(2020, 2, 1), 1, 1.0, 1.0, 0.0),
        (4, 2, ts(2020, 2, 1), 1, 1.0, 1.0, 0.0),
    ]
    orders = [
        (1, "F", 1, ts(2020, 1, 1)),
        (2, "F", 1, ts(2020, 1, 1)),
        (3, "O", 1, ts(2020, 1, 1)),
        (4, "F", 1, ts(2020, 1, 1)),
    ]
    supplier = [(1, "SUPP_1", 0, 0.0), (2, "SUPP_2", 0, 0.0), (3, "SUPP_3", 0, 0.0)]
    sf_dir = _write_tables(
        spark,
        tmp_path,
        {
            "lineitem": (lineitem, li_schema),
            "orders": (orders, "o_orderkey long, o_orderstatus string, o_custkey long, o_orderdate timestamp"),
            "supplier": (supplier, "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"),
        },
    )
    got = {r["s_name"]: r["numwait"] for r in q21_blocking_suppliers(spark, sf_dir).collect()}
    assert got == {"SUPP_1": 2, "SUPP_2": 1}


def test_q15_returns_all_tied_max_suppliers(spark, tmp_path):
    """Q15's argmax-equality must return every supplier tied at the max
    (exact decimal equality makes the tie reliable)."""
    from cc_mapreducer_spark.operators.tpch_full import q15_top_supplier

    ts = datetime
    li_schema = (
        "l_orderkey long, l_suppkey long, l_shipdate timestamp, "
        "l_partkey long, l_quantity double, l_extendedprice double, l_discount double"
    )
    # suppliers 1 and 2 both sum to 300.00 in-window; supplier 3 lags;
    # supplier 4's rows fall outside the window
    lineitem = [
        (1, 1, ts(1996, 1, 10), 1, 1.0, 100.0, 0.0),
        (2, 1, ts(1996, 2, 10), 1, 1.0, 200.0, 0.0),
        (3, 2, ts(1996, 3, 10), 1, 1.0, 300.0, 0.0),
        (4, 3, ts(1996, 1, 20), 1, 1.0, 299.99, 0.0),
        (5, 4, ts(1996, 4, 1), 1, 1.0, 1000.0, 0.0),
    ]
    supplier = [(i, f"SUPP_{i}", 0, 0.0) for i in (1, 2, 3, 4)]
    sf_dir = _write_tables(
        spark,
        tmp_path,
        {
            "lineitem": (lineitem, li_schema),
            "supplier": (supplier, "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"),
        },
    )
    got = sorted(r["s_name"] for r in q15_top_supplier(spark, sf_dir).collect())
    assert got == ["SUPP_1", "SUPP_2"]


def test_q20_majority_threshold_is_strict(spark, tmp_path):
    """2*qty > total is strict: an exact 50/50 split blames nobody."""
    from cc_mapreducer_spark.operators.tpch_full import q20_dominant_suppliers

    ts = datetime
    li_schema = (
        "l_orderkey long, l_suppkey long, l_shipdate timestamp, "
        "l_partkey long, l_quantity double, l_extendedprice double, l_discount double"
    )
    # part 1: 50/50 split between s1/s2 -> neither dominant
    # part 2: s1 ships 3 of 4 -> dominant
    lineitem = [
        (1, 1, ts(1997, 3, 1), 1, 5.0, 1.0, 0.0),
        (2, 2, ts(1997, 3, 2), 1, 5.0, 1.0, 0.0),
        (3, 1, ts(1997, 4, 1), 2, 3.0, 1.0, 0.0),
        (4, 2, ts(1997, 4, 2), 2, 1.0, 1.0, 0.0),
    ]
    part = [(1, "blue bolt", "Brand#1", "STANDARD", 1, 1.0), (2, "blue gear", "Brand#1", "STANDARD", 1, 1.0)]
    supplier = [(1, "SUPP_1", 0, 0.0), (2, "SUPP_2", 0, 0.0)]
    sf_dir = _write_tables(
        spark,
        tmp_path,
        {
            "lineitem": (lineitem, li_schema),
            "part": (part, "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double"),
            "supplier": (supplier, "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"),
        },
    )
    got = [r["s_name"] for r in q20_dominant_suppliers(spark, sf_dir).collect()]
    assert got == ["SUPP_1"]
