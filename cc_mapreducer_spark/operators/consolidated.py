"""Consolidated relational query roster (round 2).

The driver records a correctness row for at most 50 registered queries —
CORRECTNESS_r01 checked exactly the first 50 registration-order keys and
silently skipped the other 34 — so the fine-grained relational surface is
consolidated here into column-merged (same grain, one scan) and tagged-
union (same measures, different window/group shape) queries. Every
operator family keeps a driver-checked key; every merged-away component
remains an importable, unit-tested function in its home module.

Merge map (component -> consolidated key):
  semi_join_urgent_customers + anti_join_no_urgent   -> semi_anti_join
  agg_rollup + agg_cube + agg_grouping_sets          -> agg_multi_grouping
  window_running_sum + window_range_frame            -> window_suite_orders
  window_lag_gaps + json_extract (per-event)         -> event_lag_json
  string_functions + regex_extract_groups
    + window_distribution + scalar math library      -> customer_profile
  date_functions + date_arithmetic                   -> orders_date_suite
  array_functions + higher_order_array_fns           -> lineitem_array_suite
  set_operations + null_semantics
    + case_coalesce_buckets + distinct_counts        -> semantics_suite
  join_full_outer + join_cross_filtered              -> join_exotics
  pivot_status_by_segment + argmin_argmax            -> pivot_segment_summary
  percentiles_by_status + stats_exact_moments
    + unpivot_segment_metrics                        -> stats_unpivot_suite

Dropped keys (operator subsumed by a TPC-H query that IS checked):
  join_broadcast_dims  ⊂ q5 (snowflake broadcast join)
  order_limit_topk     ⊂ q3/q10 (TakeOrderedAndProject) + window_rank_topn
  subquery_above_avg   ⊂ q17 (decorrelated agg+join)
  join_left_outer      ⊂ q13 (outer join + grouped counts)
  union_monthly_activity ⊂ semantics_suite's UNION + the q-family date aggs

Determinism rules are inherited from the component modules (decimal-exact
money, explicit tiebreaks, string-formatted timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cc_mapreducer_spark.operators.relational import (
    agg_cube,
    agg_grouping_sets,
    agg_rollup,
    anti_join_no_urgent,
    case_coalesce_buckets,
    distinct_counts,
    semi_join_urgent_customers,
    set_operations,
)
from cc_mapreducer_spark.operators.relational_extra import (
    argmin_argmax,
    join_cross_filtered,
    join_full_outer,
    null_semantics,
    percentiles_by_status,
    pivot_status_by_segment,
    stats_exact_moments,
    unpivot_segment_metrics,
)
from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table

# --------------------------------------------------------------------------
# semi + anti join (tagged union; same grain and measures)
# --------------------------------------------------------------------------

_SEMI_ANTI_SQL = """
SELECT 'semi' AS kind, c.c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY c.c_mktsegment
UNION ALL
SELECT 'anti' AS kind, c.c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY c.c_mktsegment
"""


@register("semi_anti_join", oracle=_SEMI_ANTI_SQL)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (customers with an urgent order) and LEFT ANTI (customers
    without) per segment, tagged — both hash-joinable EXISTS shapes."""
    semi = semi_join_urgent_customers(spark, sf_dir).select(
        F.lit("semi").alias("kind"), "c_mktsegment", "n_customers"
    )
    anti = anti_join_no_urgent(spark, sf_dir).select(
        F.lit("anti").alias("kind"), "c_mktsegment", "n_customers"
    )
    return semi.unionAll(anti)


# --------------------------------------------------------------------------
# rollup + cube + grouping sets (tagged union; harmonized group columns)
# --------------------------------------------------------------------------

_MULTI_GROUPING_SQL = """
SELECT 'rollup' AS kind, c.c_mktsegment AS g1, o.o_orderpriority AS g2,
       count(*) AS n, CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY ROLLUP (c.c_mktsegment, o.o_orderpriority)
UNION ALL
SELECT 'cube' AS kind, o.o_orderstatus AS g1, o.o_orderpriority AS g2,
       count(*) AS n, CAST(NULL AS DOUBLE) AS total
FROM orders o
GROUP BY CUBE (o.o_orderstatus, o.o_orderpriority)
UNION ALL
SELECT 'grouping_sets' AS kind, l_returnflag AS g1, l_linestatus AS g2,
       CAST(NULL AS BIGINT) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
"""


@register("agg_multi_grouping", oracle=_MULTI_GROUPING_SQL)
def agg_multi_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + CUBE + GROUPING SETS in one tagged key (grouping-null rows
    keep their genuine NULL group values)."""
    rollup = agg_rollup(spark, sf_dir).select(
        F.lit("rollup").alias("kind"),
        F.col("c_mktsegment").alias("g1"),
        F.col("o_orderpriority").alias("g2"),
        F.col("n_orders").alias("n"),
        F.col("total_price").alias("total"),
    )
    cube = agg_cube(spark, sf_dir).select(
        F.lit("cube").alias("kind"),
        F.col("o_orderstatus").alias("g1"),
        F.col("o_orderpriority").alias("g2"),
        F.col("n_orders").alias("n"),
        F.lit(None).cast("double").alias("total"),
    )
    gs = agg_grouping_sets(spark, sf_dir).select(
        F.lit("grouping_sets").alias("kind"),
        F.col("l_returnflag").alias("g1"),
        F.col("l_linestatus").alias("g2"),
        F.lit(None).cast("bigint").alias("n"),
        F.col("sum_qty").alias("total"),
    )
    return rollup.unionAll(cube).unionAll(gs)


# --------------------------------------------------------------------------
# ROWS + RANGE window frames over orders (column merge; one scan, both
# frames share the o_custkey partitioning so the plan has one Exchange)
# --------------------------------------------------------------------------

_WINDOW_SUITE_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_total,
       count(*) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
       ) AS orders_last_30d,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS spend_last_30d
FROM orders
"""


@register("window_suite_orders", oracle=_WINDOW_SUITE_SQL)
def window_suite_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DECIMAL sum (ROWS frame, orderkey tiebreak) and value-based
    30-day RANGE frame in one pass over orders. Both window specs
    partition by o_custkey, so Spark plans a single Exchange feeding two
    Window operators. Expressed in SQL because the Python Window API only
    takes numeric RANGE bounds (no intervals)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_ws")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_total,
               count(*) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ) AS orders_last_30d,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS spend_last_30d
        FROM orders_ws
        """
    )


# --------------------------------------------------------------------------
# per-event lag gaps + JSON extraction (column merge on the events grain)
# --------------------------------------------------------------------------

_EVENT_LAG_JSON_SQL = """
SELECT user_id, event_id,
       date_diff('microsecond',
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                 ts) AS gap_us,
       json_extract_string(props, '$.k') AS k_val
FROM events
"""


@register("event_lag_json", oracle=_EVENT_LAG_JSON_SQL)
def event_lag_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event inter-arrival gap (lag window, exact integer micros) plus
    JSON property extraction — one scan of events, one user_id-partitioned
    window pass."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        (F.unix_micros("ts") - F.unix_micros(prev)).alias("gap_us"),
        F.get_json_object("props", "$.k").alias("k_val"),
    )


# --------------------------------------------------------------------------
# customer profile: string + regex + scalar-math + window-distribution
# columns on the per-customer grain (one scan, one window Exchange)
# --------------------------------------------------------------------------

_CUSTOMER_PROFILE_SQL = """
SELECT c_custkey,
       -- string library
       trim(concat('  ', c_name, '  ')) AS name_trimmed,
       reverse(c_name) AS name_rev,
       repeat(c_mktsegment, 2) AS seg_twice,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels,
       left(c_name, 4) AS name_left4,
       right(c_name, 3) AS name_right3,
       strpos(c_name, '_') AS underscore_pos,
       CAST(starts_with(c_mktsegment, 'BU') AS INT) AS is_building_prefix,
       CAST(contains(c_name, '1') AS INT) AS has_one,
       split_part(c_name, '_', 2) AS name_num_part,
       -- regex capture groups + least/greatest
       regexp_extract(c_name, '([A-Z]+)_([0-9]+)', 1) AS name_word,
       regexp_extract(c_name, '([A-Z]+)_([0-9]+)', 2) AS name_num,
       CAST(regexp_matches(c_name, '^CUSTOMER_[0-9]+$') AS INT) AS is_canonical,
       least(c_acctbal, 1000.0) AS bal_capped,
       greatest(CAST(c_nationkey AS BIGINT), 10) AS natkey_floor10,
       -- scalar math library (sqrt is IEEE-exact; ln/exp excluded for
       -- cross-engine last-ulp drift)
       abs(CAST(c_nationkey AS BIGINT) - 12) AS natkey_dist,
       CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
       CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
       sqrt(CAST(abs(c_nationkey) AS DOUBLE)) AS natkey_sqrt,
       c_custkey % 7 AS custkey_mod,
       lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS natkey_padded,
       -- window distribution functions
       ntile(4) OVER w AS balance_quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       CAST(first_value(c_custkey) OVER w AS BIGINT) AS poorest_in_seg,
       CAST(nth_value(c_custkey, 2) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS second_poorest
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


@register("customer_profile", oracle=_CUSTOMER_PROFILE_SQL)
def customer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-customer profile: string library, regex capture groups,
    scalar math library, and distribution window functions in one scan
    with a single c_mktsegment window Exchange — the column-merged form of
    string_functions / regex_extract_groups / scalar_functions /
    window_distribution."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pat = "([A-Z]+)_([0-9]+)"
    return c.select(
        "c_custkey",
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trimmed"),
        F.reverse("c_name").alias("name_rev"),
        F.repeat("c_mktsegment", 2).alias("seg_twice"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_lower_vowels"),
        F.substring("c_name", 1, 4).alias("name_left4"),
        F.expr("right(c_name, 3)").alias("name_right3"),
        F.locate("_", F.col("c_name")).cast("bigint").alias("underscore_pos"),
        F.startswith("c_mktsegment", F.lit("BU")).cast("int").alias("is_building_prefix"),
        F.contains("c_name", F.lit("1")).cast("int").alias("has_one"),
        F.split_part("c_name", F.lit("_"), F.lit(2)).alias("name_num_part"),
        F.regexp_extract("c_name", pat, 1).alias("name_word"),
        F.regexp_extract("c_name", pat, 2).alias("name_num"),
        F.col("c_name").rlike("^CUSTOMER_[0-9]+$").cast("int").alias("is_canonical"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_capped"),
        F.greatest(F.col("c_nationkey").cast("bigint"), F.lit(10).cast("bigint")).alias(
            "natkey_floor10"
        ),
        F.abs(F.col("c_nationkey").cast("bigint") - 12).alias("natkey_dist"),
        F.floor("c_acctbal").alias("bal_floor"),
        F.ceil("c_acctbal").alias("bal_ceil"),
        F.sqrt(F.abs(F.col("c_nationkey")).cast("double")).alias("natkey_sqrt"),
        (F.col("c_custkey") % 7).alias("custkey_mod"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("natkey_padded"),
        F.ntile(4).over(w).alias("balance_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("c_custkey").over(w).cast("bigint").alias("poorest_in_seg"),
        F.nth_value("c_custkey", 2).over(w_full).cast("bigint").alias("second_poorest"),
    )


# --------------------------------------------------------------------------
# date functions + date arithmetic on the per-order grain (column merge)
# --------------------------------------------------------------------------

_ORDERS_DATE_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(day(o_orderdate) AS INT) AS order_day,
       CAST(dayofweek(o_orderdate) AS INT) AS order_dow,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
       CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS yyyymm,
       strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start,
       CAST((year(o_orderdate) % 4 = 0 AND (year(o_orderdate) % 100 <> 0 OR year(o_orderdate) % 400 = 0)) AS INT) AS in_leap_year
FROM orders
"""


@register("orders_date_suite", oracle=_ORDERS_DATE_SQL)
def orders_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function + arithmetic breadth in one per-order scan (the
    column-merged form of date_functions / date_arithmetic). DuckDB
    dayofweek: Sunday=0; Spark: Sunday=1 — normalized to DuckDB's."""
    o = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    return o.select(
        "o_orderkey",
        y.cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("order_dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1995-01-01")))
        .cast("bigint")
        .alias("days_since_epoch_start"),
        (y * 100 + F.month("o_orderdate")).cast("int").alias("yyyymm"),
        F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd").alias(
            "quarter_start"
        ),
        ((y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))).cast("int").alias("in_leap_year"),
    )


# --------------------------------------------------------------------------
# array library + higher-order functions on the per-order grain
# --------------------------------------------------------------------------

_LINEITEM_ARRAY_SQL = """
WITH per_order AS (
    SELECT l_orderkey, list_sort(list(l_linenumber)) AS lines,
           list_sort(list(DISTINCT l_suppkey)) AS supps
    FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(len(lines) AS INT) AS n_lines,
       lines[1] AS first_line,
       lines[-1] AS last_line,
       CAST(list_contains(supps, 1) AS INT) AS has_supp1,
       array_to_string(lines, ',') AS lines_csv,
       CAST(len(list_filter(lines, x -> x % 2 = 0)) AS INT) AS n_even_lines,
       CAST(len(list_filter(lines, x -> x > 5)) > 0 AS INT) AS any_gt5,
       CAST(len(list_filter(lines, x -> x % 2 = 0)) = len(lines) AS INT) AS all_even,
       CAST(list_sum(list_transform(lines, x -> x * x)) AS BIGINT) AS sum_sq,
       array_to_string(list_transform(lines, x -> x * 10), ',') AS lines_x10_csv
FROM per_order
"""


@register("lineitem_array_suite", oracle=_LINEITEM_ARRAY_SQL)
def lineitem_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array library + higher-order functions (exists/forall/transform/
    aggregate) over deterministically-sorted collected arrays, one groupBy
    of lineitem (the column-merged form of array_functions /
    higher_order_array_fns). HOF lambdas run interpreted — fine OUTSIDE
    hot paths, which is why dedup's shingle path avoids them."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_linenumber")).alias("lines"),
        F.array_sort(F.collect_set("l_suppkey")).alias("supps"),
    )
    return per_order.select(
        "l_orderkey",
        F.size("lines").cast("int").alias("n_lines"),
        F.element_at("lines", 1).alias("first_line"),
        F.element_at("lines", -1).alias("last_line"),
        F.array_contains("supps", 1).cast("int").alias("has_supp1"),
        F.array_join(F.transform("lines", lambda x: x.cast("string")), ",").alias("lines_csv"),
        F.size(F.filter("lines", lambda x: x % 2 == 0)).cast("int").alias("n_even_lines"),
        F.exists("lines", lambda x: x > 5).cast("int").alias("any_gt5"),
        F.forall("lines", lambda x: x % 2 == 0).cast("int").alias("all_even"),
        F.aggregate(
            "lines", F.lit(0).cast("bigint"), lambda acc, x: acc + x.cast("bigint") * x
        ).alias("sum_sq"),
        F.array_join(F.transform("lines", lambda x: (x * 10).cast("string")), ",").alias(
            "lines_x10_csv"
        ),
    )


# --------------------------------------------------------------------------
# set ops + NULL semantics + CASE buckets + exact distinct counts,
# harmonized to (section, label, value) rows
# --------------------------------------------------------------------------

_SEMANTICS_SQL = """
WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
     o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
     nt AS (
       SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS maybe_status
       FROM orders
     )
SELECT 'set_ops' AS section, 'both' AS label, count(*) AS value
FROM (SELECT * FROM f INTERSECT SELECT * FROM o)
UNION ALL
SELECT 'set_ops', 'f_only', count(*) FROM (SELECT * FROM f EXCEPT SELECT * FROM o)
UNION ALL
SELECT 'set_ops', 'either', count(*) FROM (SELECT * FROM f UNION SELECT * FROM o)
UNION ALL
SELECT 'null_semantics', coalesce(maybe_status, '<null>') || '/n_total', count(*)
FROM nt GROUP BY maybe_status
UNION ALL
SELECT 'null_semantics', coalesce(maybe_status, '<null>') || '/n_nonnull', count(maybe_status)
FROM nt GROUP BY maybe_status
UNION ALL
SELECT 'null_semantics', coalesce(maybe_status, '<null>') || '/n_null_safe',
       CAST(sum(CASE WHEN maybe_status IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM nt GROUP BY maybe_status
UNION ALL
SELECT 'case_buckets',
       (CASE WHEN o_totalprice < 100000 THEN 'small'
             WHEN o_totalprice < 300000 THEN 'medium'
             ELSE 'large' END) || '/' || coalesce(nullif(o_orderstatus, 'P'), 'PENDING'),
       count(*)
FROM orders GROUP BY 2
UNION ALL
SELECT 'distinct_counts', l_returnflag || '/n_parts', count(DISTINCT l_partkey)
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT 'distinct_counts', l_returnflag || '/n_supps', count(DISTINCT l_suppkey)
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT 'distinct_counts', l_returnflag || '/n_rows', count(*)
FROM lineitem GROUP BY l_returnflag
"""


@register("semantics_suite", oracle=_SEMANTICS_SQL)
def semantics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT/UNION set ops, NULL-handling semantics (count(*)
    vs count(col), null-safe equality), CASE/coalesce bucketing, and
    exact multi-column distinct counts — harmonized to (section, label,
    value) rows via component unpivots (the tagged-union form of
    set_operations / null_semantics / case_coalesce_buckets /
    distinct_counts)."""

    def rows3(df: DataFrame, section: str, key_col: str, metrics: list[str]) -> DataFrame:
        # one (section, key/metric, value) row per metric column
        parts = [
            df.select(
                F.lit(section).alias("section"),
                F.concat(F.col(key_col), F.lit(f"/{m}")).alias("label"),
                F.col(m).cast("bigint").alias("value"),
            )
            for m in metrics
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out

    setops = set_operations(spark, sf_dir).select(
        F.lit("set_ops").alias("section"),
        F.col("tag").alias("label"),
        F.col("n").cast("bigint").alias("value"),
    )
    nulls = rows3(
        null_semantics(spark, sf_dir),
        "null_semantics",
        "status_bucket",
        ["n_total", "n_nonnull", "n_null_safe"],
    )
    case = case_coalesce_buckets(spark, sf_dir).select(
        F.lit("case_buckets").alias("section"),
        F.concat("price_band", F.lit("/"), "status_norm").alias("label"),
        F.col("n").cast("bigint").alias("value"),
    )
    dc = rows3(
        distinct_counts(spark, sf_dir),
        "distinct_counts",
        "l_returnflag",
        ["n_parts", "n_supps", "n_rows"],
    )
    return setops.unionAll(nulls).unionAll(case).unionAll(dc)


# --------------------------------------------------------------------------
# full-outer + cross/theta joins (tagged union; NULL-padded)
# --------------------------------------------------------------------------

_JOIN_EXOTICS_SQL = """
WITH by_seg AS (
  SELECT c_mktsegment AS seg, count(*) AS n_cust FROM customer GROUP BY 1
), by_pri AS (
  SELECT o_orderpriority AS seg2, count(*) AS n_ord FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') GROUP BY 1
)
SELECT 'full_outer' AS kind,
       coalesce(a.seg, 'NONE') AS left_key,
       coalesce(b.seg2, 'NONE') AS right_key,
       coalesce(a.n_cust, -1) AS n_left,
       coalesce(b.n_ord, -1) AS n_right
FROM by_seg a FULL OUTER JOIN by_pri b ON a.seg = b.seg2
UNION ALL
SELECT 'cross_theta' AS kind, r.r_name AS left_key, n.n_name AS right_key,
       CAST(NULL AS BIGINT) AS n_left, CAST(NULL AS BIGINT) AS n_right
FROM region r CROSS JOIN nation n
WHERE n.n_regionkey <> r.r_regionkey
"""


@register("join_exotics", oracle=_JOIN_EXOTICS_SQL)
def join_exotics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER between disjoint-keyed aggregates (null-completion path)
    plus an explicit cross join with a non-equi theta filter, tagged."""
    fo = join_full_outer(spark, sf_dir).select(
        F.lit("full_outer").alias("kind"),
        F.col("seg").alias("left_key"),
        F.col("seg2").alias("right_key"),
        F.col("n_cust").cast("bigint").alias("n_left"),
        F.col("n_ord").cast("bigint").alias("n_right"),
    )
    ct = join_cross_filtered(spark, sf_dir).select(
        F.lit("cross_theta").alias("kind"),
        F.col("r_name").alias("left_key"),
        F.col("n_name").alias("right_key"),
        F.lit(None).cast("bigint").alias("n_left"),
        F.lit(None).cast("bigint").alias("n_right"),
    )
    return fo.unionAll(ct)


# --------------------------------------------------------------------------
# pivot + arg_min/arg_max on the per-segment grain (column merge)
# --------------------------------------------------------------------------

_PIVOT_SUMMARY_SQL = """
WITH piv AS (
  SELECT c.c_mktsegment,
         count(*) FILTER (WHERE o.o_orderstatus = 'F') AS n_f,
         count(*) FILTER (WHERE o.o_orderstatus = 'O') AS n_o,
         count(*) FILTER (WHERE o.o_orderstatus = 'P') AS n_p,
         CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(12,2)))
              FILTER (WHERE o.o_orderstatus = 'F'), 0) AS DOUBLE) AS spend_f
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment
), amm AS (
  SELECT c_mktsegment,
         arg_min(c_name, c_custkey) AS first_customer,
         arg_max(c_name, c_custkey) AS last_customer,
         arg_max(c_name, c_acctbal) AS richest_customer
  FROM customer
  GROUP BY c_mktsegment
)
SELECT piv.c_mktsegment, n_f, n_o, n_p, spend_f,
       first_customer, last_customer, richest_customer
FROM piv JOIN amm ON piv.c_mktsegment = amm.c_mktsegment
"""


@register("pivot_segment_summary", oracle=_PIVOT_SUMMARY_SQL)
def pivot_segment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment pivot (wide conditional aggregation with pinned values)
    joined with min_by/max_by aggregates — the column-merged form of
    pivot_status_by_segment / argmin_argmax on their shared grain."""
    piv = pivot_status_by_segment(spark, sf_dir)
    amm = argmin_argmax(spark, sf_dir).withColumnRenamed("c_mktsegment", "amm_seg")
    return piv.join(amm, piv.c_mktsegment == amm.amm_seg).select(
        "c_mktsegment",
        "n_f",
        "n_o",
        "n_p",
        "spend_f",
        "first_customer",
        "last_customer",
        "richest_customer",
    )


# --------------------------------------------------------------------------
# exact percentiles + exact moments + segment metrics, unpivoted to
# (src, group_key, metric, value) rows
# --------------------------------------------------------------------------

_STATS_UNPIVOT_SQL = """
WITH pct AS (
  SELECT o_orderstatus,
         quantile_cont(o_totalprice, 0.25) AS p25,
         quantile_cont(o_totalprice, 0.5) AS p50,
         quantile_cont(o_totalprice, 0.75) AS p75,
         CAST(min(o_totalprice) AS DOUBLE) AS price_min,
         CAST(max(o_totalprice) AS DOUBLE) AS price_max
  FROM orders GROUP BY o_orderstatus
), s AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx2,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy2,
         CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
), mom AS (
  SELECT l_returnflag, CAST(n AS DOUBLE) AS n,
         sx / n AS mean_qty,
         (sx2 - sx * sx / n) / (n - 1) AS var_qty,
         sqrt((sx2 - sx * sx / n) / (n - 1)) AS stddev_qty,
         round((n * sxy - sx * sy) / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)), 12) AS corr_qty_price
  FROM s
), seg AS (
  SELECT c.c_mktsegment AS segment,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
         CAST(count(*) AS DOUBLE) AS n_orders,
         CAST(count(DISTINCT o.o_custkey) AS DOUBLE) AS n_customers
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
SELECT 'orders_price' AS src, o_orderstatus AS group_key, metric, value
FROM pct UNPIVOT (value FOR metric IN (p25, p50, p75, price_min, price_max))
UNION ALL
SELECT 'lineitem_moments', l_returnflag, metric, value
FROM mom UNPIVOT (value FOR metric IN (n, mean_qty, var_qty, stddev_qty, corr_qty_price))
UNION ALL
SELECT 'segment_metrics', segment, metric, value
FROM seg UNPIVOT (value FOR metric IN (total_price, n_orders, n_customers))
"""


@register("stats_unpivot_suite", oracle=_STATS_UNPIVOT_SQL)
def stats_unpivot_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles, exact decimal-sums-of-powers
    moments (mean/var/stddev/corr), and per-segment metrics — each
    unpivoted (wide -> long, Spark's unpivot == SQL stack()) to a uniform
    (src, group_key, metric, value) schema. The tagged-union form of
    percentiles_by_status / stats_exact_moments / unpivot_segment_metrics;
    the unpivot operator itself is exercised on all three branches."""

    def unpivot(df: DataFrame, src: str, key: str, metrics: list[str]) -> DataFrame:
        wide = df.select(
            F.col(key).alias("group_key"), *[F.col(m).cast("double").alias(m) for m in metrics]
        )
        long = wide.unpivot(
            ids=["group_key"], values=metrics, variableColumnName="metric",
            valueColumnName="value",
        )
        return long.select(F.lit(src).alias("src"), "group_key", "metric", "value")

    pct = unpivot(
        percentiles_by_status(spark, sf_dir),
        "orders_price",
        "o_orderstatus",
        ["p25", "p50", "p75", "price_min", "price_max"],
    )
    mom = unpivot(
        stats_exact_moments(spark, sf_dir),
        "lineitem_moments",
        "l_returnflag",
        ["n", "mean_qty", "var_qty", "stddev_qty", "corr_qty_price"],
    )
    seg = unpivot_segment_metrics(spark, sf_dir).select(
        F.lit("segment_metrics").alias("src"),
        F.col("segment").alias("group_key"),
        "metric",
        "value",
    )
    return pct.unionAll(mom).unionAll(seg)
