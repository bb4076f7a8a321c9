"""Relational query suite (SURVEY.md §2.7 absences + §2.8 / M3).

The reference implements no joins, windows, sorts, set ops, or scalar
function library (SURVEY §2.7) — this module supplies the standard
relational surface as first-class, oracle-checked queries over the driver's
TPC-H-ish tables, all expressed declaratively so Catalyst plans them
(predicate pushdown to the parquet scan, broadcast hash joins for the dim
tables, partial aggregation before every exchange).

Cross-engine determinism rules used throughout (Spark result must
value-hash-equal the DuckDB oracle):
  * Money/metric aggregation casts inputs to DECIMAL(12,2) FIRST, sums
    exactly (associative, partition-order independent — double sums are
    NOT), then casts the final value to DOUBLE. Equal bits in both engines.
  * Averages are exact-decimal sums divided as double by bigint counts
    (single IEEE division, not an engine `avg` whose accumulation order is
    unspecified).
  * Any ORDER BY ... LIMIT carries a unique-key tiebreaker.
  * Timestamps leave the query as formatted strings (date_format /
    strftime) so timezone/epoch conventions can't drift.

Scale notes (100 TB): fact-fact joins (orders ⋈ lineitem) shuffle on the
join key and benefit from AQE skew splitting; all dim joins
(region/nation/customer/supplier/part) are broadcast — verified in
tests/test_plans.py, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table

DEC = "decimal(12,2)"


def _dec(c: str) -> F.Column:
    return F.col(c).cast(DEC)


# ---------------------------------------------------------------------------
# q1: scan + filter + wide hash aggregation (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

_Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
           * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
  CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_SQL)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    qd, epd = _dec("l_quantity"), _dec("l_extendedprice")
    dd, td = _dec("l_discount"), _dec("l_tax")
    disc_price = epd * (F.lit(1) - dd)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qd).cast("double").alias("sum_qty"),
        F.sum(epd).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(disc_price * (F.lit(1) + td)).cast("double").alias("sum_charge"),
        (F.sum(qd).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(epd).cast("double") / F.count("*")).alias("avg_price"),
        (F.sum(dd).cast("double") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# q3: fact⋈fact⋈dim join + agg + deterministic top-k (TPC-H Q3 shape)
# ---------------------------------------------------------------------------

_Q3_SQL = """
SELECT
  o.o_orderkey,
  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
  strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
  o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_SQL)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q5: 6-way snowflake join (TPC-H Q5 shape), co-located nation condition
# ---------------------------------------------------------------------------

_Q5_SQL = """
SELECT
  n.n_name,
  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_SQL)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# joins: broadcast dim chain, semi, anti
# ---------------------------------------------------------------------------

_BROADCAST_JOIN_SQL = """
SELECT r.r_name, o.o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, o.o_orderstatus
"""


def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
    )


_SEMI_JOIN_SQL = """
SELECT c.c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY c.c_mktsegment
"""


def semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


_ANTI_JOIN_SQL = """
SELECT c.c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY c.c_mktsegment
"""


def anti_join_no_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# grouping sets / rollup / cube
# ---------------------------------------------------------------------------

_ROLLUP_SQL = """
SELECT c.c_mktsegment, o.o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY ROLLUP (c.c_mktsegment, o.o_orderpriority)
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .rollup("c_mktsegment", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
    )


_CUBE_SQL = """
SELECT o.o_orderstatus, o.o_orderpriority,
       count(*) AS n_orders
FROM orders o
GROUP BY CUBE (o.o_orderstatus, o.o_orderpriority)
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n_orders"))


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------

_WINDOW_RANK_SQL = """
SELECT * FROM (
  SELECT c.c_mktsegment, o.o_orderkey,
         CAST(o.o_totalprice AS DOUBLE) AS totalprice,
         row_number() OVER w AS rn,
         rank()       OVER w AS rnk,
         dense_rank() OVER w AS drnk
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WINDOW w AS (PARTITION BY c.c_mktsegment ORDER BY o.o_totalprice DESC, o.o_orderkey)
) WHERE rn <= 3
"""


@register("window_rank_topn", oracle=_WINDOW_RANK_SQL)
def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


# Running sum uses an exact DECIMAL accumulator: DuckDB evaluates window
# sums with a segment tree (different FP addition order than Spark's
# running accumulation), so a double running sum would diverge.
_WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_total
FROM orders
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


_WINDOW_LAG_SQL = """
SELECT user_id, event_id,
       date_diff('microsecond',
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                 ts) AS gap_us
FROM events
"""


def window_lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        (F.unix_micros("ts") - F.unix_micros(prev)).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# sort / limit / top-k, set ops, scalars, CASE, JSON, subqueries
# ---------------------------------------------------------------------------

_TOPK_SQL = """
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


def order_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    top-k then a k-row merge on the driver, no global sort at any scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(20)
    )


_SET_OPS_SQL = """
WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
     o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
SELECT 'both' AS tag, count(*) AS n FROM (SELECT * FROM f INTERSECT SELECT * FROM o)
UNION ALL
SELECT 'f_only' AS tag, count(*) AS n FROM (SELECT * FROM f EXCEPT SELECT * FROM o)
UNION ALL
SELECT 'either' AS tag, count(*) AS n FROM (SELECT * FROM f UNION SELECT * FROM o)
"""


def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f_keys = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    o_keys = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    both = f_keys.intersect(o_keys).agg(F.count("*").alias("n")).select(F.lit("both").alias("tag"), "n")
    f_only = f_keys.exceptAll(o_keys).agg(F.count("*").alias("n")).select(F.lit("f_only").alias("tag"), "n")
    either = f_keys.union(o_keys).distinct().agg(F.count("*").alias("n")).select(F.lit("either").alias("tag"), "n")
    return both.unionAll(f_only).unionAll(either)


_SCALAR_FN_SQL = """
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       substr(p_type, 1, 3) AS type_prefix,
       concat(p_brand, '/', p_type) AS brand_type,
       length(p_name) AS name_len,
       replace(p_brand, 'Brand#', 'B') AS brand_short,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       abs(p_size - 25) AS size_dist,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
       p_size % 5 AS size_mod
FROM part
"""


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/math library showcase (the reference has only the §2.2
    string ops). sqrt is IEEE-exact so it's cross-engine safe; ln/exp are
    deliberately excluded (libm vs JVM last-ulp drift)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        (F.col("p_size") % 5).alias("size_mod"),
    )


_DATE_FN_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(day(o_orderdate) AS INT) AS order_day,
       CAST(dayofweek(o_orderdate) AS INT) AS order_dow,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
FROM orders
"""


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function coverage. DuckDB dayofweek: Sunday=0; Spark
    dayofweek: Sunday=1 — normalized to DuckDB's convention here."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("order_dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("due_date"),
    )


_CASE_SQL = """
SELECT
  CASE WHEN o_totalprice < 100000 THEN 'small'
       WHEN o_totalprice < 300000 THEN 'medium'
       ELSE 'large' END AS price_band,
  coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
  count(*) AS n
FROM orders
GROUP BY 1, 2
"""


def case_coalesce_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
        .alias("price_band")
    )
    status = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
        "status_norm"
    )
    return o.groupBy(band, status).agg(F.count("*").alias("n"))


_JSON_SQL = """
SELECT json_extract_string(props, '$.k') AS k_val, count(*) AS n
FROM events
GROUP BY 1
"""


def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(F.get_json_object("props", "$.k").alias("k_val")).agg(
        F.count("*").alias("n")
    )


_DISTINCT_COUNT_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


_ABOVE_AVG_SQL = """
WITH cust_avg AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price
  FROM orders GROUP BY o_custkey
)
SELECT o.o_custkey, count(*) AS n_above
FROM orders o JOIN cust_avg a ON o.o_custkey = a.o_custkey
WHERE CAST(o.o_totalprice AS DOUBLE) > a.avg_price
GROUP BY o.o_custkey
"""


def subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (orders above their customer's average),
    decorrelated into an aggregate+join — the plan Catalyst produces for
    the correlated form anyway."""
    o = load_table(spark, sf_dir, "orders")
    avg = o.groupBy("o_custkey").agg(
        (F.sum(_dec("o_totalprice")).cast("double") / F.count("*")).alias("avg_price")
    ).withColumnRenamed("o_custkey", "a_custkey")
    return (
        o.join(avg, o.o_custkey == avg.a_custkey)
        .filter(F.col("o_totalprice").cast("double") > F.col("avg_price"))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_above"))
    )


_UNION_MONTHLY_SQL = """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       'orders' AS src, count(*) AS n
FROM orders GROUP BY 1
UNION ALL
SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
       'shipments' AS src, count(*) AS n
FROM lineitem GROUP BY 1
"""


def union_monthly_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    om = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(F.count("*").alias("n")).select("month", F.lit("orders").alias("src"), "n")
    lm = li.groupBy(
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("month")
    ).agg(F.count("*").alias("n")).select("month", F.lit("shipments").alias("src"), "n")
    return om.unionAll(lm)
