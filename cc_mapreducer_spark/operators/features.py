"""Feature transforms for training pipelines.

``percent_rank_by_group`` — the quantile/rank transform (uniformize a
feature within a group) — with a formulation that survives skewed
groups. The textbook
``percent_rank().over(Window.partitionBy(group).orderBy(value))``
sorts EVERY ROW of a group in one task; at fact scale a group is
billions of rows. But percent_rank only depends on a value's position
among the group's DISTINCT values:

    rank(v)      = (# rows with value < v) + 1
    pct_rank(v)  = (rank - 1) / (n_group - 1)

so the heavy lifting reduces to a (group, value) count table and a
running sum over it — the window runs over |distinct values| rows per
group (bounded by value cardinality, not row count), and rows get
their rank back via an equi-join on (group, value). Tie semantics are
identical to SQL percent_rank (ties share the min rank) — pinned
against Spark's own window function in tests and against DuckDB's in
the oracle.

Scale notes (100 TB): one shuffle for the (group, value) agg
(map-side combined — the Zipf head compresses hardest), a distinct-
value window, a broadcast of the per-group totals, and one join back
on (group, value). No row-level window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table


def percent_rank_by_group(
    df: DataFrame, group: str, value: str, out: str = "pct_rank"
) -> DataFrame:
    """Add ``out`` = percent_rank of ``value`` within ``group`` without
    ever sorting a whole group in one task."""
    vc = df.groupBy(group, value).agg(F.count("*").alias("__cnt"))
    w = Window.partitionBy(group).orderBy(value)
    cum = vc.withColumn(
        "__below", F.sum("__cnt").over(w) - F.col("__cnt")
    ).drop("__cnt")
    n = df.groupBy(group).agg(F.count("*").alias("__n"))
    pct = F.when(
        F.col("__n") > 1,
        F.col("__below").cast("double") / (F.col("__n") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        df.join(cum, [group, value])
        .join(F.broadcast(n), group)
        .withColumn(out, pct)
        .drop("__below", "__n")
    )


_PCT_RANK_SQL = """
SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
       round(percent_rank() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice), 9) AS pct_rank
FROM lineitem
"""


@register("price_percent_rank", oracle=_PCT_RANK_SQL, driver=False)
def price_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank of l_extendedprice within each l_returnflag — the
    oracle states it with the textbook row-level window; the operator
    computes it with the distinct-value formulation above (same values,
    skew-immune plan)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    out = percent_rank_by_group(li, "l_returnflag", "l_extendedprice")
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_extendedprice",
        F.round("pct_rank", 9).alias("pct_rank"),
    )


# --------------------------------------------------------------------------
# target encoding (mean encoding) — smoothed and leave-one-out
# --------------------------------------------------------------------------

_TE_M = 10.0  # smoothing pseudo-count

_TARGET_ENC_SQL = f"""
WITH cat AS (
    SELECT o_orderpriority,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
           count(*) AS n
    FROM orders GROUP BY 1
), g AS (
    SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           / count(*) AS mu
    FROM orders
)
SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
       round((c.s + {_TE_M} * g.mu) / (c.n + {_TE_M}), 6) AS enc_smoothed,
       CASE WHEN c.n > 1
            THEN round((c.s - o.o_totalprice) / (c.n - 1), 6)
            ELSE NULL END AS enc_loo
FROM orders o JOIN cat c USING (o_orderpriority) CROSS JOIN g
"""


@register("target_encoded_orders", oracle=_TARGET_ENC_SQL, driver=False)
def target_encoded_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target encoding of o_orderpriority against o_totalprice, the two
    standard leak-resistant variants side by side:

      * enc_smoothed — (sum_cat + m*mu) / (n_cat + m): shrinks rare
        categories toward the global mean (m = {_TE_M} pseudo-counts).
      * enc_loo — leave-one-out: (sum_cat - own_target) / (n_cat - 1),
        NULL for singleton categories. A row never sees its own target
        — the same leakage discipline as the SCD2 point-in-time join.

    Determinism: category sums and the global mean route through
    DECIMAL (exact, order-independent); each encoding is then a single
    IEEE division, exported on the 6dp grid. Shape at scale: one
    map-side-combined category aggregate (|categories| rows, broadcast
    back) + a one-row global mean — the fact table never shuffles."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    cat = o.groupBy("o_orderpriority").agg(
        F.sum(dec).cast("double").alias("__s"),
        F.count("*").alias("__n"),
    )
    g = o.agg(
        (F.sum(dec).cast("double") / F.count("*")).alias("__mu")
    )
    enc_s = (F.col("__s") + _TE_M * F.col("__mu")) / (F.col("__n") + _TE_M)
    enc_l = F.when(
        F.col("__n") > 1,
        (F.col("__s") - F.col("o_totalprice")) / (F.col("__n") - 1),
    )
    return (
        o.join(F.broadcast(cat), "o_orderpriority")
        .crossJoin(F.broadcast(g))
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.round(enc_s, 6).alias("enc_smoothed"),
            F.round(enc_l, 6).alias("enc_loo"),
        )
    )
