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
