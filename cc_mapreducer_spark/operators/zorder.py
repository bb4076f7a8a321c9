"""Z-order (Morton) clustering — the lakehouse layout operator for
multi-dimensional data skipping.

A 100 TB table is pruned, not scanned: readers skip files/row groups
whose min/max statistics cannot contain the predicate. Sorting by one
column makes ONE dimension prunable and shatters every other; Z-order
interleaves the bits of two keys so range-partitioning on the Z-value
keeps BOTH dimensions locally clustered — box predicates (customer
range × date range) then overlap few partitions. This is what
`OPTIMIZE ... ZORDER BY` does in lakehouse engines; Spark has no
built-in, and the whole thing is expressible with deterministic
integer arithmetic:

  spread(x): x | x<<8 ... masked 0x00FF00FF / 0x0F0F0F0F / 0x33333333
             / 0x55555555 — the classic bit-spread ladder, identical
             integer ops in Spark SQL and DuckDB, so the oracle pins
             every Z-value and every pruning decision bit-for-bit.
  layout:    ntile(N) over (ORDER BY z, unique-key) — the range
             partitioner any writer applies (repartitionByRange on z
             at scale; ntile here keeps the demonstration closed-form).
  skipping:  per-partition min/max of BOTH dims IS the pruning
             metadata; a partition is scanned iff its stats box
             overlaps the predicate box — computed declaratively for
             the Z-order layout and the date-sorted baseline, so the
             report MEASURES the win (and the 1-D tradeoff) instead of
             asserting it.

Scale shape: Z-value computation rides the scan; the layout is one
range shuffle (what the writer pays anyway); stats are one
partial-aggregated groupBy on the partition id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table

N_PARTITIONS = 32

_SPREAD_STEPS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread_sql(expr: str, shift_fmt: str) -> str:
    """The 16->32-bit bit-spread ladder as SQL text. ``shift_fmt``
    renders a left shift: '({x} << {n})' for DuckDB,
    'shiftleft({x}, {n})' for Spark SQL."""
    out = expr
    for n, mask in _SPREAD_STEPS:
        shifted = shift_fmt.format(x=out, n=n)
        out = f"(({out} | {shifted}) & {mask})"
    return out


def z_value_sql(d1: str, d2: str, engine: str) -> str:
    """Morton code of two 16-bit dims: spread(d1) | spread(d2) << 1.
    Dims are forced to BIGINT first — Spark would otherwise run the
    ladder in 32-bit INT arithmetic and overflow at (65535, 65535)."""
    fmt = "({x} << {n})" if engine == "duck" else "shiftleft({x}, {n})"
    s1 = _spread_sql(f"CAST({d1} AS BIGINT)", fmt)
    s2 = _spread_sql(f"CAST({d2} AS BIGINT)", fmt)
    s2_shift = fmt.format(x=s2, n=1)
    return f"({s1} | {s2_shift})"


# dims: customer key and order day number — the classic "who x when"
# box-query pair. Both fit 16 bits at any tested SF (asserted in the
# pytest; at production scale the dims are bucket numbers).
_SPARK_D1 = "o_custkey"
_SPARK_D2 = "datediff(o_orderdate, DATE '1992-01-01')"
_DUCK_D1 = "o_custkey"
_DUCK_D2 = "datediff('day', TIMESTAMP '1992-01-01', o_orderdate)"

# the demonstration predicates: a 2-D box and a 1-D time slice (the
# tradeoff case a layout report must show honestly)
BOX_CK = (100, 400)
# wide in time, narrow in customer — the shape a date-sorted layout
# cannot prune (every day-tile holds every customer) and Z-order can
BOX_DAY = (500, 1500)


def order_layouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders with both layouts' partition ids: ``zpid`` (ntile over the
    Morton code) and ``lpid`` (ntile over date — the default time-sorted
    layout), plus the dims and the z value."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    z = F.expr(z_value_sql(_SPARK_D1, f"({_SPARK_D2})", "spark"))
    base = orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("ck"),
        F.expr(_SPARK_D2).cast("long").alias("day"),
        z.cast("long").alias("z"),
    )
    wz = Window.orderBy("z", "o_orderkey")
    wl = Window.orderBy("day", "o_orderkey")
    return base.select(
        "o_orderkey",
        "ck",
        "day",
        "z",
        F.ntile(N_PARTITIONS).over(wz).alias("zpid"),
        F.ntile(N_PARTITIONS).over(wl).alias("lpid"),
    )


_LAYOUT_BASE_SQL = f"""
    SELECT o_orderkey,
           {_DUCK_D1} AS ck,
           {_DUCK_D2} AS day,
           {z_value_sql(_DUCK_D1, f"({_DUCK_D2})", "duck")} AS z
    FROM orders
"""

_PARTITION_STATS_SQL = f"""
WITH base AS ({_LAYOUT_BASE_SQL}),
tiled AS (
    SELECT *,
           ntile({N_PARTITIONS}) OVER (ORDER BY z, o_orderkey) AS zpid,
           ntile({N_PARTITIONS}) OVER (ORDER BY day, o_orderkey) AS lpid
    FROM base
),
layouts AS (
    SELECT 'zorder' AS layout, zpid AS pid, ck, day FROM tiled
    UNION ALL
    SELECT 'linear', lpid, ck, day FROM tiled
)
SELECT layout, CAST(pid AS BIGINT) AS pid,
       CAST(min(ck) AS BIGINT) AS min_ck, CAST(max(ck) AS BIGINT) AS max_ck,
       CAST(min(day) AS BIGINT) AS min_day,
       CAST(max(day) AS BIGINT) AS max_day,
       CAST(count(*) AS BIGINT) AS n_rows
FROM layouts GROUP BY layout, pid
"""


@register("zorder_partition_stats", oracle=_PARTITION_STATS_SQL, driver=False)
def zorder_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (layout, partition): min/max of both dimensions + row count —
    the pruning metadata a reader consults. Every Z-value and tile
    boundary re-derived exactly by the oracle."""
    df = order_layouts(spark, sf_dir)
    both = df.select(
        F.lit("zorder").alias("layout"), F.col("zpid").alias("pid"),
        "ck", "day",
    ).unionByName(
        df.select(
            F.lit("linear").alias("layout"), F.col("lpid").alias("pid"),
            "ck", "day",
        )
    )
    return both.groupBy("layout", F.col("pid").cast("long").alias("pid")).agg(
        F.min("ck").cast("long").alias("min_ck"),
        F.max("ck").cast("long").alias("max_ck"),
        F.min("day").cast("long").alias("min_day"),
        F.max("day").cast("long").alias("max_day"),
        F.count("*").cast("long").alias("n_rows"),
    )


_PRUNING_SQL = f"""
WITH stats AS ({_PARTITION_STATS_SQL}),
queries AS (
    SELECT 'box_ck_x_day' AS query,
           {BOX_CK[0]} AS ck_lo, {BOX_CK[1]} AS ck_hi,
           {BOX_DAY[0]} AS day_lo, {BOX_DAY[1]} AS day_hi
    UNION ALL
    SELECT 'slice_day_only', NULL, NULL, {BOX_DAY[0]}, {BOX_DAY[1]}
)
SELECT s.layout, q.query,
       CAST(count(*) AS BIGINT) AS n_partitions,
       CAST(count(*) FILTER (WHERE
            (q.ck_lo IS NULL OR (s.max_ck >= q.ck_lo AND s.min_ck <= q.ck_hi))
        AND (s.max_day >= q.day_lo AND s.min_day <= q.day_hi))
            AS BIGINT) AS n_scanned,
       CAST(sum(s.n_rows) FILTER (WHERE
            (q.ck_lo IS NULL OR (s.max_ck >= q.ck_lo AND s.min_ck <= q.ck_hi))
        AND (s.max_day >= q.day_lo AND s.min_day <= q.day_hi))
            AS BIGINT) AS rows_scanned
FROM stats s CROSS JOIN queries q
GROUP BY s.layout, q.query
"""


@register("zorder_pruning_report", oracle=_PRUNING_SQL, driver=False)
def zorder_pruning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measured skipping win: for the 2-D box predicate and the 1-D
    time slice, how many partitions (and rows) each layout's min/max
    stats force a reader to scan. Z-order must beat the date-sorted
    layout on the box and concede the pure time slice — the tradeoff
    reported, not asserted."""
    stats = zorder_partition_stats(spark, sf_dir)
    queries = spark.createDataFrame(
        [
            ("box_ck_x_day", BOX_CK[0], BOX_CK[1], BOX_DAY[0], BOX_DAY[1]),
            ("slice_day_only", None, None, BOX_DAY[0], BOX_DAY[1]),
        ],
        "query string, ck_lo long, ck_hi long, day_lo long, day_hi long",
    )
    joined = stats.crossJoin(F.broadcast(queries))
    overlaps = (
        F.col("ck_lo").isNull()
        | ((F.col("max_ck") >= F.col("ck_lo"))
           & (F.col("min_ck") <= F.col("ck_hi")))
    ) & (
        (F.col("max_day") >= F.col("day_lo"))
        & (F.col("min_day") <= F.col("day_hi"))
    )
    return joined.groupBy("layout", "query").agg(
        F.count("*").cast("long").alias("n_partitions"),
        F.count(F.when(overlaps, 1)).cast("long").alias("n_scanned"),
        F.sum(F.when(overlaps, F.col("n_rows")))
        .cast("long")
        .alias("rows_scanned"),
    )


def zorder_write(
    df: DataFrame,
    path: str,
    d1: str,
    d2: str,
    n_files: int = N_PARTITIONS,
) -> None:
    """The production layout path: compute the Morton code, range-
    partition on it (one range shuffle — the write job's shuffle), sort
    within partitions so row-group stats tighten too, and write. Each
    output file's parquet footer then carries the min/max of BOTH dims
    — the pruning metadata the stats queries model declaratively
    (demonstrated on real footers in tests/test_zorder.py)."""
    z = F.expr(z_value_sql(d1, d2, "spark")).cast("long").alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
