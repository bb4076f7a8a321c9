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
    # Both layouts from ONE execution of the tiled frame: the r12
    # before-plan shows the union re-deriving the scan + both global
    # ntile windows once PER BRANCH (guide §2.4 — duplicated subtrees).
    # A row-local explode of the two (layout, pid) taggings replaces
    # the self-union: the windows run once, the doubled rows are 4
    # small columns wide, and the aggregation is unchanged.
    both = df.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.col("zpid").alias("pid"),
                ),
                F.struct(
                    F.lit("linear").alias("layout"),
                    F.col("lpid").alias("pid"),
                ),
            )
        ).alias("lp"),
        "ck",
        "day",
    ).select("lp.layout", "lp.pid", "ck", "day")
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


def _injective_slots(df: DataFrame, n: int) -> list[int]:
    """Probe values v_0..v_{n-1} with pmod(murmur3(v_i), n) == i.

    ``df.repartition(n, col)`` places a row in partition
    pmod(Murmur3Hash(col), n); F.hash IS that Murmur3 (fixed seed 42),
    so probing small ints through F.hash yields a bucket->value remap
    that makes hash partitioning behave as an identity partitioner —
    bucket i lands in partition i, one bucket per output file, no
    sampling anywhere. Coupon-collector bound: ~n·ln(n) probes; 64n is
    comfortable for any practical file count."""
    spark = df.sparkSession
    probes = (
        spark.range(0, 64 * n)
        .select(
            F.col("id").cast("int").alias("v"),
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("slot"),
        )
        .groupBy("slot")
        .agg(F.min("v").alias("v"))
        .collect()
    )
    slots = {r.slot: r.v for r in probes}
    if len(slots) != n:  # pragma: no cover - 64n probes always suffice
        raise RuntimeError(f"hash probe covered {len(slots)}/{n} slots")
    return [slots[i] for i in range(n)]


def linear_write(
    df: DataFrame, path: str, col: str, n_files: int = N_PARTITIONS
) -> None:
    """The 1-D baseline layout (e.g. date-sorted) through the SAME
    deterministic mechanics as zorder_write: exact percentile
    boundaries on one column, row-local bucket assignment, injective
    hash remap. Exists so layout comparisons (tests/test_zorder.py)
    measure Z-order vs linear, not sampler noise vs sampler noise."""
    qs = [i / n_files for i in range(1, n_files)]
    bounds_row = df.agg(
        F.percentile(F.expr(f"CAST({col} AS BIGINT)"), F.lit(qs)).alias("b")
    ).collect()[0]
    bounds = ", ".join(f"{b!r}D" for b in bounds_row.b)
    slots = _injective_slots(df, n_files)
    slot_arr = ", ".join(str(v) for v in slots)
    (
        df.withColumn(
            "__slot",
            F.expr(
                f"array({slot_arr})"
                f"[size(filter(array({bounds}), b -> CAST({col} AS BIGINT) > b))]"
            ),
        )
        .repartition(n_files, "__slot")
        .sortWithinPartitions(col)
        .drop("__slot")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_write(
    df: DataFrame,
    path: str,
    d1: str,
    d2: str,
    n_files: int = N_PARTITIONS,
) -> None:
    """The production layout path: compute the Morton code, split it at
    exact percentile boundaries, route each bucket to its own output
    file, sort within files so row-group stats tighten too, and write.
    Each output file's parquet footer then carries the min/max of BOTH
    dims — the pruning metadata the stats queries model declaratively
    (demonstrated on real footers in tests/test_zorder.py).

    Deterministic by construction (r8 verdict item 4): the r8 version
    used repartitionByRange, whose reservoir sample depends on row
    order within upstream partitions — nondeterministic after any
    shuffle, so the file layout (and the measured pruning win) drifted
    run to run. Now the boundaries come from an order-insensitive exact
    percentile, bucket assignment is row-local arithmetic, and the
    bucket->partition mapping is an injective Murmur3 remap
    (_injective_slots) — same input rows, same files, every run. At
    100 TB swap the exact percentile for approx_percentile(z, .., 10k):
    the layout tolerates boundary error; only the test needs exactness.

    Guards the 16-bit Morton precondition (ADVICE r8): the bit-spread
    ladder masks dims to 16 bits, so values >= 65536 would silently
    alias distinct keys onto one z-value; the same single aggregation
    that computes the boundaries checks both dims and fails loudly."""
    z = F.expr(z_value_sql(d1, d2, "spark")).cast("long").alias("__z")
    zdf = df.withColumn("__z", z)
    qs = [i / n_files for i in range(1, n_files)]
    stats = zdf.agg(
        F.percentile("__z", F.lit(qs)).alias("bounds"),
        F.max(F.expr(f"CAST({d1} AS BIGINT)")).alias("m1"),
        F.max(F.expr(f"CAST({d2} AS BIGINT)")).alias("m2"),
    ).collect()[0]
    if stats.m1 >= (1 << 16) or stats.m2 >= (1 << 16):
        raise ValueError(
            f"zorder_write dims must fit 16 bits: max({d1})={stats.m1}, "
            f"max({d2})={stats.m2}; bucket the dims first"
        )
    bounds = ", ".join(f"{b!r}D" for b in stats.bounds)
    slots = _injective_slots(df, n_files)
    slot_arr = ", ".join(str(v) for v in slots)
    (
        zdf.withColumn(
            "__slot",
            F.expr(
                f"array({slot_arr})"
                f"[size(filter(array({bounds}), b -> __z > b))]"
            ),
        )
        .repartition(n_files, "__slot")
        .sortWithinPartitions("__z")
        .drop("__z", "__slot")
        .write.mode("overwrite")
        .parquet(path)
    )
