"""Scale patterns: bucketing for co-located joins, salting for skew.

These are the two knobs SURVEY §2.8 / the build brief call out beyond what
AQE does automatically. Both are demonstrated as library functions with
plan/equivalence tests (tests/test_scale_patterns.py) rather than
registered queries — they change HOW a plan executes, not WHAT it returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 8) -> None:
    """Persist a table bucketed+sorted by the join key. Two tables bucketed
    the same way join WITHOUT any Exchange (shuffle-free sort-merge join) —
    the 100 TB answer for a fact-fact join that repeats every run."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    positional: bool = False,
) -> DataFrame:
    """Skew-salted inner equi-join: the big (skewed) side gets a salt in
    [0, n_salts); the small side is exploded n_salts times so every
    (key, salt) bucket finds its match. Result set is identical to an
    unsalted join; the shuffle spreads a hot key over n_salts partitions.
    (AQE's skew-join handles post-hoc splitting; salting is the a-priori
    form that also works for aggregations.)

    Salt derivation is a genuine three-way tradeoff; this exposes the two
    sound corners and rejects the third:
    * default (positional=False): hash of the row's own columns —
      fully deterministic, so retries re-route every row identically and
      the stage is never marked indeterminate. Limitation: a hot key
      whose rows are FULL DUPLICATES all hash to one salt (the skew
      survives); fine whenever any non-key column varies.
    * positional=True: mixes in monotonically_increasing_id(), which
      spreads even duplicate rows but is order-dependent — Spark marks
      the stage indeterminate and must roll back and recompute the WHOLE
      stage (not one task) if a retry invalidates shuffle output. Safe,
      but failure recovery costs more; opt in for duplicate-heavy skew.
    * rand() is neither: re-drawn per attempt WITHOUT the indeterminate
      bookkeeping pre-Spark-3, the classic lost/duplicated-row bug.
    The salt never reaches the output (dropped below), so neither mode
    can leak instability into results."""
    entropy = (
        [F.col(key), F.monotonically_increasing_id()]
        if positional
        else [F.col(c) for c in big.columns]
    )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.hash(*entropy), F.lit(n_salts)).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(salted_small, [key, "__salt"]).drop("__salt")
    return out


def salted_agg_count(big: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Skew-safe per-key count: phase 1 partially aggregates on
    (key, salt) — a hot key's rows spread over n_salts tasks — phase 2
    sums the partials per key. The salt is hash-derived (deterministic
    under task retries, unlike rand()): any column works as entropy since
    only uniformity matters, so spark_partition_id + a monotonic id is
    avoided in favor of the row's own key-adjacent bytes.

    Equivalent to groupBy(key).count() exactly (asserted in
    tests/test_scale_patterns.py); use when ONE grouping key dominates —
    for ordinary distributions Spark's map-side partial aggregation
    already does this work without the extra shuffle stage."""
    salted = big.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast("int"),
    )
    partial = salted.groupBy(key, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").cast("bigint").alias("n"))


def semi_reduce_then_join(
    fact: DataFrame, dim_filtered: DataFrame, key: str
) -> DataFrame:
    """Semi-join reduction: shrink the fact side to keys that CAN match
    before the wide join. The broadcast LEFT SEMI against the filtered
    dim's distinct keys drops non-matching fact rows inside the scan
    stage — columns beyond the key are never shuffled for rows the join
    would discard. At 100 TB this is the difference between shuffling the
    full fact table and shuffling the selectivity-fraction of it; on
    engines with runtime filters (DPP/Bloom) the optimizer injects this
    automatically for partition columns, and this is the explicit form
    for arbitrary keys. Result is identical to the plain inner join
    (asserted in tests/test_scale_patterns.py)."""
    keys = dim_filtered.select(key).distinct()
    pruned = fact.join(F.broadcast(keys), key, "left_semi")
    return pruned.join(F.broadcast(dim_filtered), key)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    n_files: int = 8,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Range-partitioned, sorted data layout: repartitionByRange splits
    rows into contiguous key ranges, sortWithinPartitions orders each
    file, so every parquet file's (min, max) stats for sort_col are
    near-disjoint. Readers filtering on sort_col then skip whole files /
    row groups from footer stats alone — the single biggest I/O lever for
    a 100 TB table with a dominant filter column (the poor man's
    Z-order for one dimension). Disjointness is asserted against the
    actual parquet footers in tests/test_scale_patterns.py."""
    (
        df.repartitionByRange(n_files, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )


def zorder_value(col_a, col_b, min_a, max_a, min_b, max_b, bits: int = 16):
    """Z-order (Morton) key of two numeric columns: each is min-max
    scaled to a `bits`-bit integer grid, then the bit strings are
    interleaved (a in even positions, b in odd). Nearby (a, b) points
    get nearby z-values, so ONE range-sorted layout clusters BOTH
    dimensions. Pure JVM-side bit arithmetic (shift/and/or unrolled at
    plan-build time — 2*bits OR terms inside whole-stage codegen)."""
    span_a = F.when(F.lit(max_a) > F.lit(min_a), F.lit(max_a) - F.lit(min_a)).otherwise(F.lit(1))
    span_b = F.when(F.lit(max_b) > F.lit(min_b), F.lit(max_b) - F.lit(min_b)).otherwise(F.lit(1))
    grid = (1 << bits) - 1
    qa = F.floor((col_a - F.lit(min_a)) * F.lit(float(grid)) / span_a).cast("long")
    qb = F.floor((col_b - F.lit(min_b)) * F.lit(float(grid)) / span_b).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(qa.bitwiseAND(F.lit(1 << i)), i)  # bit i -> position 2i
        ).bitwiseOR(
            F.shiftleft(qb.bitwiseAND(F.lit(1 << i)), i + 1)  # bit i -> position 2i+1
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 16,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Z-ordered data layout over TWO filter columns — the multi-dim
    complement of write_range_sorted. A single-column sort makes one
    dimension's per-file (min, max) footer stats disjoint but leaves the
    other column's ranges as wide as the table; Z-order trades a little
    disjointness in each dimension for locality in both, so point/range
    predicates on EITHER column skip most files from footer stats alone
    (~sqrt(n_files) effective partitions per dimension). This is the
    layout Delta's OPTIMIZE ZORDER BY materializes; here it is one
    repartitionByRange on the Morton key — min/max for the grid come
    from a cheap 1-row agg (at 100 TB: from table statistics)."""
    stats = df.agg(
        F.min(col_a).alias("min_a"),
        F.max(col_a).alias("max_a"),
        F.min(col_b).alias("min_b"),
        F.max(col_b).alias("max_b"),
    ).first()
    z = zorder_value(
        F.col(col_a),
        F.col(col_b),
        stats["min_a"],
        stats["max_a"],
        stats["min_b"],
        stats["max_b"],
        bits,
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame, path: str, partition_col: str, max_records_per_file: int = 1_000_000
) -> None:
    """Hive-style partitioned layout with bounded file sizes — the
    standard 100 TB table layout. Readers filtering on the partition
    column prune directories at planning time (PartitionFilters in the
    scan, asserted in tests/test_scale_patterns.py); maxRecordsPerFile
    caps file size without an extra repartition job."""
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(partition_col)
        .parquet(path)
    )


def compact_small_files(
    spark, path: str, out_path: str, target_file_mb: int = 128
) -> int:
    """Bin-pack a fragmented parquet table (the debris CDC merges and
    incremental appends leave behind) into ~target-size files. Small
    files are the classic silent killer at 100 TB: a 1 KB-file table
    turns every scan into per-file open/footer overhead and floods the
    driver with task metadata.

    File count = ceil(on-disk bytes / target) from a RECURSIVE source
    sizing (getContentSummary — a flat listStatus reads 0 bytes on a
    hive-partitioned tree and would funnel the whole table through one
    task). coalesce(), not repartition(): packing wants NO shuffle, just
    fewer, bigger write tasks (each output task reads several input
    files sequentially).

    A hive-partitioned source (detected from the name=value directory
    chain) keeps its layout: the rewrite re-applies partitionBy with the
    detected columns, clustered by one repartition on them so each
    partition value lands in ~one output file — that shuffle is the
    price of re-clustering, and it is exactly the Delta/Iceberg OPTIMIZE
    shape. Returns the number of data files actually written.
    """
    import math
    import re

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jvm_path).getLength()
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))

    # partition columns = the name=value directory chain off the root
    part_cols: list[str] = []
    probe = jvm_path
    while True:
        subdirs = [
            f.getPath().getName()
            for f in fs.listStatus(probe)
            if f.isDirectory()
        ]
        m = [re.match(r"([^=]+)=", d) for d in subdirs]
        names = {x.group(1) for x in m if x}
        if len(names) != 1 or any(x is None for x in m):
            break
        col = names.pop()
        part_cols.append(col)
        probe = spark._jvm.org.apache.hadoop.fs.Path(
            probe, subdirs[0]
        )

    df = spark.read.parquet(path)
    if part_cols:
        (
            df.repartition(*part_cols)
            .write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(out_path)
        )
    else:
        df.coalesce(n_files).write.mode("overwrite").parquet(out_path)

    def _count_files(p) -> int:
        n = 0
        for f in fs.listStatus(p):
            if f.isDirectory():
                n += _count_files(f.getPath())
            elif f.getPath().getName().startswith("part-"):
                n += 1
        return n

    return _count_files(spark._jvm.org.apache.hadoop.fs.Path(out_path))
