"""Bucketing and salting: plan-shape + result-equivalence proofs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cc_mapreducer_spark.plans.inspect import count_exchanges, formatted_plan
from cc_mapreducer_spark.plans.scale_patterns import salted_join, write_bucketed
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # spark.sql.warehouse.dir is a static conf — tables land in the default
    # ./spark-warehouse (gitignored); DROP TABLE below removes the files.
    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    write_bucketed(o, "orders_b", "o_orderkey")
    write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey")
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    ot, lt = bucketed_tables
    # disable auto-broadcast: at test scale orders fits a broadcast, which
    # would hide the property under test (at 100 TB neither side does)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(ot).join(spark.table(lt), "o_orderkey").groupBy("o_orderstatus").count()
        plan = formatted_plan(j)
        # co-bucketed join: SortMergeJoin with ZERO shuffle exchanges before
        # it (the only exchange allowed is the final groupBy's)
        assert "SortMergeJoin" in plan
        assert "SelectedBucketsCount" in plan
        assert count_exchanges(j) == 1
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_join_equivalent_and_spread(spark):
    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").select("o_custkey", "o_orderkey")
    c = (
        spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
        .select("c_custkey", "c_mktsegment")
        .toDF("o_custkey", "c_mktsegment")
    )
    # customer renamed to share the key name; disable auto-broadcast so the
    # salted shuffle path actually runs
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = o.join(c, "o_custkey").groupBy("c_mktsegment").count()
        expect = sorted(map(tuple, plain.collect()))
        for positional in (False, True):  # both salt modes are equivalent
            salted = (
                salted_join(o, c, "o_custkey", positional=positional)
                .groupBy("c_mktsegment")
                .count()
            )
            assert sorted(map(tuple, salted.collect())) == expect
        # positional mode spreads even fully-duplicate hot-key rows
        from pyspark.sql import functions as F

        dup = spark.range(1000).select(F.lit(7).alias("k"), F.lit("x").alias("v"))
        tiny = spark.createDataFrame([(7, "dim")], "k long, d string")
        n_salts = 8
        salts = (
            dup.withColumn(
                "__salt",
                F.pmod(F.hash(F.col("k"), F.monotonically_increasing_id()), F.lit(n_salts)),
            )
            .select("__salt")
            .distinct()
            .count()
        )
        assert salts > 1  # content-hash would give exactly 1 here
        assert salted_join(dup, tiny, "k", positional=True).count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_q6_full_predicate_pushdown(spark):
    from cc_mapreducer_spark import registry

    plan = formatted_plan(registry.all_queries()["q6_forecast_revenue"](spark, SF_ORACLE))
    for pushed in ["GreaterThanOrEqual(l_shipdate", "LessThan(l_quantity,24.0)"]:
        assert pushed in plan, f"missing pushed filter {pushed}"


def test_approx_distinct_error_bound(spark):
    from cc_mapreducer_spark import registry

    rows = registry.all_queries()["approx_distinct_users"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        assert r.within_bound  # |approx - exact| / exact <= 0.05, in-query


def test_salted_agg_count_equivalent(spark):
    from cc_mapreducer_spark.plans.scale_patterns import salted_agg_count

    o = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").select(
        "o_custkey", "o_orderkey", "o_orderstatus"
    )
    plain = {
        (r.o_orderstatus, r["count"])
        for r in o.groupBy("o_orderstatus").count().collect()
    }
    salted = {
        (r.o_orderstatus, r.n)
        for r in salted_agg_count(o, "o_orderstatus").collect()
    }
    assert plain == salted


def test_partitioned_write_prunes(spark, tmp_path):
    from cc_mapreducer_spark.plans.scale_patterns import write_partitioned

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    path = str(tmp_path / "orders_by_status")
    write_partitioned(orders, path, "o_orderstatus")

    back = spark.read.parquet(path)
    one = back.filter(back.o_orderstatus == "F")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition pruning happens at planning: the filter appears as a
    # PartitionFilter on the scan and only that directory's files are read
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    expected = orders.filter(orders.o_orderstatus == "F").count()
    assert one.count() == expected
    import os

    part_dirs = [d for d in os.listdir(path) if d.startswith("o_orderstatus=")]
    assert len(part_dirs) >= 2  # layout actually split; pruning reads one dir


def test_semi_reduce_then_join_equivalent_and_broadcast(spark):
    from cc_mapreducer_spark.plans.scale_patterns import semi_reduce_then_join

    fact = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = (
        spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
        .filter("c_mktsegment = 'BUILDING'")
        .select(F.col("c_custkey").alias("o_custkey"), "c_name")
    )
    reduced = semi_reduce_then_join(fact, dim, "o_custkey")
    plain = fact.join(dim, "o_custkey")
    cols = sorted(reduced.columns)
    assert cols == sorted(plain.columns)
    a = sorted(map(tuple, reduced.select(*cols).collect()))
    b = sorted(map(tuple, plain.select(*cols).collect()))
    assert a == b and len(a) > 0
    plan = reduced._jdf.queryExecution().executedPlan().toString()
    # the key-set prune is a broadcast LEFT SEMI inside the scan stage
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_range_sorted_layout_files_near_disjoint(spark, tmp_path):
    from cc_mapreducer_spark.plans.scale_patterns import write_range_sorted

    import pyarrow.parquet as pq
    import os

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    path = str(tmp_path / "orders_range")
    write_range_sorted(orders, path, "o_orderkey", n_files=8)

    spans = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # o_orderkey
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append((min(mins), max(maxs)))
    assert len(spans) >= 4  # actually split into ranged files
    spans.sort()
    # consecutive file key ranges must not interleave (disjoint layout =>
    # footer-stats skipping works for any o_orderkey range predicate)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"overlapping file ranges ({lo1},{hi1}) vs ({lo2},{hi2})"
    # round trip intact
    assert spark.read.parquet(path).count() == orders.count()


def _file_span_fractions(path, col_name):
    """Per-file (max-min) footer span for col_name, as a fraction of the
    global span — the footer-stats skipping power for that column (1.0
    means a predicate can never skip the file)."""
    import os

    import pyarrow.parquet as pq

    per_file = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        idx = md.schema.names.index(col_name)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        per_file.append((min(mins), max(maxs)))
    glo = min(lo for lo, _ in per_file)
    ghi = max(hi for _, hi in per_file)
    span = float(ghi - glo) or 1.0
    return [float(hi - lo) / span for lo, hi in per_file]


def test_zorder_layout_clusters_both_dimensions(spark, tmp_path):
    from cc_mapreducer_spark.plans.scale_patterns import (
        write_range_sorted,
        write_zordered,
    )

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "orders_z")
    write_zordered(orders, zpath, "o_custkey", "o_totalprice", n_files=16)
    spath = str(tmp_path / "orders_s")
    write_range_sorted(orders, spath, "o_custkey", n_files=16)

    z_a = _file_span_fractions(zpath, "o_custkey")
    z_b = _file_span_fractions(zpath, "o_totalprice")
    s_b = _file_span_fractions(spath, "o_totalprice")

    # BOTH dimensions localized under Z-order (~sqrt(n_files) strips per
    # dimension), while the 1-D sorted layout leaves the second column's
    # per-file ranges near-global.
    avg = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert len(z_a) >= 8
    assert avg(z_a) <= 0.5, avg(z_a)
    assert avg(z_b) <= 0.5, avg(z_b)
    assert avg(z_b) < 0.7 * avg(s_b), (avg(z_b), avg(s_b))
    # layout change only — content intact
    assert spark.read.parquet(zpath).count() == orders.count()


def test_zorder_value_interleaves_bits(spark):
    from cc_mapreducer_spark.plans.scale_patterns import zorder_value

    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3)], "a int, b int"
    ).select(
        "a", "b", zorder_value(F.col("a"), F.col("b"), 0, 3, 0, 3, bits=2).alias("z")
    )
    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    # grid 0..3 on both axes: a bits land even, b bits odd
    assert got[(0, 0)] == 0
    assert got[(3, 0)] == 0b0101
    assert got[(0, 3)] == 0b1010
    assert got[(3, 3)] == 0b1111


def test_compact_small_files_repacks_without_shuffle(spark, tmp_path):
    from cc_mapreducer_spark.plans.scale_patterns import compact_small_files

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    # 64 tiny files
    spark.range(0, 10_000).withColumn("v", F.col("id") * 2).repartition(
        64
    ).write.parquet(src)
    import os

    n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src == 64
    n_target = compact_small_files(spark, src, dst, target_file_mb=128)
    n_dst = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_dst == n_target == 1  # tiny table fits one target file
    # same data, order-insensitive
    a = sorted(r["id"] for r in spark.read.parquet(dst).collect())
    assert a == list(range(10_000))


def test_compact_small_files_preserves_partition_layout(spark, tmp_path):
    # ADVICE r3: a flat listStatus sized a hive-partitioned tree at 0
    # bytes and the coalesce(1) rewrite silently dropped the layout.
    from cc_mapreducer_spark.plans.scale_patterns import compact_small_files

    src = str(tmp_path / "part_src")
    dst = str(tmp_path / "part_dst")
    (
        spark.range(0, 3_000)
        .withColumn("p", (F.col("id") % 3).cast("int"))
        .repartition(16)
        .write.partitionBy("p")
        .parquet(src)
    )
    import os

    n = compact_small_files(spark, src, dst, target_file_mb=128)
    # layout preserved: the three p=<v> dirs exist, clustered to ~1
    # file per partition value (3 total), and the data round-trips
    assert sorted(
        d for d in os.listdir(dst) if d.startswith("p=")
    ) == ["p=0", "p=1", "p=2"]
    assert n == 3
    a = sorted(r["id"] for r in spark.read.parquet(dst).collect())
    assert a == list(range(3_000))


def test_bucketed_window_is_shuffle_free(spark):
    # the sessionize-from-storage pattern: events bucketed by user_id
    # feed per-user windows with ZERO Exchange — the scan's bucketed
    # HashPartitioning(user_id) satisfies the window's required
    # distribution, so every per-user pass (lag/session/funnel) runs
    # straight off storage. At 100 TB this is why the events table is
    # bucketed in the first place.
    from pyspark.sql import Window

    e = spark.read.parquet(f"{SF_ORACLE}/events.parquet").select(
        "user_id", "event_id", "ts"
    )
    write_bucketed(e, "events_b", "user_id")
    try:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        lagged = spark.table("events_b").withColumn(
            "prev_ts", F.lag("ts").over(w)
        )
        assert count_exchanges(lagged) == 0, formatted_plan(lagged)
        # equivalence against the plain (shuffling) read
        plain = e.withColumn("prev_ts", F.lag("ts").over(w))
        a = sorted(map(tuple, lagged.collect()))
        b = sorted(map(tuple, plain.collect()))
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS events_b")
