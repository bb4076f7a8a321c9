"""CSV/JSONL format roundtrips with explicit schemas, plus invariant
property tests that need no oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_mapreducer_spark import registry
from cc_mapreducer_spark.operators.dedup import near_dedup_minhash
from cc_mapreducer_spark.sources.formats import read_csv, read_jsonl, write_csv, write_jsonl
from tests.conftest import SF_SMOKE

Q = registry.all_queries()


def _orders(spark):
    return spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def test_csv_roundtrip(spark, tmp_path):
    df = _orders(spark)
    out = str(tmp_path / "csv")
    write_csv(df, out)
    back = read_csv(spark, out, df.schema)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jsonl_roundtrip(spark, tmp_path):
    df = _orders(spark)
    out = str(tmp_path / "jsonl")
    write_jsonl(df, out)
    back = read_jsonl(spark, out, df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jsonl_nested_roundtrip(spark, tmp_path):
    """JSON must carry nested structs/arrays intact (the shape multimodal
    metadata and band signatures use)."""
    df = spark.createDataFrame(
        [(1, {"w": 10, "h": 20}, ["a", "b"]), (2, {"w": 5, "h": 7}, [])],
        "id long, meta struct<w:int,h:int>, tags array<string>",
    )
    out = str(tmp_path / "nested")
    write_jsonl(df, out)
    back = read_jsonl(spark, out, df.schema)
    assert sorted(map(str, back.collect())) == sorted(map(str, df.collect()))


# --------------------------------------------------------------------------
# oracle-free invariants
# --------------------------------------------------------------------------


def test_exact_dedup_idempotent(spark):
    """Deduplicating a deduplicated corpus changes nothing."""
    once = Q["exact_dedup"](spark, SF_SMOKE)
    kept = once.count()
    # re-dedup over the surviving (content_sha) set: every group is size 1
    again = once.groupBy("content_sha").count().filter(F.col("count") > 1).count()
    assert again == 0 and kept > 0


def test_sessionize_conservation(spark):
    """Session event counts must sum to the table's row count, and every
    session duration fits inside the observed time range."""
    sessions = Q["event_sessionize"](spark, SF_SMOKE)
    total = sessions.agg(F.sum("n_events")).first()[0]
    # through the tolerant reader: a bare spark.read.parquet fails on a
    # round-1 INT64-nanos file unless an earlier test set nanosAsLong
    from cc_mapreducer_spark.tables import load_table

    n_events = load_table(spark, SF_SMOKE, "events").count()
    assert total == n_events
    max_dur = sessions.agg(F.max("duration_us")).first()[0]
    assert max_dur >= 0


def test_minhash_pairs_are_symmetric_free(spark):
    """Candidate pairs are emitted once (doc_a < doc_b), never mirrored."""
    pairs = near_dedup_minhash(spark, SF_SMOKE).collect()
    seen = {(r.doc_a, r.doc_b) for r in pairs}
    assert all(a < b for a, b in seen)
    assert all((b, a) not in seen for a, b in seen)
    assert all(0.0 <= r.jaccard <= 1.0 for r in pairs)


def test_similarity_cosine_bounds(spark):
    rows = Q["similarity_topk_bruteforce"](spark, SF_SMOKE).collect()
    assert all(-1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9 for r in rows)
    # ranks are dense 1..k per query
    from collections import defaultdict

    by_q = defaultdict(list)
    for r in rows:
        by_q[r.query_id].append(r.rn)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC roundtrip preserves values and the scan supports predicate
    pushdown / column pruning like parquet."""
    from cc_mapreducer_spark.sources.formats import read_orc, write_orc

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    assert sorted(back.columns) == sorted(orders.columns)
    a = sorted(map(tuple, orders.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    filtered = back.filter(back.o_orderstatus == "F").select("o_orderkey")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # pushdown reaches the ORC scan; projection prunes to the 2 used cols
    assert "PushedFilters" in plan and "o_orderstatus" in plan


def test_events_nanos_fallback_scopes_conf(spark, tmp_path):
    """A round-1 style INT64-nanos events file must read through the
    tolerant fallback (nanosAsLong applied only AFTER the plain read
    fails), normalize to correct micros wall-clock values, and leave
    micros files readable in the same session."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cc_mapreducer_spark.tables import load_table

    base_ns = 1_700_000_000_000_000_000
    ts = pa.array([base_ns + i * 1_000_000_000 for i in range(10)], pa.timestamp("ns"))
    t = pa.table(
        {
            "event_id": pa.array(range(10), pa.int64()),
            "user_id": pa.array([1] * 10, pa.int64()),
            "event_type": pa.array(["view"] * 10),
            "value": pa.array([1.0] * 10),
            "ts": ts,
        }
    )
    # store_schema=False drops the Arrow schema blob so Spark sees only
    # the raw physical INT64 TIMESTAMP(NANOS) type, like the r1 driver files
    pq.write_table(t, str(tmp_path / "events.parquet"), store_schema=False)
    try:
        df = load_table(spark, str(tmp_path), "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        # format engine-side: collect() renders via the HOST timezone, so a
        # str(ts) comparison would break on non-UTC developer machines
        first = df.orderBy("event_id").select(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("s")
        ).first()
        assert first.s == "2023-11-14 22:13:20"  # exact nanos->micros wall clock
        assert df.count() == 10
        # and a micros file still reads fine in the same session
        micros = load_table(spark, "/root/testdata/sf0.001", "events")
        assert dict(micros.dtypes)["ts"] == "timestamp"
    finally:
        # the fallback legitimately leaves the conf set; don't let that
        # state leak into unrelated tests
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")


def test_parquet_schema_evolution_merges_and_backfills_null(spark, tmp_path):
    from cc_mapreducer_spark.sources.formats import read_parquet_evolved

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        path
    )
    spark.createDataFrame(
        [(2, "b", 0.5)], "id long, name string, score double"
    ).write.mode("append").parquet(path)
    df = read_parquet_evolved(spark, path)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r["id"]: (r["name"], r["score"]) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 0.5)}


def test_tolerant_read_skips_corrupt_file(spark, tmp_path):
    from pyspark.errors.exceptions.captured import AnalysisException  # noqa: F401

    from cc_mapreducer_spark.sources.formats import read_parquet_tolerant

    path = str(tmp_path / "damaged")
    spark.createDataFrame([(i,) for i in range(100)], "id long").coalesce(
        1
    ).write.parquet(path)
    # plant a corrupt member alongside the good file
    with open(f"{path}/part-corrupt.parquet", "wb") as f:
        f.write(b"PAR1 this is not a real parquet file")

    import pytest

    with pytest.raises(Exception):
        spark.read.parquet(path).count()  # fail-fast default dies
    got = read_parquet_tolerant(spark, path)
    assert got.count() == 100  # good file survives, corrupt one skipped
    # the option is reader-scoped: the session default is untouched
    assert (
        spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
        == "false"
    )
