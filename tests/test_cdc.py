"""CDC operators: snapshot resolution, SCD2 history, COW merge.

Oracle parity for cdc_snapshot / scd2_history runs in
test_oracle_parity.py (registered pairs). Here: semantic pins on planted
changelogs, single-Exchange plan assertions, and the partition-pruned
merge's on-disk immutability guarantee."""

from __future__ import annotations

import os

from pyspark.sql import Row, functions as F

from cc_mapreducer_spark.operators.cdc import (
    cdc_snapshot,
    merge_into_partitioned,
    merge_upsert,
    scd2_history,
)
from cc_mapreducer_spark.plans.inspect import formatted_plan
from tests.conftest import SF_ORACLE


def test_cdc_snapshot_latest_wins_and_tombstones(spark):
    df = cdc_snapshot(spark, SF_ORACLE)
    pdf = df.toPandas()
    # snapshot grain: one row per surviving key
    assert not pdf.duplicated(subset=["user_id", "item_k"]).any()
    # tombstoned keys (latest op = delete) are absent entirely
    assert (pdf["last_event_type"] != "error").all()
    # n_versions counts ALL changelog entries for the key, not just upserts
    assert (pdf["n_versions"] >= 1).all()


def test_scd2_versions_partition_time_per_user(spark):
    pdf = scd2_history(spark, SF_ORACLE).toPandas()
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values("version")
        # versions are 1..n dense per user
        assert list(g["version"]) == list(range(1, len(g) + 1))
        # exactly one open (is_current) version: the last
        assert list(g["is_current"]) == [False] * (len(g) - 1) + [True]
        # each version closes exactly where the next opens (no gaps/overlap)
        assert list(g["valid_to"][:-1]) == list(g["valid_from"][1:])
        # consecutive versions change state (runs were maximal)
        states = list(g["state"])
        assert all(a != b for a, b in zip(states, states[1:]))


def test_scd2_single_exchange(spark):
    # lag window, run-id cumsum, (user_id, run_id) groupBy, and the
    # valid_to lead all reuse the user_id hash partitioning
    plan = formatted_plan(scd2_history(spark, SF_ORACLE))
    hash_exchanges = sum(
        1 for l in plan.splitlines() if "Arguments: hashpartitioning" in l
    )
    assert hash_exchanges == 1


def test_cdc_snapshot_single_exchange(spark):
    plan = formatted_plan(cdc_snapshot(spark, SF_ORACLE))
    hash_exchanges = sum(
        1 for l in plan.splitlines() if "Arguments: hashpartitioning" in l
    )
    assert hash_exchanges == 1


def _base_rows():
    return [
        Row(k=1, part="a", val="base1"),
        Row(k=2, part="a", val="base2"),
        Row(k=3, part="b", val="base3"),
        Row(k=4, part="c", val="base4"),
    ]


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(_base_rows())
    updates = spark.createDataFrame(
        [
            Row(k=2, part="a", val="upd2", _op="U"),   # update existing
            Row(k=5, part="b", val="new5", _op="U"),   # insert new
            Row(k=3, part="b", val=None, _op="D"),     # delete
        ]
    )
    got = {
        r["k"]: r["val"]
        for r in merge_upsert(base, updates, ["k"]).collect()
    }
    assert got == {1: "base1", 2: "upd2", 4: "base4", 5: "new5"}


def test_merge_into_partitioned_rewrites_only_touched(spark, tmp_path):
    path = str(tmp_path / "table")
    base = spark.createDataFrame(_base_rows())
    base.repartition("part").write.partitionBy("part").parquet(path)

    before = {
        f: os.stat(os.path.join(path, "part=c", f))
        for f in os.listdir(os.path.join(path, "part=c"))
        if f.endswith(".parquet")
    }
    updates = spark.createDataFrame(
        [
            Row(k=2, part="a", val="upd2", _op="U"),
            Row(k=3, part="b", val=None, _op="D"),
        ]
    )
    touched = merge_into_partitioned(spark, path, updates, ["k"], "part")
    assert sorted(touched) == ["a", "b"]

    # untouched partition: same files, byte-identical, never rewritten
    after = {
        f: os.stat(os.path.join(path, "part=c", f))
        for f in os.listdir(os.path.join(path, "part=c"))
        if f.endswith(".parquet")
    }
    assert before.keys() == after.keys()
    for f in before:
        assert before[f].st_mtime_ns == after[f].st_mtime_ns
        assert before[f].st_size == after[f].st_size

    got = {
        r["k"]: (r["part"], r["val"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        1: ("a", "base1"),
        2: ("a", "upd2"),
        4: ("c", "base4"),
    }


def test_merge_base_scan_prunes_partitions(spark, tmp_path):
    # the IN-filter on the partition column must prune at planning time:
    # the merge's base read over a 3-partition table with 2 touched
    # partitions shows PartitionFilters with the isin predicate
    path = str(tmp_path / "table2")
    spark.createDataFrame(_base_rows()).write.partitionBy("part").parquet(path)
    pruned = spark.read.parquet(path).filter(F.col("part").isin(["a", "b"]))
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan and "part#" in plan
    scan = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert " IN " in scan or "in(part" in scan


def test_point_in_time_every_purchase_matches_one_version(spark):
    from cc_mapreducer_spark.operators.cdc import scd2_point_in_time

    pit = scd2_point_in_time(spark, SF_ORACLE).toPandas()
    n_purchases = (
        spark.read.parquet(f"{SF_ORACLE}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    # exactly one state version valid at each purchase timestamp
    assert len(pit) == n_purchases
    assert not pit.duplicated(subset=["event_id"]).any()
    # the version valid at a purchase is a 'purchase' run by construction
    # (the purchase event itself opens or extends that run)
    assert (pit["state_at_purchase"] == "purchase").all()


def test_point_in_time_does_not_leak_future_state(spark, tmp_path):
    from cc_mapreducer_spark.operators.cdc import scd2_point_in_time

    # user history: purchase at t1, then a LATER state change at t2 —
    # the purchase must join to the t1 version, never the future one
    rows = [
        (1, "2024-01-01 00:00:00", 5, "purchase", 1.0, '{"k": 1}'),
        (2, "2024-01-01 01:00:00", 5, "error", 0.0, '{"k": 1}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(f"{tmp_path}/events.parquet")
    pit = scd2_point_in_time(spark, str(tmp_path)).collect()
    assert len(pit) == 1
    assert pit[0]["state_at_purchase"] == "purchase"
    assert pit[0]["state_version"] == 1  # not the later 'error' version


def test_point_in_time_timestamp_tie_binds_to_own_run(spark, tmp_path):
    from cc_mapreducer_spark.operators.cdc import scd2_point_in_time

    # purchase and a different-type event at the SAME microsecond: the
    # composite (ts, event_id) boundary must bind the purchase to its
    # own run, not the next one (the ts-only interval-join failure mode)
    rows = [
        (1, "2024-01-01 00:00:00", 5, "purchase", 1.0, '{"k": 1}'),
        (2, "2024-01-01 00:00:00", 5, "error", 0.0, '{"k": 1}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(f"{tmp_path}/events.parquet")
    pit = scd2_point_in_time(spark, str(tmp_path)).collect()
    assert len(pit) == 1
    assert pit[0]["state_at_purchase"] == "purchase"
    assert pit[0]["state_version"] == 1


def test_partition_value_escaping_matches_spark(spark, tmp_path):
    # ADVICE r3: the swap composed dir names with a raw f-string, which
    # diverges from Spark's Hive-escaped naming for values with reserved
    # chars (and NULL) — the swap then silently no-oped and the staged
    # merge was discarded. The helper must reproduce Spark's naming
    # exactly; pin it against what Spark ACTUALLY writes.
    import os

    from cc_mapreducer_spark.operators.cdc import escape_partition_value

    values = ["plain", "a/b", "x:y", "p=q", "100%", "a b"]
    df = spark.createDataFrame(
        [Row(k=i, part=v, val=f"v{i}") for i, v in enumerate(values)]
    )
    path = str(tmp_path / "esc")
    df.write.partitionBy("part").parquet(path)
    written = {d for d in os.listdir(path) if d.startswith("part=")}
    assert written == {f"part={escape_partition_value(v)}" for v in values}


def test_merge_into_partitioned_escaped_and_null_partitions(spark, tmp_path):
    # end-to-end: a merge touching a reserved-char partition AND a NULL
    # partition must actually land (r3's raw naming silently dropped
    # both: the swap missed the escaped dir, and isin() missed NULL rows)
    path = str(tmp_path / "esc_merge")
    base = spark.createDataFrame(
        [
            Row(k=1, part="a/b", val="base1"),
            Row(k=2, part=None, val="base2"),
            Row(k=3, part="keep", val="base3"),
        ]
    )
    base.write.partitionBy("part").parquet(path)
    updates = spark.createDataFrame(
        [
            Row(k=1, part="a/b", val="upd1", _op="U"),
            Row(k=2, part=None, val="upd2", _op="U"),
        ]
    )
    touched = merge_into_partitioned(spark, path, updates, ["k"], "part")
    assert len(touched) == 2
    got = {r["k"]: (r["part"], r["val"]) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("a/b", "upd1"),
        2: (None, "upd2"),
        3: ("keep", "base3"),
    }


# --------------------------------------------------------------------------
# Journaled swap: crash-safety (VERDICT r4 item 4)
# --------------------------------------------------------------------------

def _crash_updates(spark):
    return spark.createDataFrame(
        [
            Row(k=2, part="a", val="upd2", _op="U"),
            Row(k=3, part="b", val=None, _op="D"),  # empties partition b
            Row(k=5, part="b", val="new5", _op="U"),
        ]
    )


_MERGED_STATE = {
    1: ("a", "base1"),
    2: ("a", "upd2"),
    4: ("c", "base4"),
    5: ("b", "new5"),
}


def test_swap_crash_mid_loop_rolls_forward(spark, tmp_path, monkeypatch):
    """Kill the swap after the FIRST partition moved: the table is mixed
    on disk for an instant, but journal + staging survive the crash and
    recover_interrupted_swap rolls it forward to the all-new state —
    never a mixed result visible to the next reader."""
    import shutil as shutil_mod

    import pytest

    from cc_mapreducer_spark.operators import cdc

    path = str(tmp_path / "table")
    spark.createDataFrame(_base_rows()).write.partitionBy("part").parquet(path)

    real_move = shutil_mod.move
    moved = []

    def crash_after_first(src, dst):
        real_move(src, dst)
        moved.append(src)
        raise RuntimeError("simulated crash mid-swap")

    monkeypatch.setattr(shutil_mod, "move", crash_after_first)
    with pytest.raises(RuntimeError, match="simulated crash"):
        merge_into_partitioned(spark, path, _crash_updates(spark), ["k"], "part")
    monkeypatch.setattr(shutil_mod, "move", real_move)
    assert moved  # the crash really happened mid-loop, not before it

    # journal + staging survived the crash (the old finally-rmtree would
    # have destroyed the staged data recovery needs)
    journals = [e for e in os.listdir(path) if e.startswith("_swap_journal_")]
    assert len(journals) == 1
    stagings = [
        e
        for e in os.listdir(tmp_path)
        if e.startswith("table_merge_") and (tmp_path / e).is_dir()
    ]
    assert len(stagings) == 1

    acted = cdc.recover_interrupted_swap(path)
    assert acted
    got = {r["k"]: (r["part"], r["val"]) for r in spark.read.parquet(path).collect()}
    assert got == _MERGED_STATE
    assert not [e for e in os.listdir(path) if e.startswith("_swap_journal_")]
    assert not [e for e in os.listdir(tmp_path) if e.startswith("table_merge_")]


def test_swap_crash_next_merge_self_heals(spark, tmp_path, monkeypatch):
    """The production path: nobody calls recover explicitly — the NEXT
    merge does, before touching the table, so an interrupted commit and
    a follow-up batch compose to the correct final state."""
    import shutil as shutil_mod

    import pytest

    path = str(tmp_path / "table")
    spark.createDataFrame(_base_rows()).write.partitionBy("part").parquet(path)

    real_move = shutil_mod.move

    def crash_before_any(src, dst):
        raise RuntimeError("simulated crash before first move")

    monkeypatch.setattr(shutil_mod, "move", crash_before_any)
    with pytest.raises(RuntimeError, match="simulated crash"):
        merge_into_partitioned(spark, path, _crash_updates(spark), ["k"], "part")
    monkeypatch.setattr(shutil_mod, "move", real_move)

    # second batch: self-heals the first merge, then applies its own
    updates2 = spark.createDataFrame([Row(k=4, part="c", val="upd4", _op="U")])
    merge_into_partitioned(spark, path, updates2, ["k"], "part")
    got = {r["k"]: (r["part"], r["val"]) for r in spark.read.parquet(path).collect()}
    assert got == {**_MERGED_STATE, 4: ("c", "upd4")}


def test_swap_crash_before_journal_keeps_old_state(spark, tmp_path):
    """A crash before the journal publishes (orphan staging, no journal)
    must recover to the intact OLD state and garbage-collect the stage."""
    from cc_mapreducer_spark.operators import cdc

    path = str(tmp_path / "table")
    spark.createDataFrame(_base_rows()).write.partitionBy("part").parquet(path)
    before = {r["k"]: (r["part"], r["val"]) for r in spark.read.parquet(path).collect()}

    orphan = tmp_path / "table_merge_deadbeef"
    (orphan / "part=a").mkdir(parents=True)
    (orphan / "part=a" / "junk.parquet").write_text("not real data")

    acted = cdc.recover_interrupted_swap(path)
    assert str(orphan) in acted
    assert not orphan.exists()
    got = {r["k"]: (r["part"], r["val"]) for r in spark.read.parquet(path).collect()}
    assert got == before
