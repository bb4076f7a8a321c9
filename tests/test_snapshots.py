"""Versioned snapshots: time travel, atomic pointer, vacuum, keyed diff."""

from __future__ import annotations

import os

from cc_mapreducer_spark.plans.snapshots import (
    diff_snapshots,
    latest_version,
    read_manifest,
    read_snapshot,
    vacuum,
    write_snapshot,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_versions_accumulate_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert write_snapshot(_df(spark, [(1, "a"), (2, "b")]), t) == 0
    assert write_snapshot(_df(spark, [(1, "a2"), (3, "c")]), t) == 1
    assert latest_version(t) == 1
    # latest
    assert {r["k"]: r["v"] for r in read_snapshot(spark, t).collect()} == {
        1: "a2",
        3: "c",
    }
    # time travel: v0 unchanged by the v1 write
    assert {r["k"]: r["v"] for r in read_snapshot(spark, t, 0).collect()} == {
        1: "a",
        2: "b",
    }
    m = read_manifest(t, 1)
    assert m["parent"] == 0 and m["n_rows"] == 2 and m["n_files"] >= 1


def test_vacuum_drops_old_versions_only(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(4):
        write_snapshot(_df(spark, [(i, str(i))]), t)
    removed = vacuum(t, keep_last=2)
    assert removed == [0, 1]
    assert not os.path.isdir(os.path.join(t, "v=0"))
    # survivors still readable
    assert read_snapshot(spark, t, 2).count() == 1
    assert read_snapshot(spark, t, 3).count() == 1
    # vacuumed version fails loudly
    import pytest

    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, 0)


def test_diff_classifies_changes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    write_snapshot(_df(spark, [(2, "b"), (3, "c2"), (4, "d")]), t)
    diff = {
        r["k"]: r["change_type"]
        for r in diff_snapshots(spark, t, 0, 1, ["k"]).collect()
    }
    assert diff == {1: "deleted", 3: "changed", 4: "inserted"}  # 2 unchanged


def test_pointer_flip_is_atomic_no_partial_state(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_df(spark, [(1, "a")]), t)
    # simulate a crashed writer: data dir + manifest exist but the
    # pointer was never flipped -> readers still see the old version
    os.makedirs(os.path.join(t, "v=99"))
    with open(os.path.join(t, "_manifest_v99.json"), "w") as f:
        f.write("{}")
    assert latest_version(t) == 0
    assert read_snapshot(spark, t).count() == 1
