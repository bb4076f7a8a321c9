"""Right-to-be-forgotten erasure: snapshot-versioned and partitioned
paths, time-travel semantics before vacuum, byte-identity of untouched
partitions, and the audit report."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from cc_mapreducer_spark.plans.governance import (
    erasure_audit,
    forget_keys_partitioned,
    forget_keys_snapshot,
)
from cc_mapreducer_spark.plans.snapshots import read_snapshot, vacuum


def _users(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("user_id"),
        (F.col("id") * 10).cast("double").alias("balance"),
        F.concat(F.lit("u"), F.col("id")).alias("name"),
    )


def _dir_state(path):
    """(relpath, sha256) of every file under path — byte-level identity."""
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, path)] = hashlib.sha256(fh.read()).hexdigest()
    return out


def test_forget_snapshot_versions_and_vacuum(spark, tmp_path):
    tdir = str(tmp_path / "users_tbl")
    from cc_mapreducer_spark.plans.snapshots import write_snapshot

    write_snapshot(_users(spark), tdir)
    report = forget_keys_snapshot(spark, tdir, "user_id", [3, 7, 999])
    assert report["rows_removed"] == 2  # 999 never existed
    assert report["version"] == 1
    assert report["erasure_pending_vacuum"] is True

    cur = read_snapshot(spark, tdir)
    assert cur.count() == 98
    assert cur.filter(F.col("user_id").isin(3, 7)).count() == 0
    # time travel still sees the data (that is the point of versions)...
    old = read_snapshot(spark, tdir, 0)
    assert old.filter(F.col("user_id").isin(3, 7)).count() == 2
    # ...and vacuum completes the physical erasure
    removed = vacuum(tdir, keep_last=1)
    assert removed == [0]
    assert not os.path.isdir(os.path.join(tdir, "v=0"))


def test_forget_partitioned_swaps_only_touched(spark, tmp_path):
    base = str(tmp_path / "events_tbl")
    ev = spark.range(400).select(
        F.col("id").alias("user_id"),
        F.pmod("id", 8).cast("int").alias("kb"),
        (F.col("id") % 5).cast("double").alias("value"),
    )
    ev.repartition("kb").write.partitionBy("kb").parquet(base)

    # keys 11 and 19 both live in kb = pmod(k, 8) = 3; kb=5 is untouched
    before_untouched = _dir_state(os.path.join(base, "kb=5"))
    report = forget_keys_partitioned(
        spark, base, "user_id", [11, 19], "kb", lambda c: F.pmod(c, 8)
    )
    assert report["partitions_touched"] == ["3"]
    after_untouched = _dir_state(os.path.join(base, "kb=5"))
    assert before_untouched == after_untouched  # byte-identical

    got = spark.read.parquet(base)
    assert got.filter(F.col("user_id").isin(11, 19)).count() == 0
    assert got.count() == 398
    # every other row in the touched partition survived
    assert got.filter(F.col("kb") == 3).count() == 48


def test_forget_cascades_to_derived_minhash_index(spark, tmp_path):
    """Erasure must reach DERIVED artifacts: after forgetting doc_ids
    from the band index, an incremental probe can never surface them as
    candidates, and the audit over base + index reads zero."""
    from cc_mapreducer_spark.operators.incremental import (
        build_minhash_index,
        incremental_near_dups,
    )
    from cc_mapreducer_spark.plans.governance import forget_keys_parquet

    sf = "/root/testdata/sf0.01"
    idx = str(tmp_path / "mh_index")
    build_minhash_index(spark, sf, idx, max_doc_id=400)
    before = incremental_near_dups(spark, sf, idx, min_doc_id=400, threshold=0.2)
    targets = sorted({r.corpus_doc for r in before.collect()})[:3]
    assert targets, "probe found no candidates — test corpus changed?"

    report = forget_keys_parquet(spark, idx, "doc_id", targets)
    assert report["rows_removed"] > 0

    after = incremental_near_dups(spark, sf, idx, min_doc_id=400, threshold=0.2)
    assert not {r.corpus_doc for r in after.collect()} & set(targets)
    residual = (
        spark.read.parquet(idx)
        .filter(F.col("doc_id").isin([int(t) for t in targets]))
        .count()
    )
    assert residual == 0


def test_forget_snapshot_shows_in_diff(spark, tmp_path):
    """Composition with time travel: the erasure version diffs against
    its parent as pure deletions of exactly the forgotten keys."""
    from cc_mapreducer_spark.plans.snapshots import diff_snapshots, write_snapshot

    tdir = str(tmp_path / "users_tbl2")
    write_snapshot(_users(spark), tdir)
    forget_keys_snapshot(spark, tdir, "user_id", [5, 9])
    diff = diff_snapshots(spark, tdir, 0, 1, ["user_id"]).collect()
    assert {(r.user_id, r.change_type) for r in diff} == {
        (5, "deleted"),
        (9, "deleted"),
    }


def test_erasure_audit_reports_residuals(spark, tmp_path):
    clean = _users(spark).filter(~F.col("user_id").isin(3, 7))
    dirty = _users(spark)  # still contains the keys
    rep = {
        r.table: r.residual_rows
        for r in erasure_audit(
            spark, {"clean": clean, "dirty": dirty}, "user_id", [3, 7]
        ).collect()
    }
    assert rep == {"clean": 0, "dirty": 2}
