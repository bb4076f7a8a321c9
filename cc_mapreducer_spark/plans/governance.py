"""Right-to-be-forgotten (GDPR/CCPA-style) key erasure across the
engine's storage layouts, plus the audit that proves it happened.

Deletion in an immutable-files world is a REWRITE, so the operators
here are shaped around touching as little as possible:

  * ``forget_keys_snapshot`` — for snapshot-versioned tables
    (plans/snapshots.py): writes a NEW version with the keys
    anti-joined out. Older versions still contain the data (that is
    what time travel means) — physical erasure completes when
    ``vacuum`` drops them; the returned report says so explicitly.
  * ``forget_keys_partitioned`` — for hive-partitioned tables whose
    partition value is DERIVABLE from the key (the common layout:
    bucket = pmod(user_id, N)): computes the touched partitions from
    the key list alone — NO scan of the table — and routes a
    delete-op batch through the CDC stage-and-swap merge, so
    untouched partitions are never read or rewritten.
  * ``forget_keys_parquet`` — for DERIVED artifacts (LSH/band indexes,
    code tables, feature extracts): they carry the key too, and an
    erasure that only touches primary tables silently leaks through
    them. Copy-on-write stage-and-swap of the whole artifact.
  * ``erasure_audit`` — per-table residual row counts for the keys;
    all zeros = the erasure actually took. Run it AFTER vacuum for
    snapshot tables, and include the derived artifacts.

Scale notes (100 TB):
  * forget requests are batched by design (the API takes a key LIST):
    the per-request cost of a rewrite amortizes across the batch —
    run erasure on a cadence (daily/weekly), not per request.
  * the snapshot path is one broadcast LEFT ANTI join over the
    current version — a single scan+write, no shuffle of the table.
  * the partitioned path reads only ceil(|keys|) partitions out of N;
    the swap leaves every other partition byte-identical on disk
    (tested). Object-store deployments run the same shape through the
    table format's commit protocol.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.operators.cdc import merge_into_partitioned
from cc_mapreducer_spark.plans.snapshots import read_snapshot, write_snapshot


def forget_keys_snapshot(
    spark: SparkSession, table_dir: str, key_col: str, keys: list
) -> dict:
    """Erase ``keys`` from a snapshot-versioned table by writing a new
    version without them. Returns a report dict; note
    ``erasure_pending_vacuum``: prior versions still hold the rows
    until ``snapshots.vacuum`` removes them."""
    cur = read_snapshot(spark, table_dir)
    kdf = spark.createDataFrame([(k,) for k in keys], f"{key_col}: {_key_ddl(cur, key_col)}")
    # one pass computes both counts: rows to remove are flagged, then
    # the kept subset is written — the table is scanned once for the
    # count and once for the write (the write cannot share the count's
    # action), never once per key
    n_removed = cur.join(F.broadcast(kdf), key_col, "left_semi").count()
    kept = cur.join(F.broadcast(kdf), key_col, "left_anti")
    version = write_snapshot(kept, table_dir)
    return {
        "version": version,
        "rows_removed": n_removed,
        "keys_requested": len(keys),
        "erasure_pending_vacuum": True,
    }


def _key_ddl(df: DataFrame, key_col: str) -> str:
    return [f.dataType.simpleString() for f in df.schema.fields if f.name == key_col][0]


def forget_keys_partitioned(
    spark: SparkSession,
    base_path: str,
    key_col: str,
    keys: list,
    partition_col: str,
    partition_of: Callable[[F.Column], F.Column],
) -> dict:
    """Erase ``keys`` from a hive-partitioned table whose partition
    value is a pure function of the key (``partition_of`` must be the
    SAME expression the writer used, e.g.
    ``lambda c: F.pmod(c, 8)``). The touched-partition set derives
    from the keys alone; the rewrite goes through the CDC
    stage-and-swap merge, so only those partitions are read or
    replaced. Physical erasure is immediate (no versions retained)."""
    schema = spark.read.parquet(base_path).schema
    kdf = spark.createDataFrame(
        [(k,) for k in keys], f"{key_col}: {schema[key_col].dataType.simpleString()}"
    )
    deletes = kdf.select(
        *[
            F.col(key_col).alias(f.name)
            if f.name == key_col
            else (
                partition_of(F.col(key_col)).cast(f.dataType).alias(f.name)
                if f.name == partition_col
                else F.lit(None).cast(f.dataType).alias(f.name)
            )
            for f in schema.fields
        ],
        F.lit("D").alias("_op"),
    )
    touched = merge_into_partitioned(
        spark, base_path, deletes, [key_col], partition_col
    )
    return {
        "partitions_touched": sorted(map(str, touched)),
        "keys_requested": len(keys),
        "erasure_pending_vacuum": False,
    }


def forget_keys_parquet(
    spark: SparkSession, path: str, key_col: str, keys: list
) -> dict:
    """Erase ``keys`` from a plain (unversioned, unpartitioned) parquet
    artifact — the DERIVED-artifact leg of an erasure: LSH/band indexes,
    code tables, and feature extracts all carry the key too, and an
    erasure that only touches the primary tables silently leaks through
    them. Copy-on-write: the filtered rows stage to a sibling directory,
    then swap atomically-per-rename into place (read and write never
    overlap — overwriting the path being read races the lazy scan)."""
    import os
    import shutil
    import uuid

    cur = spark.read.parquet(path)
    kdf = spark.createDataFrame(
        [(k,) for k in keys], f"{key_col}: {_key_ddl(cur, key_col)}"
    )
    n_removed = cur.join(F.broadcast(kdf), key_col, "left_semi").count()
    kept = cur.join(F.broadcast(kdf), key_col, "left_anti")
    staging = f"{path.rstrip('/')}_forget_{uuid.uuid4().hex[:8]}"
    try:
        kept.write.parquet(staging)
        old = f"{path.rstrip('/')}_old_{uuid.uuid4().hex[:8]}"
        os.rename(path, old)
        try:
            os.rename(staging, path)
        except BaseException:
            # Roll the original back into place before re-raising: without
            # this, the finally-rmtree would delete the staged copy while
            # the original sits stranded at a random *_old_* name and the
            # table vanishes from `path` entirely.
            os.rename(old, path)
            raise
        shutil.rmtree(old)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return {
        "rows_removed": n_removed,
        "keys_requested": len(keys),
        "erasure_pending_vacuum": False,
    }


def erasure_audit(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    key_col: str,
    keys: list,
) -> DataFrame:
    """(table, residual_rows) for every table: the proof-of-erasure
    report. residual_rows must be 0 everywhere; a non-zero row names
    exactly where forgotten keys still live."""
    first = next(iter(tables.values()))
    kdf = spark.createDataFrame(
        [(k,) for k in keys], f"{key_col}: {_key_ddl(first, key_col)}"
    )
    parts = [
        df.join(F.broadcast(kdf), key_col, "left_semi")
        .agg(F.count("*").alias("residual_rows"))
        .select(F.lit(name).alias("table"), "residual_rows")
        for name, df in tables.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
