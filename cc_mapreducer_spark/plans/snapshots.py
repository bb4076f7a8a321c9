"""Versioned table snapshots with time travel — lakehouse-lite.

CDC merges (operators/cdc.py, streaming/cdc_sink.py) mutate tables in
place; reproducible training runs need the opposite guarantee: "the
exact corpus as of version N, forever". Delta/Iceberg solve this with
manifest-tracked immutable files; this is the same design reduced to
its load-bearing core, on plain parquet + JSON:

  * every write is a NEW immutable directory `v=N/` (never rewritten),
  * a manifest (`_manifest_vN.json`) records version, parent, row
    count, schema and the file list,
  * `_latest` is a one-line pointer file, atomically replaced (POSIX
    rename) — readers never observe a half-written version,
  * time travel = read the directory the requested manifest names,
  * `diff_snapshots` joins two versions on a key to emit
    inserted/deleted/changed rows — audit and incremental-consumer
    feed.

Scale notes: the manifest holds file-level metadata only (O(files), not
O(rows)); version directories share nothing, so retention is `rm -r` of
dirs no manifest references (vacuum). Snapshot reads are ordinary
pruned parquet scans — time travel costs nothing at query time.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"_manifest_v{version}.json")


def latest_version(table_dir: str) -> int | None:
    ptr = os.path.join(table_dir, "_latest")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip())


def write_snapshot(df: DataFrame, table_dir: str) -> int:
    """Write ``df`` as the next version of the table; returns the new
    version number. The data directory is immutable once the pointer
    flips; a crash before the flip leaves an unreferenced directory the
    next vacuum removes — never a corrupt table."""
    os.makedirs(table_dir, exist_ok=True)
    prev = latest_version(table_dir)
    version = 0 if prev is None else prev + 1
    data_dir = os.path.join(table_dir, f"v={version}")
    df.write.parquet(data_dir)
    files = sorted(
        f for f in os.listdir(data_dir) if f.endswith(".parquet")
    )
    n_rows = (
        df.sparkSession.read.parquet(data_dir).count()
    )  # count what landed, not what was planned
    manifest = {
        "version": version,
        "parent": prev,
        "n_rows": n_rows,
        "n_files": len(files),
        "files": files,
        "schema": df.schema.jsonValue(),
    }
    with open(_manifest_path(table_dir, version), "w") as f:
        json.dump(manifest, f)
    # atomic pointer flip: write-to-temp + rename is the POSIX idiom;
    # object stores swap this for a conditional put on the pointer key
    fd, tmp = tempfile.mkstemp(dir=table_dir, prefix="_latest_")
    with os.fdopen(fd, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(table_dir, "_latest"))
    return version


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a table at a version (default: latest). Validates the
    manifest exists — a dangling version number fails loudly."""
    if version is None:
        version = latest_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no snapshot in {table_dir}")
    if not os.path.exists(_manifest_path(table_dir, version)):
        raise FileNotFoundError(f"no manifest for version {version}")
    return spark.read.parquet(os.path.join(table_dir, f"v={version}"))


def read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Drop version directories older than the last ``keep_last``
    (never the pointer target). Returns the removed versions."""
    import shutil

    latest = latest_version(table_dir)
    if latest is None:
        return []
    removed = []
    for v in range(0, latest - keep_last + 1):
        data_dir = os.path.join(table_dir, f"v={v}")
        if os.path.isdir(data_dir) and v != latest:
            shutil.rmtree(data_dir)
            os.remove(_manifest_path(table_dir, v))
            removed.append(v)
    return removed


def diff_snapshots(
    spark: SparkSession,
    table_dir: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
) -> DataFrame:
    """Row-level diff between two versions keyed on ``key_cols``:
    one row per changed key with change_type in
    {'inserted', 'deleted', 'changed'}, old/new non-key values as JSON
    strings. A FULL OUTER join on the key — shuffles both sides on the
    key once, the minimum any keyed diff costs."""
    old = read_snapshot(spark, table_dir, v_from)
    new = read_snapshot(spark, table_dir, v_to)
    val_cols = [c for c in old.columns if c not in key_cols]
    o = old.select(
        *key_cols,
        F.to_json(F.struct(*val_cols)).alias("old_vals"),
    )
    n = new.select(
        *key_cols,
        F.to_json(F.struct(*val_cols)).alias("new_vals"),
    )
    j = o.join(n, key_cols, "full_outer")
    return j.select(
        *key_cols,
        F.when(F.col("old_vals").isNull(), F.lit("inserted"))
        .when(F.col("new_vals").isNull(), F.lit("deleted"))
        .otherwise(F.lit("changed"))
        .alias("change_type"),
        "old_vals",
        "new_vals",
    ).filter(
        F.col("old_vals").isNull()
        | F.col("new_vals").isNull()
        | (F.col("old_vals") != F.col("new_vals"))
    )
