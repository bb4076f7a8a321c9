#!/usr/bin/env python3
"""Three-SF driver-roster parity sweep: run every DRIVER key's Spark
query and DuckDB oracle at each SF and compare rows/schema/values —
the local superset of the driver's sf0.01 CORRECTNESS gate, catching
fixture assumptions that only hold at one scale.

Usage: python scripts/sweep_sf.py [sf_dir ...]   (default: all three)
Prints one line per (sf, key) failure and a final summary line.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

from cc_mapreducer_spark import registry  # noqa: E402
from cc_mapreducer_spark.session import get_spark  # noqa: E402
from tests.oracle import compare_frames, duckdb_connection  # noqa: E402


def main() -> None:
    sfs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("sweep-sf")
    queries = registry.driver_queries()
    oracles = registry.driver_oracles()
    failures = []
    n_checked = 0
    for sf in sfs:
        con = duckdb_connection(sf)
        for name in sorted(oracles):
            try:
                spdf = queries[name](spark, sf).toPandas()
                odf = con.sql(oracles[name]).df()
                compare_frames(spdf, odf, f"{sf}:{name}")
                n_checked += 1
            except AssertionError as e:
                failures.append(f"{sf} {name}: {str(e)[:200]}")
                print(f"FAIL {sf} {name}: {str(e)[:200]}", flush=True)
            except Exception as e:
                failures.append(f"{sf} {name}: ERR {str(e)[:200]}")
                print(f"ERR  {sf} {name}: {str(e)[:200]}", flush=True)
        con.close()
        print(f"done {sf}", flush=True)
    print(
        f"SWEEP {'PASS' if not failures else 'FAIL'}: "
        f"{n_checked} pairs checked, {len(failures)} failures"
    )
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
