"""Z-order layout (operators/zorder.py): Morton-code correctness
against a pure-python bit-interleave, 16-bit dim bounds, the pruning
report's required outcomes (Z-order wins the box, concedes the
slice), and REAL parquet footers: zorder_write's files must let a
footer-stats reader skip more files on the box predicate than the
date-sorted layout's files."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.zorder import (
    BOX_CK,
    BOX_DAY,
    linear_write,
    order_layouts,
    z_value_sql,
    zorder_pruning_report,
    zorder_write,
)

SF_ORACLE = "/root/testdata/sf0.01"


def _py_morton(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_python_interleave(spark):
    rows = spark.range(1).select(
        *[
            F.expr(z_value_sql(str(a), str(b), "spark")).alias(f"z{i}")
            for i, (a, b) in enumerate(
                [(0, 0), (1, 0), (0, 1), (65535, 65535), (1234, 4321)]
            )
        ]
    ).collect()[0]
    exp = [
        _py_morton(a, b)
        for (a, b) in [(0, 0), (1, 0), (0, 1), (65535, 65535), (1234, 4321)]
    ]
    assert [rows[f"z{i}"] for i in range(5)] == exp


def test_dims_fit_sixteen_bits(spark):
    df = order_layouts(spark, SF_ORACLE).agg(
        F.max("ck").alias("mck"), F.max("day").alias("mday")
    ).collect()[0]
    assert df.mck < 1 << 16 and df.mday < 1 << 16


def test_pruning_report_outcomes(spark):
    rep = {
        (r.layout, r.query): r
        for r in zorder_pruning_report(spark, SF_ORACLE).collect()
    }
    box_z = rep[("zorder", "box_ck_x_day")]
    box_l = rep[("linear", "box_ck_x_day")]
    # the win: the 2-D box scans strictly fewer partitions under Z-order
    assert box_z.n_scanned < box_l.n_scanned
    # the tradeoff: the pure time slice favors (or ties) the date sort
    slice_z = rep[("zorder", "slice_day_only")]
    slice_l = rep[("linear", "slice_day_only")]
    assert slice_l.n_scanned <= slice_z.n_scanned
    assert box_z.n_partitions == box_l.n_partitions


def _file_stats(path, ck_col, day_expr_idx):
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins = {"ck": None, "day": None}
        maxs = {"ck": None, "day": None}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                if name in ("ck", "day"):
                    st = col.statistics
                    lo, hi = st.min, st.max
                    mins[name] = lo if mins[name] is None else min(mins[name], lo)
                    maxs[name] = hi if maxs[name] is None else max(maxs[name], hi)
        out.append((mins["ck"], maxs["ck"], mins["day"], maxs["day"]))
    return out


def test_real_footer_stats_prune_more_files(spark, tmp_path):
    base = order_layouts(spark, SF_ORACLE).select("o_orderkey", "ck", "day")
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_write(base, zpath, "ck", "day", n_files=16)
    # date-sorted baseline through the same deterministic writer
    # mechanics (repartitionByRange's sampled boundaries made this
    # test's margin drift run to run — r8 verdict item 4)
    linear_write(base, lpath, "day", n_files=16)

    def scanned(path):
        n = 0
        for lo_ck, hi_ck, lo_d, hi_d in _file_stats(path, "ck", "day"):
            if (
                hi_ck >= BOX_CK[0]
                and lo_ck <= BOX_CK[1]
                and hi_d >= BOX_DAY[0]
                and lo_d <= BOX_DAY[1]
            ):
                n += 1
        return n

    assert scanned(zpath) < scanned(lpath)
