"""Sitemap ingestion (operators/sitemap.py): build/parse round trip,
the protocol's 50k-per-file slicing (exercised with a small cap), the
index-must-name-every-file join guard, and the freshness rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.sitemap import (
    build_sitemap_files,
    build_sitemap_index,
    parse_sitemap_files,
    parse_sitemap_index,
    sitemap_recrawl_schedule,
)

SF_ORACLE = "/root/testdata/sf0.01"


def _urls(spark, n=7, host="a.example.com"):
    rows = [
        (
            i,
            host,
            f"https://{host}/page-{i}/",
            f"2026-07-{i + 1:02d}",
            "weekly",
            "0.5",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, host string, loc string, lastmod string, "
        "changefreq string, priority string",
    )


def test_roundtrip_and_protocol_slicing(spark):
    files = build_sitemap_files(_urls(spark, n=7), urls_per_file=3)
    got = {(r.host, r.file_no) for r in files.collect()}
    assert got == {("a.example.com", 0), ("a.example.com", 1),
                   ("a.example.com", 2)}  # ceil(7/3) files
    parsed = parse_sitemap_files(files).collect()
    assert len(parsed) == 7
    by_loc = {r.loc: r for r in parsed}
    r3 = by_loc["https://a.example.com/page-3/"]
    assert r3.lastmod == "2026-07-04"
    assert r3.file_no == 1  # doc order: rows 3..5 land in slice 1
    # every parsed field round-trips verbatim
    assert all(r.changefreq == "weekly" and r.priority == "0.5"
               for r in parsed)


def test_index_names_every_file(spark):
    files = build_sitemap_files(_urls(spark, n=7), urls_per_file=3)
    index = build_sitemap_index(files)
    locs = sorted(r.sitemap_loc for r in parse_sitemap_index(index).collect())
    assert locs == [
        "https://a.example.com/sitemap-0.xml",
        "https://a.example.com/sitemap-1.xml",
        "https://a.example.com/sitemap-2.xml",
    ]
    # the verification join is what a forgotten file would fail: drop
    # one index entry and the joined row set loses that file's URLs
    listed = parse_sitemap_index(index).select(
        F.regexp_extract("sitemap_loc", r"https://([^/]*)/sitemap-", 1)
        .alias("host"),
        F.regexp_extract("sitemap_loc", r"sitemap-(\d+)\.xml", 1)
        .cast("long")
        .alias("file_no"),
    ).filter(F.col("file_no") != 1)
    joined = parse_sitemap_files(files).join(listed, ["host", "file_no"])
    assert joined.count() == 4  # 7 URLs minus slice 1's three


def test_file_bytes_accounting(spark):
    files = build_sitemap_files(_urls(spark, n=2), urls_per_file=10)
    row = files.collect()[0]
    parsed = parse_sitemap_files(files).collect()
    assert all(r.file_bytes == len(row.xml) for r in parsed)


def test_freshness_rule_and_priority_order(spark):
    df = sitemap_recrawl_schedule(spark, SF_ORACLE).toPandas()
    # daily pages are always due, regardless of dates
    daily = df[df.changefreq == "daily"]
    assert daily["is_due"].all()
    # stale-fetch pages are due; fresh-fetch non-daily pages are not
    non_daily = df[df.changefreq != "daily"]
    assert (
        (non_daily["lastmod"] >= non_daily["last_fetch"])
        == non_daily["is_due"]
    ).all()
    # within a domain, due slots are dense from 0 and ordered by
    # priority desc then doc_id
    for _, g in df[df.is_due].groupby("domain"):
        g = g.sort_values("slot")
        assert list(g["slot"]) == list(range(len(g)))
        keys = list(zip(g["priority"], -g["doc_id"]))
        assert keys == sorted(keys, key=lambda t: (t[0], t[1]), reverse=True)
    # undue pages carry no slot
    assert df[~df.is_due]["slot"].isna().all()
