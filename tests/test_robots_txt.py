"""robots.txt text parsing (operators/robots_txt.py): line grammar
edge cases, directive extraction, and the parsed-gate-equals-
structured-gate guarantee (shared oracle, checked directly here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.robots_txt import (
    parse_robots_txt,
    robots_txt_gate,
)

SF_ORACLE = "/root/testdata/sf0.01"


def _parse_one(spark, txt: str):
    df = spark.createDataFrame([(txt,)], "robots_txt string")
    return parse_robots_txt(df).collect()[0]


def test_line_grammar(spark):
    txt = (
        "# a comment line\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "\n"
        "Allow: /private/press/\n"
        "Disallow:\n"              # empty path = allow everything: NO rule
        "Noise: /not-a-rule\n"
        "Crawl-delay: 7\n"
        "Sitemap: https://ex.com/sitemap-0.xml\n"
    )
    row = _parse_one(spark, txt)
    rules = [(r["prefix"], r["allow"]) for r in row.rules]
    assert rules == [("/private/", False), ("/private/press/", True)]
    assert row.sitemap_url == "https://ex.com/sitemap-0.xml"
    assert row.crawl_delay == 7


def test_no_directives(spark):
    row = _parse_one(spark, "User-agent: *\nDisallow: /x\n")
    assert row.sitemap_url == ""
    assert row.crawl_delay is None
    assert [(r["prefix"], r["allow"]) for r in row.rules] == [("/x", False)]


def test_parsed_gate_equals_structured_gate(spark):
    """The shared-oracle claim, checked engine-side: the gate fed from
    parsed text and the gate fed from structured rules agree on every
    verdict and every winning rule."""
    from cc_mapreducer_spark.operators.acquisition import (
        robots_policy_filter,
    )

    a = robots_txt_gate(spark, SF_ORACLE).toPandas()
    b = robots_policy_filter(spark, SF_ORACLE).toPandas()
    cols = sorted(a.columns)
    sa = sorted(map(tuple, a[cols].astype(str).values.tolist()))
    sb = sorted(map(tuple, b[cols].astype(str).values.tolist()))
    assert sa == sb
    # and the fixture actually exercises both verdicts
    assert (~a["robots_allowed"]).any() and a["robots_allowed"].any()
