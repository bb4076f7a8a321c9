"""C4 cleaning battery (operators/c4_filters.py): rule-by-rule
decisions on handcrafted pages, verdict precedence, fixture-class
coverage, and funnel-vs-docs conservation."""

from __future__ import annotations

from cc_mapreducer_spark.operators.c4_filters import (
    MIN_LINES_PER_PAGE,
    c4_clean,
    c4_filter_funnel,
    c4_line_filter_stats,
)

SF_ORACLE = "/root/testdata/sf0.01"

GOOD = [
    "the quick brown fox jumps over the lazy dog.",
    "a second proper sentence with enough words here!",
    'he said the last line was "done and dusted."',
]


def _clean_one(spark, page: str):
    df = spark.createDataFrame(
        [(1, "s", page)], "doc_id long, source string, page_text string"
    )
    return c4_clean(df).collect()[0]


def test_line_rules(spark):
    page = "\n".join(
        GOOD
        + [
            "no terminal punctuation on this line here",   # rule (a)
            "too few words.",                               # rule (b)
            "please enable javascript to continue reading this page.",
            "   ",                                          # blank-ish
        ]
    )
    row = _clean_one(spark, page)
    assert row.verdict == "ok"
    assert row.n_kept_lines == 3
    assert row.kept_text == "\n".join(GOOD)
    assert row.n_lines == 6  # blank line not counted


def test_page_rules_and_precedence(spark):
    base = "\n".join(GOOD)
    assert _clean_one(spark, base + "\nx = { }").verdict == "curly_brace"
    assert (
        _clean_one(spark, base + "\nlorem ipsum dolor.").verdict
        == "lorem_ipsum"
    )
    assert _clean_one(spark, base + "\nbadword2 here.").verdict == "bad_words"
    # precedence: bad_words wins over every other trigger
    dirty = base + "\nbadword1 lorem ipsum { }"
    assert _clean_one(spark, dirty).verdict == "bad_words"
    # lorem_ipsum beats curly_brace
    assert (
        _clean_one(spark, base + "\nlorem ipsum { }").verdict == "lorem_ipsum"
    )


def test_too_few_lines(spark):
    row = _clean_one(spark, "\n".join(GOOD[: MIN_LINES_PER_PAGE - 1]))
    assert row.verdict == "too_few_lines"
    assert row.n_kept_lines == MIN_LINES_PER_PAGE - 1


def test_fixture_exercises_every_verdict(spark):
    got = c4_line_filter_stats(spark, SF_ORACLE).toPandas()
    verdicts = set(got["verdict"])
    assert {"ok", "bad_words", "lorem_ipsum", "curly_brace"} <= verdicts
    # clean pages keep exactly the three planted good lines
    ok = got[got.verdict == "ok"]
    assert (ok["n_kept_lines"] == 3).all()
    # precedence on overlapping residues: 17*19 = 323 (if present)
    both = got[got.doc_id % (17 * 19) == 0]
    assert (both["verdict"] == "bad_words").all()


def test_funnel_conserves_documents(spark):
    stats = c4_line_filter_stats(spark, SF_ORACLE).toPandas()
    funnel = c4_filter_funnel(spark, SF_ORACLE).toPandas()
    assert funnel["n_docs"].sum() == len(stats)
    assert funnel["lines_kept"].sum() == stats["n_kept_lines"].sum()
    # dropped pages ship zero chars
    dropped = funnel[funnel.verdict != "ok"]
    assert (dropped["chars_out"] == 0).all()
