"""Main-content extraction (operators/extraction.py): the block
classifier's decisions on handcrafted pages, the planted-fixture
semantics (keep exactly the article paragraphs, reject the chrome),
oracle parity at sf0.01, and the no-Python-in-plan guarantee."""

from __future__ import annotations

import duckdb

from cc_mapreducer_spark.operators.extraction import (
    MIN_TEXT_CHARS,
    _MAIN_CONTENT_SQL,
    extract_main_content,
    main_content_extract,
)

SF_ORACLE = "/root/testdata/sf0.01"

ARTICLE = (
    "The quick brown fox jumps over the lazy dog while the band plays on."
)


def _page(*blocks: str) -> str:
    return "\n".join(blocks)


def test_classifier_decisions(spark):
    page = _page(
        "<html><head><title>T</title></head>",           # short -> dropped
        "<body>",                                          # empty
        '<nav><a href="/a">alpha section</a> '
        '<a href="/b">beta section</a> '
        '<a href="/c">gamma section</a></nav>',            # link-dense
        f"<p>{ARTICLE}</p>",                               # content
        '<footer>site <a href="/t">Terms of use</a> '
        '<a href="/p">Privacy policy</a></footer>',        # link-dense
        "</body></html>",                                  # empty
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, page string")
    row = extract_main_content(df).collect()[0]
    assert row.main_text == ARTICLE
    assert row.n_content_blocks == 1
    # title, nav, article, footer have visible text; body tags do not
    assert row.n_blocks == 4
    assert row.content_chars == len(ARTICLE)
    assert row.boiler_chars > 0


def test_density_rule_is_integer_exact(spark):
    # text_len 30, link text exactly 10 chars: 3*10 == 30 is NOT < 30,
    # so the block is boilerplate — the boundary case both engines must
    # agree on (this is why the rule is integer, not a 0.333 float)
    filler = "x" * 19  # 19 + space + 10 = 30 visible chars
    block = f'<div>{filler} <a href="/">{"y" * 10}</a></div>'
    long_enough = f"<p>{'z' * MIN_TEXT_CHARS}</p>"
    df = spark.createDataFrame(
        [(1, _page(block, long_enough))], "doc_id long, page string"
    )
    row = extract_main_content(df).collect()[0]
    assert row.n_content_blocks == 1  # only the z-block
    assert row.main_text == "z" * MIN_TEXT_CHARS
    # one fewer anchor char flips it to content: 3*9 = 27 < 30
    block2 = f'<div>{"x" * 20} <a href="/">{"y" * 9}</a></div>'
    df2 = spark.createDataFrame(
        [(1, _page(block2))], "doc_id long, page string"
    )
    assert extract_main_content(df2).collect()[0].n_content_blocks == 1


def test_min_length_bar(spark):
    short = "<p>" + "a" * (MIN_TEXT_CHARS - 1) + "</p>"
    exact = "<p>" + "b" * MIN_TEXT_CHARS + "</p>"
    df = spark.createDataFrame(
        [(1, _page(short, exact))], "doc_id long, page string"
    )
    row = extract_main_content(df).collect()[0]
    assert row.n_content_blocks == 1
    assert row.main_text == "b" * MIN_TEXT_CHARS


def test_fixture_keeps_exactly_the_article(spark):
    """On the planted fixture every document must keep exactly its two
    <p> blocks: the article text and the 'Filed under' byline."""
    got = main_content_extract(spark, SF_ORACLE).toPandas()
    assert (got["n_content_blocks"] == 2).all()
    assert (got["boiler_chars"] > 0).all()
    # main text = article + ' ' + byline, so content > article alone
    docs = duckdb.sql(
        f"SELECT doc_id, length(text) AS lt FROM "
        f"'{SF_ORACLE}/documents.parquet'"
    ).df()
    merged = got.merge(docs, on="doc_id")
    assert (merged["content_chars"] > merged["lt"]).all()


def test_oracle_is_independent_not_layout_derived():
    """The DuckDB oracle must run the classifier, not hardcode the
    fixture layout: feed it a corpus-shaped view where one doc's text is
    too short to clear MIN_TEXT_CHARS and check the oracle drops it."""
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT 1::BIGINT AS doc_id, "
        "'web' AS source, 'tiny' AS text"
    )
    row = con.execute(_MAIN_CONTENT_SQL).df().iloc[0]
    # article block is 'tiny' (4 chars) -> rejected; byline block stays
    assert row["n_content_blocks"] == 1


def test_plan_stays_jvm_side(spark):
    from cc_mapreducer_spark.operators.extraction import _page_fixture_col

    # the extraction stage itself (sans the local-only spread()
    # repartition the fixture query adds for scan parallelism) must be
    # pure JVM expression work riding the scan: no Python, no shuffle
    df = extract_main_content(
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
            "doc_id", "source", _page_fixture_col().alias("page")
        )
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "EvalPython" not in plan
    assert "Exchange" not in plan
