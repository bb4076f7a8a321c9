"""Repetition signals (Gopher-style quality gate) and temperature-based
mixture sampling: DuckDB hash-parity on the driver corpus plus behavior
pins on hand-built pathological documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.sampling import temperature_mixture_sample
from cc_mapreducer_spark.operators.text_analysis import repetition_signals
from cc_mapreducer_spark.tables import load_table
from tests.conftest import SF_ORACLE
from tests.oracle import compare_frames, duckdb_connection

_DUCK_REPETITION = """
WITH w AS (
    SELECT doc_id, text,
           list_filter(string_split(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' '),
                       x -> x != '') AS ws
    FROM documents
), g AS (
    SELECT doc_id,
           CASE WHEN len(ws) >= 3
                THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)]
                ELSE [] END AS grams
    FROM w
), gram_rows AS (
    SELECT doc_id, unnest(grams) AS gram FROM g
), per_gram AS (
    SELECT doc_id, gram, count(*) AS c FROM gram_rows GROUP BY doc_id, gram
), gram_doc AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
           CAST(count(*) AS BIGINT) AS n_distinct_grams,
           CAST(max(c) AS BIGINT) AS max_gram_count
    FROM per_gram GROUP BY doc_id
), line_rows AS (
    SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents
), per_line AS (
    SELECT doc_id, line, count(*) AS c FROM line_rows GROUP BY doc_id, line
), line_doc AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
           CAST(count(*) AS BIGINT) AS n_distinct_lines
    FROM per_line GROUP BY doc_id
)
SELECT l.doc_id, l.n_lines, g.n_grams,
       CAST(l.n_lines - l.n_distinct_lines AS DOUBLE) / l.n_lines AS dup_line_frac,
       CAST(g.n_grams - g.n_distinct_grams AS DOUBLE) / g.n_grams AS dup_gram_frac,
       CAST(g.max_gram_count AS DOUBLE) / g.n_grams AS top_gram_frac
FROM line_doc l LEFT JOIN gram_doc g USING (doc_id)
"""


def test_repetition_parity_on_driver_corpus(spark):
    out = repetition_signals(load_table(spark, SF_ORACLE, "documents"))
    con = duckdb_connection(SF_ORACLE)  # keep alive until .df()
    oracle = con.sql(_DUCK_REPETITION).df()
    compare_frames(out.toPandas(), oracle, "repetition_signals")


def test_repetition_pins_on_pathological_docs(spark):
    docs = spark.createDataFrame(
        [
            # 6 words, trigrams: "spam spam spam" x4 -> all duplicate, all top
            (0, "spam spam spam spam spam spam"),
            # all-distinct words: no repeated grams, single line
            (1, "one two three four five"),
            # two words -> no trigram exists at all
            (2, "too short"),
            # duplicate lines: 3 lines, 2 distinct
            (3, "copy line here\ncopy line here\nunique tail line"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert rows[0]["dup_gram_frac"] == 0.75 and rows[0]["top_gram_frac"] == 1.0
    assert rows[1]["dup_gram_frac"] == 0.0
    assert rows[1]["top_gram_frac"] == 1.0 / 3.0
    assert rows[2]["n_grams"] is None and rows[2]["dup_gram_frac"] is None
    assert rows[3]["dup_line_frac"] == 1.0 / 3.0 and rows[3]["n_lines"] == 3


def test_boilerplate_spans_synthetic(spark):
    from cc_mapreducer_spark.operators.text_analysis import (
        boilerplate_spans,
        flag_boilerplate_docs,
    )

    header = "subscribe to our newsletter today"
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    # digits are stripped by the tokenizer, so bodies must differ in WORDS
    docs = spark.createDataFrame(
        [(i, f"{header} {words[i]} tail") for i in range(6)]
        + [(6, "completely original document six"), (7, "another original one seven")],
        "doc_id long, text string",
    )
    spans = boilerplate_spans(docs, n=5, min_docs=5).collect()
    assert [r["gram"] for r in spans] == [header]
    assert spans[0]["n_docs"] == 6 and spans[0]["n_occurrences"] == 6
    flagged = sorted(r["doc_id"] for r in flag_boilerplate_docs(docs, 5, 5).collect())
    assert flagged == [0, 1, 2, 3, 4, 5]


def test_boilerplate_parity_on_driver_corpus(spark):
    from cc_mapreducer_spark.operators.text_analysis import boilerplate_spans

    out = boilerplate_spans(load_table(spark, SF_ORACLE, "documents"), n=2, min_docs=2)
    con = duckdb_connection(SF_ORACLE)  # keep alive until .df()
    oracle = con.sql(
        """
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' '),
                               x -> x != '') AS ws
            FROM documents
        ), g AS (
            SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
                THEN [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]
                ELSE [] END) AS gram
            FROM w
        )
        SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_occurrences
        FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
        """
    ).df()
    compare_frames(out.toPandas(), oracle, "boilerplate_spans")


_HASH = (
    "(('0x' || substr(md5('mix-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    " / 4294967296.0)"
)


def test_temperature_mixture_parity_and_behavior(spark):
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "source")
    alpha = 0.5
    out = temperature_mixture_sample(docs, "source", "doc_id", alpha)
    con = duckdb_connection(SF_ORACLE)  # keep alive until .df()
    oracle = con.sql(
        f"""
        WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        r AS (SELECT source,
                     round(pow(CAST(n AS DOUBLE), {alpha} - 1.0)
                           / max(pow(CAST(n AS DOUBLE), {alpha} - 1.0)) OVER (), 9) AS rate
              FROM c)
        SELECT d.doc_id, d.source FROM documents d JOIN r USING (source)
        WHERE {_HASH} < r.rate
        """
    ).df()
    compare_frames(out.toPandas(), oracle, "temperature_mixture_sample")


def test_redact_pii_synthetic_and_duckdb_parity(spark):
    import duckdb
    import pandas as pd

    from cc_mapreducer_spark.operators.curation import PII_PATTERNS, redact_pii

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "contact alice.smith+x@example.co.uk or bob@test.io today",
                "server at 192.168.1.254 responded; card 4111 1111 1111 1111 on file",
                "call +1(555)123-4567 now",
                "nothing sensitive here at all",
            ],
        }
    )
    out = redact_pii(spark.createDataFrame(pdf)).toPandas().set_index("doc_id")
    assert out.loc[0, "n_email"] == 2
    assert out.loc[0, "redacted"] == "contact <EMAIL> or <EMAIL> today"
    assert out.loc[1, "n_ipv4"] == 1 and out.loc[1, "n_card"] == 1
    assert "<IPV4>" in out.loc[1, "redacted"] and "<CARD>" in out.loc[1, "redacted"]
    assert "4111" not in out.loc[1, "redacted"]
    assert out.loc[2, "n_phone"] == 1 and out.loc[2, "redacted"] == "call <PHONE> now"
    assert out.loc[3, "redacted"] == pdf.loc[3, "text"]

    # DuckDB mirrors the same patterns verbatim (Java-regex ∩ RE2 subset)
    con = duckdb.connect()
    con.register("docs", pdf)
    repl, counts = "text", []
    for name, pat in PII_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all(text, '{pat}')) AS INT) AS n_{name}"
        )
        repl = f"regexp_replace({repl}, '{pat}', '<{name.upper()}>', 'g')"
    oracle = con.sql(
        f"SELECT doc_id, text, {repl} AS redacted, {', '.join(counts)} FROM docs"
    ).df()
    compare_frames(out.reset_index(), oracle, "redact_pii")


def test_curate_corpus_repetition_gate(spark):
    from cc_mapreducer_spark.operators.curation import curate_corpus

    base = curate_corpus(spark, SF_ORACLE)["quality"]
    gated = curate_corpus(spark, SF_ORACLE, max_top_gram_frac=0.05)["quality"]
    n_base, n_gated = base.count(), gated.count()
    assert n_gated <= n_base
    # gated output is a subset of the ungated quality-pass set
    assert gated.join(base, "doc_id", "left_anti").count() == 0


def test_ngram_contamination_exact_rule(spark):
    from cc_mapreducer_spark.operators.curation import ngram_contamination

    shared = "alpha bravo charlie delta echo"
    train = spark.createDataFrame(
        [
            (0, f"intro words {shared} trailing text"),  # contaminated
            (1, "totally clean training document body"),
            (2, f"{shared} {shared}"),  # two hit occurrences
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100, f"benchmark question {shared} answer")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["n_hit_grams"] for r in ngram_contamination(train, evals, n=5).collect()}
    assert 0 in out and 1 not in out
    assert out[2] >= 2  # both occurrences of the shared span counted


def test_ngram_contamination_plan_broadcasts_eval_side(spark):
    from cc_mapreducer_spark.operators.curation import ngram_contamination
    from cc_mapreducer_spark.tables import load_table

    from cc_mapreducer_spark.plans.inspect import formatted_plan

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    evals = docs.filter("doc_id < 10")
    plan = formatted_plan(ngram_contamination(docs, evals, n=8))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_temperature_limits(spark):
    docs = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id long, source string",
    )
    # alpha=1: natural mix — everything kept
    assert temperature_mixture_sample(docs, "source", "doc_id", 1.0).count() == 1000
    # alpha=0: expected kept per domain ~ n_small; the small domain (max
    # weight) is kept in full, the big one down-sampled to ~100
    kept = (
        temperature_mixture_sample(docs, "source", "doc_id", 0.0)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    by = {r["source"]: r["n"] for r in kept}
    assert by["small"] == 100
    assert 60 <= by["big"] <= 140  # binomial(900, 1/9), generous bounds


def test_char_entropy_planted_values(spark, tmp_path):
    # closed-form pins: one letter -> 0 nats; a 50/50 two-letter doc ->
    # ln 2; uniform a-z -> ln 26; non-letters are excluded before counting
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cc_mapreducer_spark.operators.text_analysis import (
        char_entropy_profile,
    )

    texts = [
        "aaaaaaaaaa",                    # 0 nats, low_entropy
        "ababababab",                    # ln 2
        "abcdefghijklmnopqrstuvwxyz",    # ln 26
        "a1a2a3!!! b",                   # letters only: 'aaab' counted
        "",                              # empty -> 0, flagged
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    rows = {r["doc_id"]: r for r in char_entropy_profile(spark, str(tmp_path)).collect()}
    assert rows[0]["char_entropy"] == 0.0 and rows[0]["low_entropy"]
    assert rows[1]["char_entropy"] == round(math.log(2), 6)
    assert rows[2]["char_entropy"] == round(math.log(26), 6)
    assert not rows[2]["low_entropy"]
    # 'a1a2a3!!! b' -> letters 'aaab': H = -(3/4 ln 3/4 + 1/4 ln 1/4)
    want = round(-(0.75 * math.log(0.75) + 0.25 * math.log(0.25)), 6)
    assert rows[3]["char_entropy"] == want
    assert rows[3]["n_letters"] == 4
    assert rows[4]["char_entropy"] == 0.0 and rows[4]["low_entropy"]
