"""Text-analysis operators for training-data curation (SURVEY.md §2.8).

Per-document statistics, language-ID heuristic, quality scoring, token
counting, and content fingerprinting over the `documents` table — the
generalization of the reference's `_read` tokenizer stage (src/index.js:48-55)
into the measures an LLM-data pipeline computes per document.

Everything is built-in expressions over one scan of `documents` — these
operators are embarrassingly parallel (no shuffle except final aggregates),
so at 100 TB they run at scan speed. Ratios are integer-count divisions
(exact parity with the DuckDB oracle); no engine `avg` over doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.functions.text import STOP_WORDS, stop_words_sql_list
from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table, spread

_SPARK_WORDS = "filter(split(regexp_replace(lower(text), '[^a-z]+', ' '), ' '), w -> w != '')"
_DUCK_WORDS = (
    "list_filter(string_split(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' '),"
    " w -> w != '')"
)

# --------------------------------------------------------------------------
# per-document statistics
# --------------------------------------------------------------------------

_TEXT_STATS_SQL = f"""
WITH w AS (
    SELECT doc_id, lang, length(text) AS n_chars_actual, {_DUCK_WORDS} AS ws
    FROM documents
)
SELECT doc_id, lang, n_chars_actual,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(len(list_distinct(ws)) AS BIGINT) AS n_unique_words,
       CAST(list_sum([length(x) for x in ws]) AS DOUBLE) / len(ws) AS avg_word_len,
       CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS type_token_ratio
FROM w WHERE len(ws) > 0
"""


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    w = docs.select(
        "doc_id", "lang", F.length("text").alias("n_chars_actual"), F.expr(_SPARK_WORDS).alias("ws")
    ).filter(F.size("ws") > 0)
    return w.select(
        "doc_id",
        "lang",
        "n_chars_actual",
        F.size("ws").cast("bigint").alias("n_words"),
        F.size(F.array_distinct("ws")).cast("bigint").alias("n_unique_words"),
        (
            F.expr("aggregate(ws, 0L, (acc, x) -> acc + length(x))").cast("double")
            / F.size("ws")
        ).alias("avg_word_len"),
        (F.size(F.array_distinct("ws")).cast("double") / F.size("ws")).alias("type_token_ratio"),
    )


# --------------------------------------------------------------------------
# language ID (stop-word-hit-rate heuristic)
# --------------------------------------------------------------------------

_LANG_ID_SQL = f"""
WITH w AS (
    SELECT doc_id, lang, {_DUCK_WORDS} AS ws FROM documents
), scored AS (
    SELECT doc_id, lang,
           CAST(len(list_filter(ws, x -> x IN {stop_words_sql_list()})) AS DOUBLE)
             / len(ws) AS en_stopword_rate
    FROM w WHERE len(ws) > 0
)
SELECT doc_id, lang AS lang_actual, en_stopword_rate,
       CASE WHEN en_stopword_rate >= 0.05 THEN 'en' ELSE 'other' END AS lang_predicted
FROM scored
"""


def lang_id_stopword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: fraction of tokens that are English stop
    words. (A real n-gram model would score per-language profiles; the
    plan shape — per-doc map, zero shuffle — is identical. The driver's
    synthetic corpus shares one vocabulary across langs, so this measures
    the heuristic's mechanics, not its accuracy.)"""
    docs = spread(load_table(spark, sf_dir, "documents"))
    stop_array = "array(" + ", ".join(f"'{w}'" for w in STOP_WORDS) + ")"
    w = docs.select("doc_id", "lang", F.expr(_SPARK_WORDS).alias("ws")).filter(F.size("ws") > 0)
    scored = w.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        (
            F.expr(f"size(filter(ws, x -> array_contains({stop_array}, x)))").cast("double")
            / F.size("ws")
        ).alias("en_stopword_rate"),
    )
    return scored.select(
        "doc_id",
        "lang_actual",
        "en_stopword_rate",
        F.when(F.col("en_stopword_rate") >= 0.05, "en").otherwise("other").alias("lang_predicted"),
    )


# --------------------------------------------------------------------------
# quality scoring
# --------------------------------------------------------------------------

_QUALITY_SQL = f"""
WITH w AS (
    SELECT doc_id, text, length(text) AS n_chars, {_DUCK_WORDS} AS ws
    FROM documents
), m AS (
    SELECT doc_id, n_chars,
           CAST(len(ws) AS BIGINT) AS n_words,
           CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
             / n_chars AS punct_ratio,
           CAST(len(list_filter(ws, x -> x IN {stop_words_sql_list()})) AS DOUBLE)
             / len(ws) AS stopword_ratio,
           CAST(len(list_filter(ws, x -> length(x) > 2)) AS DOUBLE)
             / len(ws) AS long_word_ratio
    FROM w WHERE len(ws) > 0 AND n_chars > 0
)
SELECT doc_id, n_words, punct_ratio, stopword_ratio, long_word_ratio,
       -- literals cast to DOUBLE: DuckDB parses 0.4 as DECIMAL and would
       -- fold 0.4+0.2 exactly, diverging from Spark's double arithmetic
       (CASE WHEN n_words BETWEEN 20 AND 5000 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
        + CASE WHEN punct_ratio < 0.1 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
        + CAST(0.2 AS DOUBLE) * stopword_ratio + CAST(0.2 AS DOUBLE) * long_word_ratio) AS quality_score
FROM m
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length band, punctuation ratio, stop-word
    ratio, long-word ratio, combined into a [0,1]-ish score (the classic
    C4/Gopher-style rule family, minus the ones needing a model)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    stop_array = "array(" + ", ".join(f"'{w}'" for w in STOP_WORDS) + ")"
    w = docs.select(
        "doc_id", "text", F.length("text").alias("n_chars"), F.expr(_SPARK_WORDS).alias("ws")
    ).filter((F.size("ws") > 0) & (F.col("n_chars") > 0))
    m = w.select(
        "doc_id",
        F.size("ws").cast("bigint").alias("n_words"),
        (
            F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).cast("double")
            / F.col("n_chars")
        ).alias("punct_ratio"),
        (
            F.expr(f"size(filter(ws, x -> array_contains({stop_array}, x)))").cast("double")
            / F.size("ws")
        ).alias("stopword_ratio"),
        (
            F.expr("size(filter(ws, x -> length(x) > 2))").cast("double") / F.size("ws")
        ).alias("long_word_ratio"),
    )
    score = (
        F.when(F.col("n_words").between(20, 5000), 0.4).otherwise(0.0)
        + F.when(F.col("punct_ratio") < 0.1, 0.2).otherwise(0.0)
        + 0.2 * F.col("stopword_ratio")
        + 0.2 * F.col("long_word_ratio")
    ).alias("quality_score")
    return m.select(
        "doc_id", "n_words", "punct_ratio", "stopword_ratio", "long_word_ratio", score
    )


# --------------------------------------------------------------------------
# token counting (whitespace + BPE-ish regex + chars-per-token estimate)
# --------------------------------------------------------------------------

_TOKEN_COUNT_SQL = """
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS bpe_ish_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS byte_est_tokens
FROM documents
"""


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three token-count estimators per document: whitespace split, a
    BPE-ish lexical regex (letter runs / digit runs / single punctuation),
    and the chars/4 byte heuristic."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr("size(filter(split(text, ' '), x -> x != ''))").cast("bigint").alias("ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 0)"))
        .cast("bigint")
        .alias("bpe_ish_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("byte_est_tokens"),
    )


_CORPUS_TOKENS_SQL = """
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(len(list_filter(string_split(text, ' '), x -> x != ''))) AS BIGINT) AS total_ws_tokens,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
"""


# driver=False since round 9: absorbed into tokenizer_suite's corpus:*
# legs (the roster is capped at 50 keys); the oracle pair stays pytest-pinned
@register("corpus_token_totals", oracle=_CORPUS_TOKENS_SQL, driver=False)
def corpus_token_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.expr("size(filter(split(text, ' '), x -> x != ''))"))
        .cast("bigint")
        .alias("total_ws_tokens"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# document fingerprinting (content hash + min-k-gram winnow-lite)
# --------------------------------------------------------------------------

_FINGERPRINT_SQL = """
WITH norm AS (
    SELECT doc_id, regexp_replace(lower(text), '[^a-z]+', ' ', 'g') AS nt
    FROM documents
)
SELECT doc_id,
       md5(nt) AS content_md5,
       CASE WHEN length(nt) >= 16
            THEN list_min([md5(substr(nt, i, 16)) for i in range(1, length(nt) - 14)])
            ELSE md5(nt) END AS min_kgram_hash
FROM norm
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-lite fingerprint: md5 of the normalized text plus the
    minimum md5 over all 16-char k-grams (a 1-hash sketch of the rolling
    window family; robust to content reordering at the edges)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    norm = docs.select(
        "doc_id", F.regexp_replace(F.lower("text"), "[^a-z]+", " ").alias("nt")
    )
    return norm.select(
        "doc_id",
        F.md5("nt").alias("content_md5"),
        F.when(
            F.length("nt") >= 16,
            F.array_min(
                F.expr("transform(sequence(1, length(nt) - 15), i -> md5(substring(nt, i, 16)))")
            ),
        )
        .otherwise(F.md5("nt"))
        .alias("min_kgram_hash"),
    )


# --------------------------------------------------------------------------
# repetition signals (Gopher-style quality gate)
# --------------------------------------------------------------------------


def word_ngrams(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, gram) for every word n-gram: ``lead`` windows partitioned
    by doc_id — the token stream shuffles once on doc_id, never on gram
    text. concat_ws silently drops NULLs, so end-of-doc partial grams are
    filtered by checking the LAST lead explicitly."""
    from pyspark.sql import Window

    toks = docs.select("doc_id", F.posexplode(F.expr(_SPARK_WORDS)).alias("pos", "word"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("word")] + [F.lead("word", i).over(w) for i in range(1, n)]
    return (
        toks.select(
            "doc_id",
            F.concat_ws(" ", *parts).alias("gram"),
            F.lead("word", n - 1).over(w).isNotNull().alias("__full"),
        )
        .filter("__full")
        .drop("__full")
    )


def boilerplate_spans(docs: DataFrame, n: int = 5, min_docs: int = 5) -> DataFrame:
    """Corpus-level repeated-span detection (the cross-document
    complement of repetition_signals — CCNet/RefinedWeb-style boilerplate
    mining): word n-grams occurring in at least ``min_docs`` DISTINCT
    documents, with document and occurrence counts.

    Scale shape: after the doc_id-keyed gram generation, ONE aggregation
    keyed on the gram (distinct (gram, doc_id) pairs partially aggregate
    map-side, so a universal header gram arrives pre-collapsed — the
    gram key cannot hot-spot a reducer with raw occurrences)."""
    grams = word_ngrams(docs, n)
    return (
        grams.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def flag_boilerplate_docs(docs: DataFrame, n: int = 5, min_docs: int = 5) -> DataFrame:
    """doc_ids containing at least one boilerplate span (shared by >=
    min_docs docs) — the removal list a curation pipeline anti-joins
    against. Hash semi-join on the gram key (boilerplate span sets are
    small relative to the corpus, broadcast-eligible under AQE)."""
    spans = boilerplate_spans(docs, n, min_docs).select("gram")
    return (
        word_ngrams(docs, n)
        .join(spans, "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )


def repetition_signals(docs: DataFrame, n: int = 3) -> DataFrame:
    """Per-document repetition measures — the standard corpus-quality
    gate that catches boilerplate, keyword stuffing, and templated spam
    (the "repetition filter" family of public corpus-curation rules,
    e.g. the duplicate-line / repeated-n-gram thresholds described in
    the Gopher and RefinedWeb papers):

      * dup_line_frac  — line occurrences beyond the first of each
                         distinct line, over total lines
      * dup_gram_frac  — same, over word n-grams (default trigrams)
      * top_gram_frac  — occurrences of the single most frequent n-gram,
                         over total n-grams

    Docs with fewer than ``n`` words have NULL gram fractions (no grams
    exist — 0.0 would fake a signal).

    Scale shape (2 Exchanges total, audited via plans.inspect): n-grams
    come from ``lead`` windows partitioned by doc_id — ONE shuffle of the
    token stream keyed on doc_id (never on the gram text, so a viral
    phrase cannot hot-spot a partition) that BOTH gram aggregations
    reuse (HashPartitioning(doc_id) satisfies the (doc_id, gram)
    clustering). Line stats never shuffle lines at all: a document's
    lines already live in its row, so they are per-row array expressions
    (split/array_distinct — plain collection functions, inside codegen,
    not interpreted lambdas); only the final n_docs-row narrow join
    moves them. All fractions are single divisions of exact BIGINT
    counts (oracle-parity safe). DuckDB-parity-tested in
    tests/test_text_quality.py."""
    per_gram = word_ngrams(docs, n).groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    gram_doc = per_gram.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_grams"),
        F.count("*").cast("bigint").alias("n_distinct_grams"),
        F.max("c").cast("bigint").alias("max_gram_count"),
    )
    line_doc = docs.select(
        "doc_id",
        F.size(F.split("text", "\n")).cast("bigint").alias("n_lines"),
        F.size(F.array_distinct(F.split("text", "\n"))).cast("bigint").alias(
            "n_distinct_lines"
        ),
    )
    joined = line_doc.join(gram_doc, "doc_id", "left")
    return joined.select(
        "doc_id",
        "n_lines",
        "n_grams",
        ((F.col("n_lines") - F.col("n_distinct_lines")).cast("double") / F.col("n_lines")).alias(
            "dup_line_frac"
        ),
        ((F.col("n_grams") - F.col("n_distinct_grams")).cast("double") / F.col("n_grams")).alias(
            "dup_gram_frac"
        ),
        (F.col("max_gram_count").cast("double") / F.col("n_grams")).alias("top_gram_frac"),
    )


# --------------------------------------------------------------------------
# consolidated per-document profile (roster consolidation, round 2)
# --------------------------------------------------------------------------

# The driver records correctness for at most 50 registered keys, so the
# five per-document surfaces above (stats, lang-ID, quality, token counts,
# fingerprint) merge into ONE wide column-merged profile — a single scan
# of `documents`, zero shuffle, every component column present. Rows keep
# the full corpus; ws-dependent ratios are NULL-guarded for empty docs so
# the merged query is total (the components filter instead). Components
# stay importable functions with their own unit tests.
_TEXT_PROFILE_SQL = f"""
WITH w AS (
    SELECT doc_id, lang, text, length(text) AS n_chars, {_DUCK_WORDS} AS ws,
           regexp_replace(lower(text), '[^a-z]+', ' ', 'g') AS nt
    FROM documents
)
SELECT doc_id,
       lang AS lang_actual,
       n_chars,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(len(list_distinct(ws)) AS BIGINT) AS n_unique_words,
       CASE WHEN len(ws) > 0
            THEN CAST(list_sum([length(x) for x in ws]) AS DOUBLE) / len(ws) END AS avg_word_len,
       CASE WHEN len(ws) > 0
            THEN CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) END AS type_token_ratio,
       CASE WHEN len(ws) > 0
            THEN CAST(len(list_filter(ws, x -> x IN {stop_words_sql_list()})) AS DOUBLE)
                 / len(ws) END AS en_stopword_rate,
       CASE WHEN len(ws) > 0 THEN
         CASE WHEN CAST(len(list_filter(ws, x -> x IN {stop_words_sql_list()})) AS DOUBLE)
                   / len(ws) >= 0.05 THEN 'en' ELSE 'other' END
       END AS lang_predicted,
       CASE WHEN n_chars > 0
            THEN CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                 / n_chars END AS punct_ratio,
       CASE WHEN len(ws) > 0
            THEN CAST(len(list_filter(ws, x -> length(x) > 2)) AS DOUBLE)
                 / len(ws) END AS long_word_ratio,
       CASE WHEN len(ws) > 0 AND n_chars > 0 THEN
         (CASE WHEN len(ws) BETWEEN 20 AND 5000 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
          + CASE WHEN CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / n_chars < 0.1
                 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
          + CAST(0.2 AS DOUBLE) * (CAST(len(list_filter(ws, x -> x IN {stop_words_sql_list()})) AS DOUBLE) / len(ws))
          + CAST(0.2 AS DOUBLE) * (CAST(len(list_filter(ws, x -> length(x) > 2)) AS DOUBLE) / len(ws)))
       END AS quality_score,
       CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS bpe_ish_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS byte_est_tokens,
       md5(nt) AS content_md5,
       CASE WHEN length(nt) >= 16
            THEN list_min([md5(substr(nt, i, 16)) for i in range(1, length(nt) - 14)])
            ELSE md5(nt) END AS min_kgram_hash
FROM w
"""


@register("text_profile", oracle=_TEXT_PROFILE_SQL)
def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-document profile: statistics + stop-word lang-ID + quality
    score + three token-count estimators + content fingerprints, all in
    one scan of `documents` with zero shuffle — the column-merged form of
    text_stats / lang_id_stopword / quality_score / token_count /
    doc_fingerprint. At 100 TB this runs at scan speed and writes one
    profile table feeding every downstream curation filter."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    stop_array = "array(" + ", ".join(f"'{w}'" for w in STOP_WORDS) + ")"
    w = docs.select(
        "doc_id",
        "lang",
        "text",
        F.length("text").alias("n_chars"),
        F.expr(_SPARK_WORDS).alias("ws"),
        F.regexp_replace(F.lower("text"), "[^a-z]+", " ").alias("nt"),
    )
    nw = F.size("ws")
    has_ws = nw > 0
    stop_rate = (
        F.expr(f"size(filter(ws, x -> array_contains({stop_array}, x)))").cast("double") / nw
    )
    punct = F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).cast("double") / F.col(
        "n_chars"
    )
    long_ratio = F.expr("size(filter(ws, x -> length(x) > 2))").cast("double") / nw
    quality = (
        F.when(nw.between(20, 5000), 0.4).otherwise(0.0)
        + F.when(punct < 0.1, 0.2).otherwise(0.0)
        + 0.2 * stop_rate
        + 0.2 * long_ratio
    )
    return w.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        "n_chars",
        nw.cast("bigint").alias("n_words"),
        F.size(F.array_distinct("ws")).cast("bigint").alias("n_unique_words"),
        F.when(
            has_ws,
            F.expr("aggregate(ws, 0L, (acc, x) -> acc + length(x))").cast("double") / nw,
        ).alias("avg_word_len"),
        F.when(has_ws, F.size(F.array_distinct("ws")).cast("double") / nw).alias(
            "type_token_ratio"
        ),
        F.when(has_ws, stop_rate).alias("en_stopword_rate"),
        F.when(has_ws, F.when(stop_rate >= 0.05, "en").otherwise("other")).alias(
            "lang_predicted"
        ),
        F.when(F.col("n_chars") > 0, punct).alias("punct_ratio"),
        F.when(has_ws, long_ratio).alias("long_word_ratio"),
        F.when(has_ws & (F.col("n_chars") > 0), quality).alias("quality_score"),
        F.expr("size(filter(split(text, ' '), x -> x != ''))").cast("bigint").alias("ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 0)"))
        .cast("bigint")
        .alias("bpe_ish_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("byte_est_tokens"),
        F.md5("nt").alias("content_md5"),
        F.when(
            F.length("nt") >= 16,
            F.array_min(
                F.expr("transform(sequence(1, length(nt) - 15), i -> md5(substring(nt, i, 16)))")
            ),
        )
        .otherwise(F.md5("nt"))
        .alias("min_kgram_hash"),
    )


# --------------------------------------------------------------------------
# character-level Shannon entropy (gibberish / spam / low-diversity signal)
# --------------------------------------------------------------------------

_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def _entropy_sql_terms(letters_expr: str, engine: str) -> tuple[str, str]:
    """(total_expr, entropy_expr) built from per-letter replace-counts —
    identical function names in Spark SQL and DuckDB, so one generator
    serves both engines. Counting via length(t) - length(replace(t,c,''))
    keeps the whole computation a per-row codegen expression: no explode,
    no shuffle, O(26 * len) character scans per document."""
    del engine  # same surface in both dialects; kept for call-site clarity
    counts = [
        f"(length({letters_expr}) - length(replace({letters_expr}, '{c}', '')))"
        for c in _ALPHABET
    ]
    total = f"length({letters_expr})"
    # fixed-order sum over the 26 letters (addition order pinned by
    # construction); zero-count letters contribute exactly 0
    terms = [
        f"(CASE WHEN {c} > 0 THEN -({c} / CAST({total} AS DOUBLE))"
        f" * ln({c} / CAST({total} AS DOUBLE)) ELSE 0.0 END)"
        for c in counts
    ]
    return total, "(" + "\n + ".join(terms) + ")"


def _char_entropy_sql() -> str:
    letters = "regexp_replace(lower(text), '[^a-z]', '', 'g')"
    total, ent = _entropy_sql_terms("lt", "duckdb")
    return f"""
WITH base AS (
    SELECT doc_id, {letters} AS lt FROM documents
)
SELECT doc_id,
       CAST({total} AS BIGINT) AS n_letters,
       CASE WHEN {total} > 0 THEN round({ent}, 6) ELSE 0.0 END AS char_entropy,
       CASE WHEN {total} > 0 THEN round({ent}, 6) ELSE 0.0 END < 2.5
           AS low_entropy
FROM base
"""


@register("char_entropy_profile", oracle=_char_entropy_sql(), driver=False)
def char_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy over the a-z letter
    distribution — the cheap gibberish/spam/low-diversity gate (natural
    English sits ~2.8-3.0 nats; 'aaaa...' is 0, keyboard mash and
    base64 blobs run high). Entire computation is one zero-shuffle
    codegen projection: 26 replace-count expressions per row, a
    fixed-order entropy sum, 6dp rounding (ln ulp discipline). The
    2.5-nat flag is the conventional low-diversity cut, emitted so the
    gate itself is hash-checked, not just the score."""
    from cc_mapreducer_spark.tables import load_table, spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        F.regexp_replace(F.lower(F.col("text")), "[^a-z]", "").alias("lt"),
    )
    total, ent = _entropy_sql_terms("lt", "spark")
    entropy = F.when(
        F.expr(total) > 0, F.round(F.expr(ent), 6)
    ).otherwise(F.lit(0.0))
    return base.select(
        "doc_id",
        F.expr(total).cast("bigint").alias("n_letters"),
        entropy.alias("char_entropy"),
        (entropy < 2.5).alias("low_entropy"),
    )
