"""Exact repeated-span detection and per-document duplicate-span
coverage — the ExactSubstr layer of the dedup stack.

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL 2022) showed that EXACT substring repeats (their ExactSubstr tool:
a suffix array over the byte concatenation of the corpus, repeats >= 50
tokens removed) matter independently of document-level near-dup removal:
a memorized span can hide inside two otherwise-different documents,
where MinHash (whole-doc Jaccard) and even winnowing pair detection
(operators/winnow.py reports which DOCS pair, not which TOKENS repeat)
under-report it.

A distributed suffix array is the wrong shape for Spark — it globally
sorts all suffixes of a 100 TB string. The Spark-native equivalent for a
FIXED span length L is exact and embarrassingly parallel:

  tokenize -> slide every L-token window -> ONE groupBy on the span
  (map-side partial agg) -> spans seen >= 2 times are repeats.

Any repeated run of R >= L tokens produces R - L + 1 repeated L-windows,
so fixed-L windows detect every repeat of length >= L (the suffix
array's threshold role) and the union of a run's windows reconstructs
the full repeated region — which is exactly what `span_dup_coverage`
computes per document: the fraction of its tokens lying inside at least
one repeated span, via a gaps-and-islands interval union (running-max
window, no UDF). That is the accounting a removal stage needs: docs
with coverage ~1.0 are wholesale copies (document dedup's job), a
mid-range coverage is boilerplate/quotation (surgical span removal),
~0.0 is clean.

Scale shape: the window explode is ~n_tokens rows per doc (the same
fanout winnow_fingerprints already carries); the only corpus-wide
shuffle keys are the span strings — near-uniform by content (at 100 TB
you would group on xxhash64(span) and keep min(span) as the exemplar;
here the plain string keeps the oracle 1:1). The coverage join is an
equi-join on the span key followed by ONE doc_id-partitioned window
pass. No pair join exists anywhere in this family, so a span repeated a
million times costs one hot-but-bounded aggregate cell, never a
quadratic candidate set (the trap the winnowing/LSH operators guard
against with per-key caps).

Determinism: counts and integer interval arithmetic only; the single
division (covered / n_tokens) is one IEEE op on small integers —
bit-identical across engines — rounded to the repo's 6dp grid anyway.

Reference parity note: the reference engine (/root/reference/src/
index.js) has no span-level operator; this extends SURVEY §2.8's
training-data-pipeline family (dedup beyond the reference's surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table, spread

L = 8  # tokens per span: repeats of >= L tokens are detected exactly
L_LONG = 32  # second resolution: the Lee et al. long-repeat regime
MIN_OCCURRENCES = 2


def span_rows(docs: DataFrame, length: int = L) -> DataFrame:
    """Every L-token window of every document: (doc_id, n_words, start,
    span) with 1-based inclusive start; docs shorter than L contribute
    nothing. One projection + posexplode — no shuffle."""
    words = F.filter(
        F.split(F.regexp_replace(F.lower("text"), "[^a-z]+", " "), " "),
        lambda x: x != F.lit(""),
    )
    sized = docs.select(
        "doc_id", words.alias("words"), F.size(words).alias("n_words")
    ).filter(F.col("n_words") >= length)
    return (
        sized.select(
            "doc_id",
            "n_words",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, n_words - {length} + 1), i -> "
                    f"array_join(slice(words, i, {length}), ' '))"
                )
            ).alias("pos0", "span"),
        )
        .select("doc_id", "n_words", (F.col("pos0") + 1).alias("start"), "span")
    )


def span_keys(docs: DataFrame, length: int = L) -> DataFrame:
    """Every L-token window as a 64-BIT KEY: (doc_id, n_words, start,
    sk) with sk = xxhash64 of the window's word slice — the 100 TB form
    this module's header describes, now also the local hot path. The
    r7 deep-scale lane (500k docs) measured the string-keyed pipeline
    bending superlinear: building 36M span STRINGS and hash-aggregating
    them cost 55s + 121s, all of it allocation/GC, none of it plan
    shape; hashing the slice in place (no string ever materializes,
    the groupBy keys are longs) removed the bend. Downstream semantics
    are unchanged except for the astronomically unlikely 64-bit
    collision (~C(n,2)/2^64; ~3.5e-5 at 36M windows, ~1e-11 at the
    sf0.01 oracle-parity scale) — the REPORTING query
    (repeated_spans) still carries real span strings."""
    words = F.filter(
        F.split(F.regexp_replace(F.lower("text"), "[^a-z]+", " "), " "),
        lambda x: x != F.lit(""),
    )
    sized = docs.select(
        "doc_id", words.alias("words"), F.size(words).alias("n_words")
    ).filter(F.col("n_words") >= length)
    return sized.select(
        "doc_id",
        "n_words",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, n_words - {length} + 1), i -> "
                f"xxhash64(slice(words, i, {length})))"
            )
        ).alias("pos0", "sk"),
    ).select("doc_id", "n_words", (F.col("pos0") + 1).alias("start"), "sk")


_NORM_SQL = (
    "list_filter(string_split(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'),"
    " ' '), x -> x <> '')"
)

def _spans_cte(length: int) -> str:
    """The norm->sized->lists->spans CTE prefix at one resolution."""
    return f"""
WITH norm AS (
    SELECT doc_id, {_NORM_SQL} AS words FROM documents
), sized AS (
    SELECT doc_id, words, len(words) AS n_words
    FROM norm WHERE len(words) >= {length}
), lists AS (
    SELECT doc_id, n_words,
           [array_to_string(words[i:i+{length - 1}], ' ')
            for i in range(1, n_words - {length} + 2)] AS sp
    FROM sized
), spans AS (
    SELECT doc_id, n_words,
           unnest(range(1, n_words - {length} + 2)) AS start, unnest(sp) AS span
    FROM lists
)
"""


_SPANS_CTE = _spans_cte(L)

_REPEATED_SPANS_SQL = f"""{_SPANS_CTE}
SELECT span,
       count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS n_docs
FROM spans
GROUP BY span
HAVING count(*) >= {MIN_OCCURRENCES}
"""


@register("repeated_spans", oracle=_REPEATED_SPANS_SQL, driver=False)
def repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every exactly-repeated L-token span in the corpus with its
    occurrence and document counts — the report a span-removal stage
    (or a memorization audit) consumes. One shuffle, on span keys."""
    spans = span_rows(spread(load_table(spark, sf_dir, "documents")))
    return (
        spans.groupBy("span")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= MIN_OCCURRENCES)
    )


_SPAN_COVERAGE_SQL = f"""{_SPANS_CTE}
, rep AS (
    SELECT span FROM spans GROUP BY span HAVING count(*) >= {MIN_OCCURRENCES}
), hits AS (
    SELECT s.doc_id, s.n_words, s.start, s.start + {L} - 1 AS e
    FROM spans s JOIN rep USING (span)
), flagged AS (
    SELECT doc_id, n_words, start, e,
           CASE WHEN start > coalesce(max(e) OVER (
                    PARTITION BY doc_id ORDER BY start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                THEN 1 ELSE 0 END AS new_island
    FROM hits
), islands AS (
    SELECT doc_id, n_words, start, e,
           sum(new_island) OVER (
               PARTITION BY doc_id ORDER BY start
               ROWS UNBOUNDED PRECEDING) AS island
    FROM flagged
), merged AS (
    SELECT doc_id, n_words, island,
           max(e) - min(start) + 1 AS covered
    FROM islands GROUP BY doc_id, n_words, island
), per_doc AS (
    SELECT doc_id, sum(covered) AS covered_tokens
    FROM merged GROUP BY doc_id
), base AS (
    SELECT doc_id, len({_NORM_SQL}) AS total_tokens FROM documents
)
SELECT b.doc_id,
       CAST(coalesce(p.covered_tokens, 0) AS BIGINT) AS covered_tokens,
       CAST(b.total_tokens AS BIGINT) AS total_tokens,
       round(coalesce(p.covered_tokens, 0) / greatest(b.total_tokens, 1), 6)
           AS dup_coverage
FROM base b LEFT JOIN per_doc p USING (doc_id)
"""


_SPLIT_CASE = (
    "CASE WHEN ('0x' || substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))"
    "::BIGINT / 4294967296.0 < 0.8 THEN 'train' "
    "WHEN ('0x' || substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))"
    "::BIGINT / 4294967296.0 < 0.9 THEN 'val' ELSE 'test' END"
)

_SPAN_DECONTAM_SQL = f"""{_SPANS_CTE}
, tagged AS (
    SELECT doc_id, span, {_SPLIT_CASE} AS split FROM spans
), train_spans AS (
    SELECT DISTINCT span FROM tagged WHERE split = 'train'
), test_spans AS (
    SELECT doc_id, span FROM tagged WHERE split = 'test'
), per_doc AS (
    SELECT t.doc_id,
           count(*) AS n_spans,
           sum(CASE WHEN tr.span IS NOT NULL THEN 1 ELSE 0 END)
               AS n_contaminated
    FROM test_spans t LEFT JOIN train_spans tr USING (span)
    GROUP BY t.doc_id
), test_docs AS (
    SELECT doc_id FROM (SELECT doc_id, {_SPLIT_CASE} AS split FROM documents)
    WHERE split = 'test'
)
SELECT d.doc_id,
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       round(coalesce(p.n_contaminated, 0)
             / greatest(coalesce(p.n_spans, 0), 1), 6) AS contaminated_frac,
       coalesce(p.n_contaminated, 0) > 0 AS flagged
FROM test_docs d LEFT JOIN per_doc p USING (doc_id)
"""


@register("span_decontamination", oracle=_SPAN_DECONTAM_SQL, driver=False)
def span_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3/PaLM-style n-gram decontamination, span grain: for every
    TEST-split document, how many of its L-token spans also occur in a
    TRAIN-split document (GPT-3 flagged eval examples sharing any 13-gram
    with training data; PaLM used 8-grams — L here). Catches the leakage
    doc-level contamination (curation.split_contamination, MinHash
    whole-doc Jaccard) cannot: one copied benchmark question inside an
    otherwise-novel test document.

    Plan: ONE span explode, split assigned as a zero-shuffle hash
    expression on doc_id (sampling.deterministic_split's grid, identical
    salt), distinct train spans (one agg on span keys), LEFT join of the
    test spans against it (content keys, no pair join — a span shared by
    a million train docs is ONE distinct row), per-doc agg, full
    test-doc domain restored with a left join."""
    from cc_mapreducer_spark.operators.sampling import deterministic_split

    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    docs = spread(load_table(spark, sf_dir, "documents"))
    tagged = deterministic_split(span_keys(docs), "doc_id", weights)
    train_spans = (
        tagged.filter(F.col("split") == "train").select("sk").distinct()
    )
    test_spans = tagged.filter(F.col("split") == "test").select("doc_id", "sk")
    per_doc = (
        test_spans.join(
            train_spans.select("sk", F.lit(1).alias("hit")), "sk", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("hit").isNotNull(), 1).otherwise(0)).alias(
                "n_contaminated"
            ),
        )
    )
    test_docs = deterministic_split(
        docs.select("doc_id"), "doc_id", weights
    ).filter(F.col("split") == "test").select("doc_id")
    return test_docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.coalesce("n_contaminated", F.lit(0))
        .cast("bigint")
        .alias("n_contaminated"),
        F.round(
            F.coalesce("n_contaminated", F.lit(0))
            / F.greatest(F.coalesce("n_spans", F.lit(0)), F.lit(1)),
            6,
        ).alias("contaminated_frac"),
        (F.coalesce("n_contaminated", F.lit(0)) > 0).alias("flagged"),
    )


def _covered_tokens(docs: DataFrame, length: int) -> DataFrame:
    """(doc_id, covered_tokens) at one span resolution: repeated-span
    semi-join on hashed span keys (span_keys — longs, not strings),
    then the gaps-and-islands interval union in ONE doc_id-partitioned
    window pass."""
    spans = span_keys(docs, length)
    rep = (
        spans.groupBy("sk")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= MIN_OCCURRENCES)
        .select("sk")
    )
    hits = spans.join(rep, "sk").select(
        "doc_id", "start", (F.col("start") + length - 1).alias("e")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        hits.withColumn(
            "new_island",
            (
                F.col("start")
                > F.coalesce(F.max("e").over(w_prev), F.lit(-1))
            ).cast("int"),
        )
        .withColumn("island", F.sum("new_island").over(w_run))
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg((F.max("e") - F.min("start") + 1).alias("covered"))
        .groupBy("doc_id")
        .agg(F.sum("covered").alias("covered_tokens"))
    )


@register("span_dup_coverage", oracle=_SPAN_COVERAGE_SQL, driver=False)
def span_dup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: how many of its tokens sit inside at least one
    repeated L-token span (interval UNION, so overlapping windows of one
    long repeated run are not double-counted). Full doc domain — clean
    and too-short docs report 0 coverage.

    Plan: span explode -> repeated-span semi-join (span keys) -> ONE
    doc_id window pass for the gaps-and-islands union -> per-doc agg ->
    left join back to the doc domain (broadcast-eligible at these row
    counts; hash join on doc_id at scale)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    per_doc = _covered_tokens(docs, L)
    words = F.filter(
        F.split(F.regexp_replace(F.lower("text"), "[^a-z]+", " "), " "),
        lambda x: x != F.lit(""),
    )
    base = docs.select("doc_id", F.size(words).alias("total_tokens"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("covered_tokens", F.lit(0)).cast("bigint").alias(
            "covered_tokens"
        ),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.coalesce("covered_tokens", F.lit(0))
            / F.greatest("total_tokens", F.lit(1)),
            6,
        ).alias("dup_coverage"),
    )


# --------------------------------------------------------------------------
# multi-resolution coverage: L=8 (boilerplate grain) vs L=32 (the Lee et
# al. ExactSubstr 50-token-regime grain)
# --------------------------------------------------------------------------

# One resolution cannot tell short boilerplate from long memorized
# passages: a navigation phrase repeated across a site and a wholesale
# copied article BOTH show nonzero L=8 coverage. The L=32 pass only
# fires on runs >= 32 tokens, so (cov_l8 - cov_l32) isolates the short-
# boilerplate fraction and cov_l32 is the memorization/removal signal
# (pytest plants a corpus where L=8 alone over-counts; the fixture
# proves the separation).


def _coverage_chain_sql(length: int, sfx: str) -> str:
    """The sized->spans->rep->islands->per_doc CTE chain at one
    resolution, CTE names suffixed so two resolutions share one norm."""
    return f"""sized{sfx} AS (
    SELECT doc_id, words, len(words) AS n_words
    FROM norm WHERE len(words) >= {length}
), lists{sfx} AS (
    SELECT doc_id, n_words,
           [array_to_string(words[i:i+{length - 1}], ' ')
            for i in range(1, n_words - {length} + 2)] AS sp
    FROM sized{sfx}
), spans{sfx} AS (
    SELECT doc_id, unnest(range(1, n_words - {length} + 2)) AS start,
           unnest(sp) AS span
    FROM lists{sfx}
), rep{sfx} AS (
    SELECT span FROM spans{sfx} GROUP BY span
    HAVING count(*) >= {MIN_OCCURRENCES}
), hits{sfx} AS (
    SELECT s.doc_id, s.start, s.start + {length} - 1 AS e
    FROM spans{sfx} s JOIN rep{sfx} USING (span)
), flagged{sfx} AS (
    SELECT doc_id, start, e,
           CASE WHEN start > coalesce(max(e) OVER (
                    PARTITION BY doc_id ORDER BY start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                THEN 1 ELSE 0 END AS new_island
    FROM hits{sfx}
), islands{sfx} AS (
    SELECT doc_id, start, e,
           sum(new_island) OVER (
               PARTITION BY doc_id ORDER BY start
               ROWS UNBOUNDED PRECEDING) AS island
    FROM flagged{sfx}
), merged{sfx} AS (
    SELECT doc_id, island, max(e) - min(start) + 1 AS covered
    FROM islands{sfx} GROUP BY doc_id, island
), per_doc{sfx} AS (
    SELECT doc_id, sum(covered) AS covered_tokens
    FROM merged{sfx} GROUP BY doc_id
)"""


_SPAN_MULTI_SQL = f"""
WITH norm AS (
    SELECT doc_id, {_NORM_SQL} AS words FROM documents
), {_coverage_chain_sql(L, '8')}, {_coverage_chain_sql(L_LONG, '32')},
base AS (
    SELECT doc_id, len(words) AS total_tokens FROM norm
)
SELECT b.doc_id,
       CAST(coalesce(p8.covered_tokens, 0) AS BIGINT) AS covered_l8,
       CAST(coalesce(p32.covered_tokens, 0) AS BIGINT) AS covered_l32,
       CAST(b.total_tokens AS BIGINT) AS total_tokens,
       round(coalesce(p8.covered_tokens, 0)
             / greatest(b.total_tokens, 1), 6) AS cov_l8,
       round(coalesce(p32.covered_tokens, 0)
             / greatest(b.total_tokens, 1), 6) AS cov_l32
FROM base b
LEFT JOIN per_doc8 p8 USING (doc_id)
LEFT JOIN per_doc32 p32 USING (doc_id)
"""


@register("span_dup_coverage_multi", oracle=_SPAN_MULTI_SQL, driver=False)
def span_dup_coverage_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-span coverage at BOTH resolutions (L=8,
    L=32): cov_l8 counts every repeat >= 8 tokens (boilerplate grain),
    cov_l32 only runs >= 32 tokens (the Lee et al. ACL'22 long-repeat
    regime — the memorized-passage signal a removal stage acts on);
    their difference is the short-boilerplate fraction. Two independent
    span aggregates over one scan + one doc-domain join — the plan is
    the single-resolution plan twice, no new shuffle shape. Driver-
    hashed via the ``mining_suite`` span32 legs."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    p8 = _covered_tokens(docs, L).withColumnRenamed("covered_tokens", "c8")
    p32 = _covered_tokens(docs, L_LONG).withColumnRenamed(
        "covered_tokens", "c32"
    )
    words = F.filter(
        F.split(F.regexp_replace(F.lower("text"), "[^a-z]+", " "), " "),
        lambda x: x != F.lit(""),
    )
    base = docs.select("doc_id", F.size(words).alias("total_tokens"))
    return (
        base.join(p8, "doc_id", "left")
        .join(p32, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("c8", F.lit(0)).cast("bigint").alias("covered_l8"),
            F.coalesce("c32", F.lit(0)).cast("bigint").alias("covered_l32"),
            F.col("total_tokens").cast("bigint").alias("total_tokens"),
            F.round(
                F.coalesce("c8", F.lit(0))
                / F.greatest("total_tokens", F.lit(1)),
                6,
            ).alias("cov_l8"),
            F.round(
                F.coalesce("c32", F.lit(0))
                / F.greatest("total_tokens", F.lit(1)),
                6,
            ).alias("cov_l32"),
        )
    )


# --------------------------------------------------------------------------
# the removal stage: rebuild each document with non-canonical repeated
# spans excised (Lee et al.'s ExactSubstr dedup KEEPS one occurrence)
# --------------------------------------------------------------------------

# span_dup_coverage REPORTS duplication; this operator APPLIES the Lee et
# al. policy: for every repeated L-token span, the globally-first
# occurrence (lexicographic min of (doc_id, start)) is canonical and
# stays; every other occurrence's tokens are removed, with overlapping
# removal windows merged by the same gaps-and-islands union before
# excision so a long repeated run is cut once, not once per window.
#
# Scale shape: canonical election is ONE agg on span keys
# (min(struct(doc_id, start)) — partial-agg friendly; a span repeated a
# million times reduces map-side, never a hot window partition), one
# equi-join back on span, the interval union (doc-partitioned window),
# a position explode bounded by covered tokens, one anti-join on
# (doc_id, pos), and a per-doc ordered reassembly. No pair join.


def _removal_islands(docs: DataFrame, length: int) -> DataFrame:
    """(doc_id, s, e) merged intervals of NON-CANONICAL repeated-span
    occurrences at one resolution (hashed span keys — span_keys)."""
    spans = span_keys(docs, length)
    rep = (
        spans.groupBy("sk")
        .agg(
            F.count("*").alias("n"),
            F.min(F.struct("doc_id", "start")).alias("canon"),
        )
        .filter(F.col("n") >= MIN_OCCURRENCES)
        .select("sk", "canon")
    )
    hits = (
        spans.join(rep, "sk")
        .filter(
            (F.col("doc_id") != F.col("canon.doc_id"))
            | (F.col("start") != F.col("canon.start"))
        )
        .select("doc_id", "start", (F.col("start") + length - 1).alias("e"))
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        hits.withColumn(
            "new_island",
            (
                F.col("start")
                > F.coalesce(F.max("e").over(w_prev), F.lit(-1))
            ).cast("int"),
        )
        .withColumn("island", F.sum("new_island").over(w_run))
        .groupBy("doc_id", "island")
        .agg(F.min("start").alias("s"), F.max("e").alias("e"))
        .select("doc_id", "s", "e")
    )


def _removal_sql(length: int) -> str:
    """The full span-removal query at one resolution (the SQL twin of
    ``_span_removal_frame``): canonical election, non-canonical hit
    windows, interval union, position anti-join, ordered reassembly."""
    return f"""{_spans_cte(length)}
, rep AS (
    SELECT span, min({{'doc_id': doc_id, 'start': start}}) AS canon
    FROM spans GROUP BY span HAVING count(*) >= {MIN_OCCURRENCES}
), hits AS (
    SELECT s.doc_id, s.start, s.start + {length} - 1 AS e
    FROM spans s JOIN rep USING (span)
    WHERE s.doc_id <> rep.canon.doc_id OR s.start <> rep.canon.start
), flagged AS (
    SELECT doc_id, start, e,
           CASE WHEN start > coalesce(max(e) OVER (
                    PARTITION BY doc_id ORDER BY start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                THEN 1 ELSE 0 END AS new_island
    FROM hits
), islands AS (
    SELECT doc_id, start, e,
           sum(new_island) OVER (
               PARTITION BY doc_id ORDER BY start
               ROWS UNBOUNDED PRECEDING) AS island
    FROM flagged
), merged AS (
    SELECT doc_id, min(start) AS s, max(e) AS e
    FROM islands GROUP BY doc_id, island
), cut AS (
    SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM merged
), toks AS (
    SELECT doc_id, unnest(range(1, len(words) + 1)) AS pos,
           unnest(words) AS word
    FROM norm
), kept AS (
    SELECT t.doc_id, t.pos, t.word
    FROM toks t LEFT JOIN cut c ON t.doc_id = c.doc_id AND t.pos = c.pos
    WHERE c.pos IS NULL
), rebuilt AS (
    SELECT doc_id,
           count(*) AS kept_tokens,
           string_agg(word, ' ' ORDER BY pos) AS cleaned_text
    FROM kept GROUP BY doc_id
)
SELECT n.doc_id,
       CAST(len(n.words) AS BIGINT) AS total_tokens,
       CAST(coalesce(r.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       CAST(len(n.words) - coalesce(r.kept_tokens, 0) AS BIGINT)
           AS removed_tokens,
       coalesce(r.cleaned_text, '') AS cleaned_text
FROM norm n LEFT JOIN rebuilt r USING (doc_id)
"""


_SPAN_REMOVAL_SQL = _removal_sql(L)
_SPAN_REMOVAL_L32_SQL = _removal_sql(L_LONG)


def _span_removal_frame(
    spark: SparkSession, sf_dir: str, length: int
) -> DataFrame:
    """The removal pipeline at one resolution; see ``span_removal``.

    r11 rebuild (guide §8: move decisions on small rows, payload once):
    instead of exploding EVERY corpus token into (doc_id, pos) rows,
    anti-joining the cut positions, and re-assembling documents with a
    sort-collect aggregate — two token-grain exchanges plus an
    ObjectHashAggregate carrying every surviving word — the merged cut
    intervals (a few rows per affected doc, none for clean docs) roll
    up per doc and attach to the document row with a broadcast-eligible
    left join; the excision is then a row-local array filter over the
    token array the scan already carries. Tokens never shuffle at all:
    the only corpus-grain data movement left is the span-key aggregate
    the detection fundamentally requires. Before-plan: token posexplode
    + LeftAnti + collect_list reassembly; after-plan: broadcast join +
    filter/array_join projection. Values are byte-identical (same kept
    tokens in the same order, space-joined; clean/short docs come back
    verbatim)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    words = F.filter(
        F.split(F.regexp_replace(F.lower("text"), "[^a-z]+", " "), " "),
        lambda x: x != F.lit(""),
    )
    norm = docs.select("doc_id", words.alias("words"))
    cuts = (
        _removal_islands(docs, length)
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e")).alias("cuts"))
    )
    kept = F.when(
        F.col("cuts").isNull(), F.col("words")
    ).otherwise(
        F.expr(
            "filter(words, (w, i) -> "
            "NOT exists(cuts, c -> i + 1 >= c.s AND i + 1 <= c.e))"
        )
    )
    return (
        norm.join(cuts, "doc_id", "left")
        .withColumn("kept_words", kept)
        .select(
            "doc_id",
            F.size("words").cast("bigint").alias("total_tokens"),
            F.size("kept_words").cast("bigint").alias("kept_tokens"),
            (F.size("words") - F.size("kept_words"))
            .cast("bigint")
            .alias("removed_tokens"),
            F.array_join("kept_words", " ").alias("cleaned_text"),
        )
    )


@register("span_removal", oracle=_SPAN_REMOVAL_SQL, driver=False)
def span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY ExactSubstr dedup (Lee et al. ACL'22 policy) at the L=8
    boilerplate grain: rebuild every document's token stream with
    non-canonical repeated-span occurrences excised — the globally-first
    occurrence of each repeated span stays, overlapping removal windows
    merge before cutting, untouched docs come back verbatim
    (token-joined). Returns (doc_id, total_tokens, kept_tokens,
    removed_tokens, cleaned_text); the mining_suite removal legs hash the
    cleaned text byte-for-byte via its md5-48.

    Plan: canonical election is one partial-agg on span keys, then one
    span equi-join, ONE doc-partitioned window pass (interval union), a
    position explode bounded by removed tokens, one anti-join on
    (doc_id, pos), and a per-doc ordered reassembly. No pair join; a
    million-fold repeated span is one agg cell and one canonical row."""
    return _span_removal_frame(spark, sf_dir, L)


@register("span_removal_l32", oracle=_SPAN_REMOVAL_L32_SQL, driver=False)
def span_removal_l32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr removal at the L=32 MEMORIZATION grain (Lee et al.
    ACL'22's long-repeat regime, the policy a production pipeline
    actually applies): only runs >= 32 tokens are excised, so legitimate
    short quotations — which L=8 removal over-cuts — are PRESERVED
    (tests/test_spans.py plants a 10-token quote that proves the
    separation). Same plan shape as ``span_removal``, one parameter
    apart; driver-hashed via the mining_suite removal32 legs."""
    return _span_removal_frame(spark, sf_dir, L_LONG)
