"""Winnowing fingerprints and cross-document shared-passage detection.

Full local-minimum winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003 —
the MOSS algorithm), complementing the 1-hash "winnowing-lite" sketch in
text_analysis.doc_fingerprint: where that answers "are these documents
near-identical", this answers "which documents share a PASSAGE" —
copied paragraphs, syndicated boilerplate, quote chains — the
passage-granular layer of a dedup stack (document-level: MinHash/
SimHash; passage-level: winnowing).

Algorithm, word-grain: tokenize -> word k-grams -> md5 per gram -> over
every window of w consecutive gram positions select the minimal hash
(rightmost position on ties — the guarantee-bearing tie rule from the
paper) -> the distinct selected (doc, hash) set is the fingerprint set.
Guarantee: any shared run of at least w + k - 1 words produces at least
one shared fingerprint, while only ~2/(w+1) of grams are kept.

Both engines express the selection identically: min over a
lexicographic struct {hash, -pos} in a ROWS window — no UDF, no
per-row Python.

Scale notes: the explode is ~n_words rows per doc and the selection is
one user-doc-partitioned window pass (ONE Exchange on doc_id). The
pair stage joins on fingerprint hash — near-uniform md5 keys — and a
max_docs_per_fp cap drops ubiquitous-boilerplate fingerprints BEFORE
the self-join, so a universal footer cannot emit C(n_docs, 2) pairs
(same guard as boilerplate_spans / the LSH band joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table, spread

K = 5  # words per gram
W = 4  # grams per winnowing window
MIN_SHARED = 2  # fingerprints two docs must share to pair
MAX_DOCS_PER_FP = 50  # boilerplate guard: hotter fingerprints are dropped


def winnow_fingerprints(docs: DataFrame, k: int = K, w: int = W) -> DataFrame:
    """Distinct winnowing fingerprints per document: (doc_id, fp).

    ``docs`` needs (doc_id, text). Documents shorter than k + w - 1
    words have no complete window and contribute nothing (the
    document-level fingerprint in text_profile covers them)."""
    words = F.filter(
        F.split(F.regexp_replace(F.lower("text"), "[^a-z]+", " "), " "),
        lambda x: x != F.lit(""),
    )
    sized = docs.select(
        "doc_id", words.alias("words"), (F.size(words) - (k - 1)).alias("n_grams")
    ).filter(F.col("n_grams") >= w)
    # 60-bit integer gram keys (the deep_bend_r7 span-key move): every
    # downstream stage — the window min, the distinct, the hot-fp
    # groupBy, the pair self-join — keys on an 8-byte long instead of a
    # 32-char md5 string (~4x less shuffle/compare). The first 15 hex
    # chars of the md5 are derived IDENTICALLY by the DuckDB oracle, so
    # cross-engine parity is exact; selection order by the 60-bit
    # prefix differs from full-md5 order only on a 15-hex-char prefix
    # collision (~2^-60 per comparison — the span-family acceptance).
    grams = sized.select(
        "doc_id",
        "n_grams",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, n_grams), i -> "
                f"CAST(conv(substring(md5(array_join(slice(words, i, {k}), ' ')), 1, 15), 16, 10) AS BIGINT))"
            )
        ).alias("pos0", "h"),
    ).select(
        "doc_id", "n_grams", (F.col("pos0") + 1).alias("pos"), "h"
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    sel = grams.select(
        "doc_id",
        "pos",
        "n_grams",
        F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).over(win).alias("s"),
    ).filter(F.col("pos") <= F.col("n_grams") - (w - 1))  # complete windows only
    return sel.select("doc_id", F.col("s.h").alias("fp")).distinct()


_SHARED_PASSAGES_SQL = f"""
WITH norm AS (
    SELECT doc_id,
           list_filter(string_split(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' '),
                       x -> x <> '') AS words
    FROM documents
), sized AS (
    SELECT doc_id, words, len(words) - {K - 1} AS n_grams
    FROM norm WHERE len(words) - {K - 1} >= {W}
), lists AS (
    SELECT doc_id, n_grams,
           [('0x' || substr(md5(array_to_string(words[i:i+{K - 1}], ' ')), 1, 15))::BIGINT
            for i in range(1, n_grams + 1)] AS hs
    FROM sized
), grams AS (
    SELECT doc_id, n_grams,
           unnest(range(1, n_grams + 1)) AS pos, unnest(hs) AS h
    FROM lists
), sel AS (
    SELECT doc_id, pos, n_grams,
           min({{'h': h, 'np': -pos}}) OVER
             (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN CURRENT ROW AND {W - 1} FOLLOWING) AS s
    FROM grams
), fps AS (
    SELECT DISTINCT doc_id, s.h AS fp
    FROM sel WHERE pos <= n_grams - {W - 1}
), ok AS (
    SELECT fp FROM fps GROUP BY fp
    HAVING count(*) BETWEEN 2 AND {MAX_DOCS_PER_FP}
), pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM fps a JOIN ok USING (fp) JOIN fps b USING (fp)
    WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, count(*) AS n_shared
FROM pairs GROUP BY doc_a, doc_b
HAVING count(*) >= {MIN_SHARED}
"""


@register("shared_passages", oracle=_SHARED_PASSAGES_SQL, driver=False)
def shared_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing >= MIN_SHARED winnowing fingerprints —
    passage-level (not whole-document) duplication. Fingerprints hotter
    than MAX_DOCS_PER_FP docs are dropped before the pair join (the
    boilerplate guard); the remaining join keys are near-uniform md5
    strings, so no bucket can blow up quadratically."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    # materialize the fingerprint table ONCE: `ok` and `kept` both read
    # it, and without this the whole gram+window pipeline runs twice (a
    # real pipeline checkpoints the fingerprint set to parquet anyway —
    # it IS the standing artifact). Measured at 150k synth docs:
    # 21.8s -> ~13s.
    fps = winnow_fingerprints(docs).localCheckpoint()
    ok = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("nd"))
        .filter((F.col("nd") >= 2) & (F.col("nd") <= MAX_DOCS_PER_FP))
        .select("fp")
    )
    kept = fps.join(ok, "fp")
    a = kept.select("fp", F.col("doc_id").alias("doc_a"))
    b = kept.select(F.col("fp").alias("fp2"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, (a.fp == b.fp2) & (a.doc_a < b.doc_b))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= MIN_SHARED)
    )
