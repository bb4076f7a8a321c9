"""Corpus-curation operators: cross-split contamination detection,
sequence packing, and real Unicode normalization — the remaining pieces
a large-scale LLM training-data pipeline runs between dedup and
tokenization.

All three are library operators with local DuckDB / reference-impl
cross-checks (tests/test_curation.py); the driver roster stays at the
50-key cap (operators/consolidated.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cc_mapreducer_spark.operators.dedup import near_dedup_minhash
from cc_mapreducer_spark.operators.sampling import deterministic_split
from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table, spread

# --------------------------------------------------------------------------
# train/test contamination
# --------------------------------------------------------------------------


def split_contamination(
    spark: SparkSession,
    sf_dir: str,
    weights: dict[str, float] | None = None,
    threshold: float | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Detect evaluation-set contamination: test documents whose
    near-duplicate (word-shingle Jaccard >= threshold) exists in train.

    Reuses the MinHash-LSH pair machinery (operators/dedup.py) and the
    deterministic hash split (operators/sampling.py): generate candidate
    pairs over the WHOLE corpus once, then keep pairs that straddle the
    split. Running LSH once on the union is cheaper and strictly more
    complete than banding the two sides separately, and the band join is
    the same one-shuffle plan either way. Returns
    (test_doc, train_doc, jaccard).

    At 100 TB the split assignment is a zero-shuffle map column, so the
    only cost over plain near-dedup is the final filter. ``threshold`` is
    passed INTO the LSH verify stage (not applied after it), so cuts
    below the dedup default are honored; pass ``pairs`` to reuse a pair
    set another stage computed (it is re-filtered at this threshold)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    from cc_mapreducer_spark.operators.dedup import NEAR_DUP_JACCARD

    if threshold is None:
        threshold = NEAR_DUP_JACCARD
    if pairs is None:
        pairs = near_dedup_minhash(spark, sf_dir, threshold=threshold)
    else:
        pairs = pairs.filter(F.col("jaccard") >= threshold)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    splits = deterministic_split(docs, "doc_id", weights).select("doc_id", "split")
    a = splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    b = splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    tagged = pairs.join(a, "doc_a").join(b, "doc_b")
    cross = tagged.filter(
        ((F.col("split_a") == "train") & (F.col("split_b") == "test"))
        | ((F.col("split_a") == "test") & (F.col("split_b") == "train"))
    )
    return cross.select(
        F.when(F.col("split_a") == "test", F.col("doc_a")).otherwise(F.col("doc_b")).alias("test_doc"),
        F.when(F.col("split_a") == "train", F.col("doc_a")).otherwise(F.col("doc_b")).alias("train_doc"),
        "jaccard",
    )


# --------------------------------------------------------------------------
# sequence packing (concat-and-chunk)
# --------------------------------------------------------------------------


def pack_sequences(
    spark: SparkSession,
    sf_dir: str,
    seq_len: int = 512,
    n_groups: int = 8,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay documents end to end in a
    deterministic order and cut fixed seq_len token windows; a document
    maps to the contiguous range of sequences its tokens land in.

    Global greedy packing is a serial scan — the distributed form packs
    independently inside n_groups hash groups (each group = one training
    shard). The plan is one shuffle on pack_group feeding two window
    functions; per group the running offset is a cumulative sum over the
    hash-ordered documents. At scale n_groups is thousands and the
    boundary waste (< seq_len tokens per group) is noise.

    Returns (doc_id, pack_group, n_tokens, start_offset, start_seq,
    end_seq) where offsets are group-local token positions and a doc
    spans sequences [start_seq, end_seq] of its group. Pass ``docs``
    (doc_id, text) to pack a curated subset instead of the full table."""
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.expr("size(filter(split(text, ' '), x -> x != ''))").cast("bigint").alias("n_tokens"),
        F.pmod(F.hash("doc_id"), F.lit(n_groups)).cast("int").alias("pack_group"),
        F.md5(F.concat(F.lit("pack-v1:"), F.col("doc_id").cast("string"))).alias("ord"),
    ).filter(F.col("n_tokens") > 0)
    w = Window.partitionBy("pack_group").orderBy("ord", "doc_id")
    packed = toks.withColumn(
        "start_offset",
        F.coalesce(F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0).cast("bigint")),
    )
    return packed.select(
        "doc_id",
        "pack_group",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / seq_len).cast("bigint").alias("start_seq"),
        F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / seq_len).cast("bigint").alias("end_seq"),
    )


# --------------------------------------------------------------------------
# Unicode normalization (real, stdlib-backed — not a stub)
# --------------------------------------------------------------------------

_NORM_SCHEMA = "doc_id long, text string, norm_text string, changed boolean"


def normalize_text(docs: DataFrame, form: str = "NFKC", strip_accents: bool = False) -> DataFrame:
    """Unicode-normalize a text column with Python's stdlib unicodedata —
    a REAL implementation (unlike the gated media decoders): NFKC/NFC
    canonicalization, control-character removal (keeping \\n and \\t),
    whitespace collapse, optional accent stripping via NFD + combining
    mark removal.

    Spark has no built-in Unicode normalizer, so this is the documented
    escape hatch done right: Arrow-batched mapInPandas (one Python
    round-trip per batch, zero shuffle, scales with input splits). The
    UDF body is pure-Python string work on pandas Series — no per-row
    JVM crossings."""
    import re
    import unicodedata

    def norm_batch(batches):
        import pandas as pd

        ctrl = re.compile(r"[\x00-\x08\x0b-\x1f\x7f]")
        ws = re.compile(r"[ \t]+")

        def one(s: str) -> str:
            t = unicodedata.normalize(form, s)
            if strip_accents:
                t = "".join(
                    c for c in unicodedata.normalize("NFD", t) if not unicodedata.combining(c)
                )
            t = ctrl.sub("", t)
            return ws.sub(" ", t).strip()

        for pdf in batches:
            if not len(pdf):
                continue
            normed = pdf["text"].map(one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "text": pdf["text"],
                    "norm_text": normed,
                    "changed": normed.values != pdf["text"].values,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(norm_batch, _NORM_SCHEMA)


# --------------------------------------------------------------------------
# exact n-gram decontamination
# --------------------------------------------------------------------------


def ngram_contamination(train_docs: DataFrame, eval_docs: DataFrame, n: int = 13) -> DataFrame:
    """Exact n-gram decontamination (the published GPT-3/PaLM-style rule,
    complementing the fuzzy MinHash contamination in split_contamination):
    flag train documents sharing any word n-gram (default 13-gram) with
    an evaluation/benchmark document.

    Returns (doc_id, n_hit_grams) for contaminated train docs.

    Scale shape: the eval side is benchmarks — tiny next to a 100 TB
    train corpus — so its distinct gram set broadcasts and the train
    gram stream is filtered map-side (BroadcastHashJoin, no shuffle of
    train grams by gram text); the only train-side shuffle is the final
    per-doc count keyed on doc_id. Both inputs need (doc_id, text)."""
    from cc_mapreducer_spark.operators.text_analysis import word_ngrams

    eval_grams = word_ngrams(eval_docs, n).select("gram").distinct()
    hits = word_ngrams(train_docs, n).join(F.broadcast(eval_grams), "gram", "left_semi")
    return hits.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_hit_grams"))


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# Ordered: specific before general (an email must not be half-eaten by the
# phone pattern). Every pattern stays inside the Java-regex ∩ RE2 subset
# (no lookaround, no backreferences) so the DuckDB oracle mirrors it
# verbatim — dialect-portable by construction.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b"),
    ("card", r"\b\d{4}([ -]?\d{4}){3}\b"),
    ("phone", r"\+?\d[\d().-]{7,}\d"),
)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub personally-identifiable spans (emails, IPv4s, card-shaped
    digit runs, phone-shaped digit runs) with typed placeholders
    (``<EMAIL>`` etc.) — the standard pre-release curation stage.

    Per-type counts are measured on the ORIGINAL text (independent of
    redaction order); replacements apply in PII_PATTERNS order on the
    running string. Pure per-row regexp built-ins: zero shuffle, runs at
    scan speed inside whole-stage codegen, and the whole stage is
    DuckDB-parity-tested (tests/test_text_quality.py) since the patterns
    are dialect-portable by construction.

    Returns (doc_id, <text_col>, redacted, n_email, n_ipv4, n_card,
    n_phone)."""
    out = docs.select("doc_id", text_col)
    redacted = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("int")
            .alias(f"n_{name}")
        )
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    return out.select("doc_id", text_col, redacted.alias("redacted"), *counts)


# --------------------------------------------------------------------------
# end-to-end curation DAG
# --------------------------------------------------------------------------


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    quality_threshold: float = 0.5,
    dup_threshold: float = 0.2,
    weights: dict[str, float] | None = None,
    seq_len: int = 512,
    max_top_gram_frac: float | None = None,
) -> dict[str, DataFrame]:
    """The full training-data curation DAG, composed from this repo's
    operators — what "switch your pipeline to this engine" means
    end to end:

        quality filter [+ optional repetition gate, max_top_gram_frac]
        -> exact dedup -> near-dup clusters (keepers only) ->
        deterministic split -> train decontamination (drop train docs
        that leak test content) -> sequence packing

    Returns every intermediate stage as a DataFrame. Stages are lazy
    except the near-dup cluster resolution, which runs its iterative
    star rounds eagerly inside duplicate_clusters (each round is a
    checkpointed job):

        quality   (doc_id, quality_score)          quality-passing docs
        keepers   (doc_id)                         exact+near dedup survivors
        splits    (doc_id, split)                  split over keepers
        train     (doc_id)                         decontaminated train set
        packed    pack_sequences schema            packed train set
        stats     one row of per-stage counts      the pipeline report

    Every stage is shuffle-minimal by construction (the component
    operators document their own plans); composing them adds only
    broadcast-size semi-joins on doc_id key sets. At 100 TB each arrow
    between stages is a materialization point (write_stage), not a
    recompute."""
    from cc_mapreducer_spark.operators.clustering import duplicate_clusters
    from cc_mapreducer_spark.operators.dedup import near_dedup_minhash
    from cc_mapreducer_spark.operators.text_analysis import quality_score

    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    docs = load_table(spark, sf_dir, "documents")

    quality = quality_score(spark, sf_dir).filter(
        F.col("quality_score") >= quality_threshold
    ).select("doc_id", "quality_score")
    if max_top_gram_frac is not None:
        # Gopher-style repetition gate: drop docs dominated by one n-gram
        # (boilerplate/templated spam). Docs too short to have grams pass.
        from cc_mapreducer_spark.operators.text_analysis import repetition_signals

        repetitive = repetition_signals(docs).filter(
            F.col("top_gram_frac") > max_top_gram_frac
        ).select("doc_id")
        quality = quality.join(repetitive, "doc_id", "left_anti")

    # Dedup AMONG quality survivors, as the documented sequencing says:
    # electing keepers on the full corpus and intersecting with quality
    # would silently drop any content group whose min-doc_id keeper fails
    # the quality gate (the survivor is discarded as "a duplicate of" a
    # doc that no longer exists downstream). Exact dedup re-groups the
    # survivors directly; near-dup clusters keep full-corpus connectivity
    # (B~A~C links B and C through a dropped bridge doc — still the same
    # content family) but RE-ELECT each cluster's keeper as its lowest
    # surviving doc_id.
    survivors = docs.join(quality.select("doc_id"), "doc_id", "left_semi")
    exact_keep = survivors.groupBy(F.sha2("text", 256).alias("content_sha")).agg(
        F.min("doc_id").alias("keep_id")
    ).select("keep_id")

    # ONE LSH pass serves both cluster resolution and contamination
    # detection (the band self-join + Jaccard verify is the expensive
    # stage; running it twice per pipeline was pure waste).
    pairs = near_dedup_minhash(
        spark, sf_dir, threshold=min(dup_threshold, 0.2)
    )
    clusters = duplicate_clusters(
        spark, sf_dir, pairs=pairs.filter(F.col("jaccard") >= 0.2)
    )
    surviving_members = clusters.join(quality.select("doc_id"), "doc_id", "left_semi")
    near_keep = surviving_members.groupBy("cluster_id").agg(
        F.min("doc_id").alias("keep_id")
    ).select("keep_id")

    keepers = (
        quality.join(exact_keep, quality["doc_id"] == exact_keep["keep_id"], "left_semi")
        .join(near_keep, quality["doc_id"] == near_keep["keep_id"], "left_semi")
        .select("doc_id")
    )

    splits = deterministic_split(keepers, "doc_id", weights)
    contaminated_train = split_contamination(
        spark, sf_dir, weights, dup_threshold, pairs=pairs
    ).select(
        F.col("train_doc").alias("doc_id")
    ).distinct()
    train = (
        splits.filter(F.col("split") == "train")
        .join(contaminated_train, "doc_id", "left_anti")
        .select("doc_id")
    )

    packed = pack_sequences(
        spark, sf_dir, seq_len=seq_len,
        docs=docs.join(train, "doc_id", "left_semi").select("doc_id", "text"),
    )

    stats = (
        docs.agg(F.count("*").alias("n_input"))
        .crossJoin(quality.agg(F.count("*").alias("n_quality")))
        .crossJoin(keepers.agg(F.count("*").alias("n_keepers")))
        .crossJoin(train.agg(F.count("*").alias("n_train")))
        .crossJoin(packed.agg(
            F.count("*").alias("n_packed_docs"),
            F.sum("n_tokens").alias("train_tokens"),
        ))
    )
    return {
        "quality": quality,
        "keepers": keepers,
        "splits": splits,
        "train": train,
        "packed": packed,
        "stats": stats,
    }


# --------------------------------------------------------------------------
# document chunking (embedding-pipeline front end)
# --------------------------------------------------------------------------

_CHUNK_LEN = 32   # words per chunk
_CHUNK_STRIDE = 24  # stride (overlap = len - stride = 8 words)

_CHUNKS_SQL = f"""
WITH words AS (
    SELECT doc_id, {{DUCK_WORDS}} AS ws FROM documents
), sized AS (
    SELECT doc_id, ws, len(ws) AS n FROM words WHERE len(ws) > 0
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_id,
       array_to_string(ws[1 + i * {_CHUNK_STRIDE} :
                          least(n, i * {_CHUNK_STRIDE} + {_CHUNK_LEN})], ' ')
         AS chunk_text,
       CAST(least(n, i * {_CHUNK_STRIDE} + {_CHUNK_LEN})
            - i * {_CHUNK_STRIDE} AS BIGINT) AS n_words
FROM sized, LATERAL (
    SELECT unnest(range(0, CASE WHEN n <= {_CHUNK_LEN} THEN 1
        ELSE 1 + CAST(ceil((n - {_CHUNK_LEN}) / {_CHUNK_STRIDE}.0) AS BIGINT)
        END)) AS i
) t
"""


def chunk_documents(
    docs, chunk_len: int = _CHUNK_LEN, stride: int = _CHUNK_STRIDE
):
    """Sliding-window document chunks: (doc_id, chunk_id, chunk_text,
    n_words) with `chunk_len`-word windows advancing by `stride` (the
    overlap keeps passage boundaries from splitting semantic units —
    the standard embedding-pipeline front end; pair with
    similarity/pq indexing over per-chunk vectors).

    Chunk count per doc = 1 + ceil((n - len)/stride) for n > len, else
    1 — every word lands in at least one chunk, the tail chunk is
    short rather than dropped. Pure built-ins (slice over the shared
    tokenizer's array), zero shuffle, zero UDF."""
    from cc_mapreducer_spark.operators.text_analysis import _SPARK_WORDS

    if stride <= 0 or stride > chunk_len:
        # stride > len silently skips words (breaking the every-word
        # coverage invariant); fail fast instead of corrupting a corpus
        raise ValueError(f"stride must be in [1, chunk_len]: {stride}")
    sized = docs.select(
        "doc_id", F.expr(_SPARK_WORDS).alias("ws")
    ).select("doc_id", "ws", F.size("ws").alias("n")).filter(F.col("n") > 0)
    n_chunks = F.when(F.col("n") <= chunk_len, F.lit(1)).otherwise(
        1 + F.ceil((F.col("n") - chunk_len) / float(stride)).cast("int")
    )
    return (
        sized.select(
            "doc_id",
            "ws",
            "n",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("bigint").alias("chunk_id"),
            F.array_join(
                F.slice(
                    F.col("ws"),
                    F.col("i") * stride + 1,
                    F.least(
                        F.lit(chunk_len),
                        F.col("n") - F.col("i") * stride,
                    ),
                ),
                " ",
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_len), F.col("n") - F.col("i") * stride
            ).cast("bigint").alias("n_words"),
        )
    )


from cc_mapreducer_spark.operators.text_analysis import _DUCK_WORDS  # noqa: E402


@register(
    "document_chunks",
    oracle=_CHUNKS_SQL.format(DUCK_WORDS=_DUCK_WORDS),
    driver=False,
)
def document_chunks(spark, sf_dir):
    """Registered surface: overlapping chunks over the documents table."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return chunk_documents(docs)
