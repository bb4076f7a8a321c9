"""Streaming acquisition ingest: strip -> canonicalize -> Bloom-gated
exact dedup on the CLEAN text, per micro-batch (VERDICT r6 item 8).

The batch acquisition chain (operators/acquisition.py:
acquisition_chain_profile) proves strip_html -> canonicalize_url ->
tokenize compose on one scan; a real crawl does not arrive as one scan —
it accretes. This sink runs the SAME composed transform incrementally:
each micro-batch of raw (doc_id, html, url) rows is stripped and
canonicalized row-locally (zero shuffle — the transform rides inside the
batch's scan stage), then gated through streaming/ingest.py's Bloom +
exact-verify dedup keyed on sha256 of the CLEANED text, so two crawls of
the same page with different markup chrome (tags, comments, tracking
params) still dedupe whenever their visible text matches.

accepted/ carries (doc_id, clean_text, canonical_url, domain, n_tokens,
text_sha): it IS the training corpus — the cleaned text lands next to
its provenance, ready for the tokenize/dedup operators downstream.

Crash-safety and replay idempotence are inherited verbatim from
ingest.gate_batch's bitmap-before-append commit order (see
streaming/ingest.py's module docstring); re-ingesting identical crawl
data accepts zero new rows, which tests/test_streaming_acquisition.py
pins by draining the same source twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.operators.acquisition import (
    canonicalize_url,
    strip_html,
)
from cc_mapreducer_spark.streaming.ingest import (
    first_wins,
    gate_batch,
    init_bloom_dir,
)


def acquire_rows(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """The composed per-row acquisition transform: markup stripped, URL
    canonicalized, clean-text token count and content hash attached.
    Pure built-ins, zero shuffle — identical semantics to the batch
    chain (operators/acquisition.py)."""
    cleaned = canonicalize_url(strip_html(df, html_col), url_col)
    words = F.filter(
        F.split(F.regexp_replace(F.lower("clean_text"), "[^a-z]+", " "), " "),
        lambda w: w != F.lit(""),
    )
    return cleaned.select(
        "doc_id",
        "clean_text",
        "canonical_url",
        F.regexp_extract("host", r"[^.]+\.[^.]+$", 0).alias("domain"),
        F.size(words).cast("bigint").alias("n_tokens"),
        F.sha2(F.col("clean_text"), 256).alias("text_sha"),
    )


def acquire_batch(
    spark: SparkSession,
    batch: DataFrame,
    accepted_path: str,
    bloom_dir: str,
) -> int:
    """Strip + canonicalize one raw micro-batch, dedup within the batch
    (first doc_id per clean-text hash), then gate against the accreted
    corpus. Returns the number accepted."""
    return gate_batch(
        spark, first_wins(acquire_rows(batch)), accepted_path, bloom_dir
    )


def stream_acquire_ingest(
    spark: SparkSession,
    source_path: str,
    schema,
    accepted_path: str,
    bloom_dir: str,
    checkpoint_path: str,
    expected_docs: int = 1_000_000,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain raw crawl files (doc_id, html, url) through the composed
    acquisition transform into the Bloom-gated corpus (availableNow)."""
    init_bloom_dir(bloom_dir, expected_docs)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def _apply(df: DataFrame, epoch_id: int) -> None:
        acquire_batch(df.sparkSession, df, accepted_path, bloom_dir)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --------------------------------------------------------------------------
# C4-gated streaming ingest (round 8, session 2): quality BEFORE dedup
# --------------------------------------------------------------------------


def curate_rows(
    df: DataFrame, text_col: str = "page_text", url_col: str = "url"
) -> DataFrame:
    """The composed per-row curation transform: C4 line/page cleaning
    (operators/c4_filters.c4_clean) + URL canonicalization. Returns ALL
    rows with their verdicts — the caller splits accepted from telemetry
    — keyed on sha256 of the KEPT text, so two crawls whose pages clean
    to the same surviving lines dedup even when the planted noise
    differs. Pure built-ins, zero shuffle."""
    from cc_mapreducer_spark.operators.c4_filters import c4_clean

    out = c4_clean(canonicalize_url(df, url_col), text_col)
    return out.select(
        "doc_id",
        F.col("kept_text").alias("clean_text"),
        "canonical_url",
        F.regexp_extract("host", r"[^.]+\.[^.]+$", 0).alias("domain"),
        "verdict",
        "n_lines",
        "n_kept_lines",
        F.sha2(F.col("kept_text"), 256).alias("text_sha"),
    )


def curate_batch(
    spark: SparkSession,
    batch: DataFrame,
    accepted_path: str,
    rejects_path: str,
    bloom_dir: str,
    epoch_id: int = 0,
) -> tuple[int, int]:
    """One micro-batch through quality-then-dedup: C4-clean every row,
    ledger the dropped pages' (doc_id, verdict) under their epoch
    (the streaming filter funnel), and gate only the 'ok' pages through
    the Bloom + exact-verify dedup. Returns (accepted, rejected).

    Order matters at scale: quality filtering is row-local and runs
    BEFORE the dedup shuffle, so rejected pages never pay for hashing
    into the corpus gate — the same reason batch pipelines run C4 ahead
    of MinHash.

    Replay idempotence is SYMMETRIC (ADVICE r8): the accepted path was
    already exactly-once via the bitmap-before-append order, but rejects
    used a bare append — a crash-replayed micro-batch would double-count
    the filter-funnel telemetry. Rejects are now partitioned by epoch_id
    and written with dynamic partition overwrite: replaying an epoch
    rewrites exactly that epoch's directory, so the ledger converges to
    one row per (epoch, rejected page) no matter how many times the
    batch replays."""
    rows = curate_rows(batch).localCheckpoint()
    rejects = rows.filter(F.col("verdict") != "ok").select(
        "doc_id", "verdict", "canonical_url"
    )
    n_rejected = rejects.count()
    if n_rejected:
        (
            rejects.withColumn("epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(rejects_path)
        )
    ok = rows.filter(F.col("verdict") == "ok").drop("verdict")
    accepted = gate_batch(
        spark, first_wins(ok), accepted_path, bloom_dir
    )
    return accepted, n_rejected


def stream_c4_ingest(
    spark: SparkSession,
    source_path: str,
    schema,
    accepted_path: str,
    rejects_path: str,
    bloom_dir: str,
    checkpoint_path: str,
    expected_docs: int = 1_000_000,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain raw crawl files (doc_id, page_text, url) through C4
    cleaning into the Bloom-gated corpus, rejects ledgered per verdict
    (availableNow)."""
    init_bloom_dir(bloom_dir, expected_docs)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def _apply(df: DataFrame, epoch_id: int) -> None:
        curate_batch(
            df.sparkSession, df, accepted_path, rejects_path, bloom_dir,
            epoch_id=epoch_id,
        )

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
