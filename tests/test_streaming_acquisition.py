"""Streaming acquisition ingest (streaming/acquisition.py): the drained
corpus equals the batch chain run over the union of all batches (same
clean-text hash set, same canonical fields), markup-chrome-only
duplicates dedupe on the CLEAN text across batch boundaries, and a full
replay of the same source accepts zero new rows."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from cc_mapreducer_spark.streaming.acquisition import (
    acquire_batch,
    acquire_rows,
    stream_acquire_ingest,
)
from cc_mapreducer_spark.streaming.ingest import init_bloom_dir

SCHEMA = "doc_id long, html string, url string"


def _raw_rows():
    """40 distinct pages + 10 later re-crawls of pages 0-9 whose MARKUP
    differs (extra comment, tracking params, fragment) but whose visible
    text — and hence clean-text sha — is identical."""
    rows = []
    for i in range(40):
        rows.append(
            (
                i,
                f"<html><!-- crawl --><body><h1>Page {i}</h1>"
                f"<p>unique body text number {i} with words</p></body></html>",
                f"HTTP://WWW.Site{i % 4}.COM:80/a//page-{i}/?b=2&a=1",
            )
        )
    for i in range(10):
        rows.append(
            (
                1000 + i,
                f"<html><!-- recrawl 2 --><body>\n<h1>Page {i}</h1>"
                f"<p>unique body text number {i} with words</p>"
                f"<script>track({i});</script></body></html>",
                f"https://www.site{i % 4}.com/a/page-{i}?utm_source=x&a=1&b=2#frag",
            )
        )
    return rows


def _raw_df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_clean_text_dedup_across_markup_chrome(spark, tmp_path):
    acc = str(tmp_path / "accepted")
    bl = str(tmp_path / "bloom")
    init_bloom_dir(bl, expected_docs=10_000)
    rows = _raw_rows()
    # first crawl wave: 40 distinct pages
    assert acquire_batch(spark, _raw_df(spark, rows[:40]), acc, bl) == 40
    # re-crawl wave: different markup/URL chrome, SAME visible text ->
    # all 10 rejected by the clean-text gate
    assert acquire_batch(spark, _raw_df(spark, rows[40:]), acc, bl) == 0
    got = spark.read.parquet(acc).collect()
    assert len(got) == 40
    by_id = {r["doc_id"]: r for r in got}
    assert set(by_id) == set(range(40))  # originals won, re-crawls lost
    # the carried acquisition columns are the composed transform's
    r0 = by_id[0]
    assert r0["canonical_url"] == "http://site0.com/a/page-0?a=1&b=2"
    assert r0["domain"] == "site0.com"
    assert r0["clean_text"] == "Page 0 unique body text number 0 with words"
    # token count matches the chain tokenizer (digits drop, a-z runs stay)
    toks = [
        w
        for w in "page 0 unique body text number 0 with words".split()
        if w.isalpha()
    ]
    assert r0["n_tokens"] == len(toks)


def test_stream_drain_matches_batch_and_replay_is_idempotent(spark, tmp_path):
    rows = _raw_rows()
    src = str(tmp_path / "src")
    os.makedirs(src)
    # 5 slice files of 10 rows each (the re-crawl wave lands last)
    for s in range(5):
        chunk = rows[s * 10 : (s + 1) * 10]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in chunk], pa.int64()),
                    "html": pa.array([r[1] for r in chunk], pa.string()),
                    "url": pa.array([r[2] for r in chunk], pa.string()),
                }
            ),
            f"{src}/s{s}.parquet",
        )
        # the file source orders by modification time (oldest first);
        # pin strictly increasing mtimes so the re-crawl slice is
        # guaranteed to arrive AFTER the originals it duplicates
        os.utime(f"{src}/s{s}.parquet", (1_700_000_000 + s, 1_700_000_000 + s))
    acc = str(tmp_path / "accepted")
    bl = str(tmp_path / "bloom")
    stream_acquire_ingest(
        spark,
        src,
        SCHEMA,
        acc,
        bl,
        checkpoint_path=str(tmp_path / "ckpt"),
        expected_docs=10_000,
        max_files_per_trigger=1,
    )
    streamed = spark.read.parquet(acc)
    # batch equivalence: the drained corpus carries exactly the distinct
    # clean-text hashes of the whole crawl, with identical canonical
    # fields per surviving doc
    batch = acquire_rows(_raw_df(spark, rows))
    batch_shas = {r["text_sha"] for r in batch.collect()}
    got = streamed.collect()
    assert {r["text_sha"] for r in got} == batch_shas
    assert len(got) == len(batch_shas) == 40  # one row per distinct text
    batch_by_sha = {
        r["text_sha"]: r
        for r in batch.collect()
        if r["doc_id"] < 1000  # first-crawl originals
    }
    for r in got:
        b = batch_by_sha[r["text_sha"]]
        assert (r["canonical_url"], r["domain"], r["n_tokens"]) == (
            b["canonical_url"],
            b["domain"],
            b["n_tokens"],
        )
    # full replay (fresh checkpoint, same source): zero new rows
    stream_acquire_ingest(
        spark,
        src,
        SCHEMA,
        acc,
        bl,
        checkpoint_path=str(tmp_path / "ckpt2"),
        expected_docs=10_000,
        max_files_per_trigger=1,
    )
    assert spark.read.parquet(acc).count() == 40


# --------------------------------------------------------------------------
# C4-gated ingest (round 8, session 2): quality before dedup
# --------------------------------------------------------------------------

C4_SCHEMA = "doc_id long, page_text string, url string"

_GOOD3 = (
    "the quick brown fox jumps over the lazy dog today.\n"
    "a second proper sentence with enough words right here!\n"
    "readers can find the archive at the library desk every day."
)


def _c4_rows():
    """30 clean pages (unique first line per doc), plus pages tripping
    each C4 page rule, plus a later re-crawl of pages 0-4 whose planted
    NOISE lines differ but whose surviving lines are identical."""
    rows = []
    for i in range(30):
        rows.append(
            (
                i,
                f"story number {i} opens with a proper sentence here.\n"
                "home menu search\n" + _GOOD3,
                f"https://www.site{i % 3}.com/page-{i}/",
            )
        )
    rows.append((100, _GOOD3 + "\nthis has badword1 inside.",
                 "https://www.site0.com/bad"))
    rows.append((101, _GOOD3 + "\nlorem ipsum dolor sit amet.",
                 "https://www.site1.com/lorem"))
    rows.append((102, _GOOD3 + "\nfunction f() { return 1; }",
                 "https://www.site2.com/code"))
    rows.append((103, "only two sentences survive here sadly.\n"
                 "a second proper sentence with enough words right here!",
                 "https://www.site0.com/short"))
    for i in range(5):  # re-crawls: different noise, same surviving lines
        rows.append(
            (
                2000 + i,
                f"story number {i} opens with a proper sentence here.\n"
                "please enable javascript to continue\n" + _GOOD3,
                f"https://www.site{i % 3}.com/page-{i}?utm_source=x",
            )
        )
    return rows


def test_c4_gate_quality_then_dedup(spark, tmp_path):
    from cc_mapreducer_spark.streaming.acquisition import curate_batch

    acc, rej, bl = (
        str(tmp_path / "acc"), str(tmp_path / "rej"), str(tmp_path / "bloom")
    )
    init_bloom_dir(bl, expected_docs=10_000)
    rows = _c4_rows()
    a1, r1 = curate_batch(
        spark, _raw_df_c4(spark, rows[:20]), acc, rej, bl, epoch_id=0
    )
    a2, r2 = curate_batch(
        spark, _raw_df_c4(spark, rows[20:]), acc, rej, bl, epoch_id=1
    )
    # 30 clean pages accepted; 4 rule-trippers rejected; 5 re-crawls
    # dedup away on the kept-text sha despite different noise lines
    assert a1 + a2 == 30
    assert r1 + r2 == 4
    accepted = spark.read.parquet(acc)
    assert accepted.count() == 30
    verdicts = {
        (r.verdict, r.doc_id)
        for r in spark.read.parquet(rej).collect()
    }
    assert verdicts == {
        ("bad_words", 100), ("lorem_ipsum", 101),
        ("curly_brace", 102), ("too_few_lines", 103),
    }
    # crash-replay of BOTH epochs (same data, same epoch ids): accepted
    # stays exactly-once via the bitmap order, and the rejects ledger
    # must converge — the epoch-partitioned overwrite rewrites each
    # epoch's own directory, so the ledger row count is unchanged
    # (ADVICE r8: bare append here double-counted the filter funnel on
    # replay)
    before = spark.read.parquet(rej).count()
    assert before == 4
    a3, r3 = curate_batch(
        spark, _raw_df_c4(spark, rows[:20]), acc, rej, bl, epoch_id=0
    )
    a4, r4 = curate_batch(
        spark, _raw_df_c4(spark, rows[20:]), acc, rej, bl, epoch_id=1
    )
    assert a3 == 0 and a4 == 0
    assert r3 == r1 and r4 == r2
    assert spark.read.parquet(rej).count() == before
    assert spark.read.parquet(acc).count() == 30


def _raw_df_c4(spark, rows):
    return spark.createDataFrame(rows, C4_SCHEMA)


def test_stream_c4_ingest_equals_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from cc_mapreducer_spark.streaming.acquisition import (
        curate_rows,
        stream_c4_ingest,
    )

    rows = _c4_rows()
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, chunk in enumerate([rows[:13], rows[13:27], rows[27:]]):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in chunk], pa.int64()),
                "page_text": pa.array([r[1] for r in chunk], pa.string()),
                "url": pa.array([r[2] for r in chunk], pa.string()),
            }
        )
        pq.write_table(tbl, f"{src}/part-{i}.parquet")
    acc, rej, bl, ck = (
        str(tmp_path / "acc"), str(tmp_path / "rej"),
        str(tmp_path / "bloom"), str(tmp_path / "ck"),
    )
    stream_c4_ingest(
        spark, src, C4_SCHEMA, acc, rej, bl, ck,
        expected_docs=10_000, max_files_per_trigger=1,
    )
    got = spark.read.parquet(acc)
    # batch reference: curate the union, dedup on text_sha first-wins
    batch = curate_rows(_raw_df_c4(spark, rows)).filter(
        F.col("verdict") == "ok"
    )
    batch_shas = {
        r.text_sha
        for r in batch.select("text_sha").distinct().collect()
    }
    assert {r.text_sha for r in got.collect()} == batch_shas
    assert got.count() == len(batch_shas)
