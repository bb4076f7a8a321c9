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
