"""Curation operators: contamination vs an independently-derived pair
filter, packing vs a DuckDB window oracle + invariants, normalization vs
Python's unicodedata applied row by row."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.curation import (
    normalize_text,
    pack_sequences,
    split_contamination,
)
from cc_mapreducer_spark.operators.dedup import near_dedup_minhash
from cc_mapreducer_spark.operators.sampling import deterministic_split
from cc_mapreducer_spark.tables import load_table
from tests.conftest import SF_ORACLE
from tests.oracle import compare_frames, duckdb_connection


def test_contamination_matches_pair_filter(spark):
    """The operator must equal: take ALL near-dup pairs, tag each side
    with its split, keep train<->test pairs — computed here from the two
    component operators independently."""
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    split_of = {
        r.doc_id: r.split
        for r in deterministic_split(
            load_table(spark, SF_ORACLE, "documents").select("doc_id"), "doc_id", weights
        ).collect()
    }
    pairs = near_dedup_minhash(spark, SF_ORACLE).filter(F.col("jaccard") >= 0.2).collect()
    expected = set()
    for r in pairs:
        sa, sb = split_of[r.doc_a], split_of[r.doc_b]
        if {sa, sb} == {"train", "test"}:
            test_doc = r.doc_a if sa == "test" else r.doc_b
            train_doc = r.doc_a if sa == "train" else r.doc_b
            expected.add((test_doc, train_doc, round(r.jaccard, 12)))
    got = {
        (r.test_doc, r.train_doc, round(r.jaccard, 12))
        for r in split_contamination(spark, SF_ORACLE, weights).collect()
    }
    assert got == expected
    assert expected, "fixture corpus should produce cross-split contamination"


def test_pack_sequences_duckdb_parity(spark):
    out = pack_sequences(spark, SF_ORACLE, seq_len=512, n_groups=1)
    con = duckdb_connection(SF_ORACLE)
    # n_groups=1 so the oracle needs no hash-partitioning parity; group 0
    oracle = con.sql(
        """
        WITH toks AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_tokens,
                   md5('pack-v1:' || CAST(doc_id AS VARCHAR)) AS ord
            FROM documents
        ), nz AS (
            SELECT * FROM toks WHERE n_tokens > 0
        ), packed AS (
            SELECT doc_id, 0 AS pack_group, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY ord, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
            FROM nz
        )
        SELECT doc_id, CAST(pack_group AS INT) AS pack_group, n_tokens, start_offset,
               CAST(floor(start_offset / 512) AS BIGINT) AS start_seq,
               CAST(floor((start_offset + n_tokens - 1) / 512) AS BIGINT) AS end_seq
        FROM packed
        """
    ).df()
    compare_frames(out.toPandas(), oracle, "pack_sequences")


def test_pack_sequences_invariants(spark):
    """Within every group: offsets are a gapless concatenation (sorted
    offsets tile exactly), and sequence ranges are consistent."""
    rows = pack_sequences(spark, SF_ORACLE, seq_len=256, n_groups=8).collect()
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r.pack_group, []).append(r)
    assert len(by_group) == 8
    for g, members in by_group.items():
        members.sort(key=lambda r: r.start_offset)
        expect = 0
        for r in members:
            assert r.start_offset == expect, f"gap in group {g}"
            assert r.start_seq == r.start_offset // 256
            assert r.end_seq == (r.start_offset + r.n_tokens - 1) // 256
            assert r.start_seq <= r.end_seq
            expect += r.n_tokens


def test_normalize_text_against_reference(spark):
    fixtures = [
        (0, "plain ascii stays"),
        (1, "ﬁ ligature Å angstrom ① one"),          # NFKC compat folds
        (2, "combining é acute"),                         # é composed
        (3, "ctrl\x00chars\x07gone\nnewline kept\ttab kept"),
        (4, "  collapse   runs\tof \t whitespace  "),
        (5, "fullｗidth"),
    ]
    df = spark.createDataFrame(fixtures, "doc_id long, text string")
    got = {r.doc_id: (r.norm_text, r.changed) for r in normalize_text(df).collect()}
    import re

    ctrl = re.compile(r"[\x00-\x08\x0b-\x1f\x7f]")
    ws = re.compile(r"[ \t]+")
    for doc_id, text in fixtures:
        expect = ws.sub(" ", ctrl.sub("", unicodedata.normalize("NFKC", text))).strip()
        assert got[doc_id][0] == expect
        assert got[doc_id][1] == (expect != text)
    assert got[0][1] is False and got[1][1] is True


def test_normalize_text_accent_strip(spark):
    df = spark.createDataFrame([(0, "Crème brûlée à côté")], "doc_id long, text string")
    out = normalize_text(df, strip_accents=True).first()
    assert out.norm_text == "Creme brulee a cote"


def test_normalize_corpus_is_shuffle_free(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    out = normalize_text(docs)
    assert out.count() == docs.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_curate_corpus_invariants(spark):
    """The composed DAG must be internally consistent: monotone stage
    shrinkage, keeper subset relations, decontaminated train, packed
    set == train set."""
    from cc_mapreducer_spark.operators.curation import curate_corpus, split_contamination

    stages = curate_corpus(spark, SF_ORACLE)
    stats = stages["stats"].first()
    assert stats.n_input >= stats.n_quality >= stats.n_keepers >= stats.n_train
    assert stats.n_train > 0 and stats.train_tokens > 0

    keepers = {r.doc_id for r in stages["keepers"].collect()}
    quality = {r.doc_id for r in stages["quality"].collect()}
    assert keepers <= quality

    # Keeper election happens AMONG QUALITY SURVIVORS (the round-3 review
    # fix): keepers must be exactly the minimum surviving doc_id of every
    # near-dup cluster that has survivors — no content family with a
    # survivor may vanish just because its full-corpus min-doc_id keeper
    # failed the quality gate, and no family contributes two keepers.
    # (Identical-text groups are jaccard-1 subsets of clusters, so this
    # single property covers the exact-dedup stage too.)
    from cc_mapreducer_spark.operators.clustering import duplicate_clusters

    cluster_of = {
        r.doc_id: r.cluster_id for r in duplicate_clusters(spark, SF_ORACLE).collect()
    }
    expected_keepers = {}
    for d in quality:
        c = cluster_of[d]
        expected_keepers[c] = min(expected_keepers.get(c, d), d)
    assert keepers == set(expected_keepers.values())

    # train is decontaminated: no train doc appears as a contaminating side
    train = {r.doc_id for r in stages["train"].collect()}
    contaminating = {
        r.train_doc for r in split_contamination(spark, SF_ORACLE).collect()
    }
    assert not (train & contaminating)

    # split assignment is the deterministic hash split restricted to keepers
    splits = {r.doc_id: r.split for r in stages["splits"].collect()}
    assert set(splits) == keepers

    packed_docs = {r.doc_id for r in stages["packed"].collect()}
    # packing drops zero-token docs only
    assert packed_docs <= train
    assert len(train - packed_docs) <= stats.n_train - stats.n_packed_docs


def test_chunking_covers_every_word_with_overlap(spark):
    from cc_mapreducer_spark.operators.curation import chunk_documents

    # letter-only words: the shared tokenizer treats digits as breaks
    import itertools

    w = ["".join(p) for p in itertools.product("abcdefghij", repeat=2)]
    docs = spark.createDataFrame(
        [(0, " ".join(w[:100])),                      # 100 words
         (1, "short doc only"),                        # < chunk_len
         (2, " ".join("x" + c for c in w[:32]))],      # exactly chunk_len
        "doc_id long, text string",
    )
    rows = chunk_documents(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 100 words, len 32, stride 24 -> 1 + ceil(68/24) = 4 chunks
    assert len(by_doc[0]) == 4
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_words"] == 3
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_words"] == 32
    # coverage: every word appears in at least one chunk, in order
    seen = set()
    for r in sorted(by_doc[0], key=lambda r: r["chunk_id"]):
        words = r["chunk_text"].split(" ")
        assert len(words) == r["n_words"] <= 32
        seen.update(words)
    assert seen == set(w[:100])
    # overlap: consecutive chunks share len - stride = 8 words
    c0 = by_doc[0][0]["chunk_text"].split(" ")
    c1 = [r for r in by_doc[0] if r["chunk_id"] == 1][0]["chunk_text"].split(" ")
    assert c0[-8:] == c1[:8]
