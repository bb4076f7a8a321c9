"""Vocabulary building + token-id encoding: DuckDB parity on the driver
corpus and OOV/specials behavior pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.tokenize import build_vocab, encode_tokens
from cc_mapreducer_spark.tables import load_table
from tests.conftest import SF_ORACLE
from tests.oracle import compare_frames, duckdb_connection

_DUCK_WORDS = (
    "list_filter(string_split(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' '),"
    " w -> w != '')"
)

_DUCK_VOCAB = f"""
WITH words AS (
    SELECT unnest({_DUCK_WORDS}) AS word FROM documents
), counts AS (
    SELECT word, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY word
    ORDER BY c DESC, word ASC LIMIT {{limit}}
)
SELECT '<pad>' AS word, 0 AS token_id, CAST(NULL AS BIGINT) AS c
UNION ALL
SELECT '<unk>', 1, CAST(NULL AS BIGINT)
UNION ALL
SELECT word, CAST(row_number() OVER (ORDER BY c DESC, word ASC) + 1 AS INT), c
FROM counts
"""


def test_vocab_parity_and_ids(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    out = build_vocab(docs, max_size=20)
    con = duckdb_connection(SF_ORACLE)  # keep alive until .df()
    oracle = con.sql(_DUCK_VOCAB.format(limit=18)).df()
    compare_frames(out.toPandas(), oracle, "build_vocab")
    ids = {r["word"]: r["token_id"] for r in out.collect()}
    assert ids["<pad>"] == 0 and ids["<unk>"] == 1
    assert len(ids) == 20 and sorted(ids.values()) == list(range(20))


def test_encode_roundtrip_and_oov(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta alpha gamma"), (1, "beta beta zzz")],
        "doc_id long, text string",
    )
    vocab = build_vocab(docs, max_size=4)  # 2 specials + top-2 words only
    ids = {r["word"]: r["token_id"] for r in vocab.collect()}
    # alpha: 3 occurrences? no — alpha x2, beta x3 -> beta ranks first
    assert set(ids) == {"<pad>", "<unk>", "beta", "alpha"}
    assert ids["beta"] == 2 and ids["alpha"] == 3
    enc = {r["doc_id"]: r for r in encode_tokens(docs, vocab).collect()}
    assert enc[0]["token_ids"] == [ids["alpha"], ids["beta"], ids["alpha"], ids["<unk>"]]
    assert enc[0]["n_oov"] == 1  # gamma out of the tiny vocab
    assert enc[1]["token_ids"] == [ids["beta"], ids["beta"], ids["<unk>"]]
    assert enc[1]["n_tokens"] == 3


def test_encode_parity_on_driver_corpus(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    vocab = build_vocab(docs, max_size=16)  # force real OOV traffic
    out = encode_tokens(docs, vocab).select(
        "doc_id", F.col("token_ids").cast("string").alias("token_ids"), "n_tokens", "n_oov"
    )
    con = duckdb_connection(SF_ORACLE)  # keep alive until .df()
    oracle = con.sql(
        f"""
        WITH vocab AS ({_DUCK_VOCAB.format(limit=14)}),
        toks AS (
            SELECT doc_id, unnest({_DUCK_WORDS}) AS word,
                   unnest(range(1, len({_DUCK_WORDS}) + 1)) AS pos
            FROM documents
        ), mapped AS (
            SELECT t.doc_id, t.pos,
                   coalesce(v.token_id, 1) AS tid,
                   CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END AS oov
            FROM toks t LEFT JOIN vocab v USING (word)
        )
        SELECT doc_id,
               '[' || string_agg(tid, ', ' ORDER BY pos) || ']' AS token_ids,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(oov) AS BIGINT) AS n_oov
        FROM mapped GROUP BY doc_id
        """
    ).df()
    compare_frames(out.toPandas(), oracle, "encode_tokens")


def test_encode_plan_broadcasts_vocab(spark):
    from cc_mapreducer_spark.plans.inspect import formatted_plan

    docs = load_table(spark, SF_ORACLE, "documents")
    plan = formatted_plan(encode_tokens(docs, build_vocab(docs, max_size=64)))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_training_shards_budget_and_determinism(spark, tmp_path):
    from cc_mapreducer_spark.operators.tokenize import (
        assign_training_shards,
        build_vocab,
        encode_tokens,
        write_training_shards,
    )

    docs = load_table(spark, SF_ORACLE, "documents")
    encoded = encode_tokens(docs, build_vocab(docs, max_size=64))
    budget = 2000
    assigned = assign_training_shards(encoded, tokens_per_shard=budget, n_groups=4)

    per_shard = assigned.groupBy("shard").agg(
        F.sum("n_tokens").alias("tok"), F.max("n_tokens").alias("mx")
    )
    # a shard overshoots its budget by at most one document's tokens
    assert per_shard.filter(F.col("tok") >= budget + F.col("mx")).count() == 0
    # deterministic: identical assignment on rerun
    again = assign_training_shards(encoded, tokens_per_shard=budget, n_groups=4)
    assert (
        assigned.select("doc_id", "shard")
        .exceptAll(again.select("doc_id", "shard"))
        .count()
        == 0
    )

    # written layout round-trips and prunes by the partition column
    out = str(tmp_path / "shards")
    write_training_shards(encoded, out, tokens_per_shard=budget, n_groups=4)
    back = spark.read.parquet(out)
    assert back.count() == encoded.count()
    one_shard = back.select("shard").first()["shard"]
    from cc_mapreducer_spark.plans.inspect import formatted_plan

    plan = formatted_plan(back.filter(F.col("shard") == one_shard))
    assert "PartitionFilters: [isnotnull(shard" in plan
