"""Vocabulary building and token-id encoding — the bridge between
curation (operators/curation.py) and sequence packing
(curation.pack_sequences): turn curated text into bounded-vocabulary id
arrays the way a training-data pipeline does before sharding.

Word-level tokenization (the repo's shared tokenizer expression) rather
than a learned BPE: a real deployment swaps the gram source, the Spark
topology is identical. Both operators are DuckDB-parity-tested
(tests/test_tokenize.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from cc_mapreducer_spark.operators.text_analysis import _SPARK_WORDS

PAD, UNK = "<pad>", "<unk>"


def build_vocab(
    docs: DataFrame, max_size: int = 32768, specials: tuple[str, ...] = (PAD, UNK)
) -> DataFrame:
    """Frequency-ranked vocabulary: specials get ids 0..len(specials)-1,
    then the top words by (count desc, word asc — a deterministic
    tiebreak, so the vocab is reproducible bit-for-bit across engines
    and reruns). Returns (word, token_id, c) with c NULL for specials.

    Scale shape: ONE shuffle (word-keyed count with map-side partial
    agg), then the top-k runs as TakeOrderedAndProject — per-partition
    heaps and a k-row merge, never a global sort of the distinct-word
    set. The final id assignment windows over the already-k-row result
    (vocab-sized, driver-safe by construction)."""
    n_special = len(specials)
    counts = (
        docs.select(F.explode(F.expr(_SPARK_WORDS)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("c"))
        .orderBy(F.desc("c"), F.asc("word"))
        .limit(max_size - n_special)
    )
    ranked = counts.withColumn(
        "token_id",
        (F.row_number().over(Window.orderBy(F.desc("c"), F.asc("word"))) + n_special - 1).cast(
            "int"
        ),
    )
    spark = docs.sparkSession
    special_rows = spark.createDataFrame(
        [(w, i) for i, w in enumerate(specials)], "word string, token_id int"
    ).withColumn("c", F.lit(None).cast("bigint"))
    return special_rows.select("word", "token_id", "c").unionAll(
        ranked.select("word", "token_id", "c")
    )


def encode_tokens(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """(doc_id, token_ids, n_tokens, n_oov): each document's words as
    vocabulary ids in original order; out-of-vocabulary words map to the
    <unk> id.

    Scale shape: the vocab broadcasts (it is max_size rows by
    construction), so the token stream is mapped WITHOUT shuffling by
    word; the only shuffle is the doc_id-keyed regroup that rebuilds
    per-document arrays. Order is restored with array_sort over
    (pos, id) structs — array_sort on structs is a plain collection
    function (codegen), and pos is first so the sort is positional."""
    unk_rows = vocab.filter(F.col("word") == UNK).select("token_id").take(2)
    if len(unk_rows) != 1:
        # fail loudly: with zero <unk> rows the crossJoin below would
        # silently produce an EMPTY result (every token row wiped), and
        # with duplicates every token would fan out — both are total
        # data corruption downstream, not recoverable defaults.
        raise ValueError(
            f"vocab must contain exactly one {UNK!r} row (found {len(unk_rows)}); "
            "build it with build_vocab(..., specials=(..., UNK))"
        )
    unk_id = vocab.filter(F.col("word") == UNK).select("token_id")
    toks = docs.select("doc_id", F.posexplode(F.expr(_SPARK_WORDS)).alias("pos", "word"))
    joined = (
        toks.join(F.broadcast(vocab.select("word", "token_id")), "word", "left")
        .crossJoin(F.broadcast(unk_id.withColumnRenamed("token_id", "__unk")))
        .select(
            "doc_id",
            "pos",
            F.coalesce("token_id", "__unk").alias("tid"),
            F.col("token_id").isNull().cast("int").alias("oov"),
        )
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(pos, tid))), x -> x.tid)").alias(
                "token_ids"
            ),
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("oov").cast("bigint").alias("n_oov"),
        )
    )


def assign_training_shards(
    encoded: DataFrame, tokens_per_shard: int, n_groups: int = 8
) -> DataFrame:
    """Token-budgeted shard assignment over encode_tokens output: shards
    hold ~tokens_per_shard tokens each (documents never split across
    shards, so a shard overshoots by at most one document). Deterministic
    — md5-hash document order, like pack_sequences — so reruns produce
    identical shards.

    Same distributed form as pack_sequences: a global running sum is a
    serial scan, so the cumsum runs independently inside n_groups hash
    groups and shard ids are group-qualified (group * 2^32 + local). One
    shuffle on the group key; at scale n_groups is thousands and each
    group's window is narrow (doc_id, n_tokens) metadata, not token
    arrays."""
    grouped = encoded.select(
        "doc_id",
        "token_ids",
        "n_tokens",
        "n_oov",
        F.pmod(F.hash("doc_id"), F.lit(n_groups)).cast("bigint").alias("__grp"),
        F.md5(F.concat(F.lit("shard-v1:"), F.col("doc_id").cast("string"))).alias("__ord"),
    )
    w = Window.partitionBy("__grp").orderBy("__ord", "doc_id")
    cum = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("bigint"),
    )
    return grouped.select(
        "doc_id",
        "token_ids",
        "n_tokens",
        "n_oov",
        (F.col("__grp") * F.lit(2**32) + F.floor(cum / tokens_per_shard)).alias("shard"),
    )


def write_training_shards(
    encoded: DataFrame, path: str, tokens_per_shard: int, n_groups: int = 8
) -> None:
    """Materialize token-id shards as a hive-partitioned parquet layout
    (shard=<id>/part-*.parquet) — the artifact a training job's data
    loader consumes. Each shard directory holds ~tokens_per_shard tokens;
    readers prune to their shard at planning time via the partition
    column."""
    assign_training_shards(encoded, tokens_per_shard, n_groups).write.mode(
        "overwrite"
    ).partitionBy("shard").parquet(path)
