"""Dataloader hand-off: mixture planning and the deterministic shuffle
manifest — the two decisions between a packed corpus (operators/seqprep)
and a training run's readers.

corpus_mixture_plan     how much of each source does the run consume?
    The standard temperature-sampling recipe (multilingual-LM style,
    alpha = 0.5): source weights proportional to sqrt(available tokens)
    — upweights small sources without letting a giant source drown the
    mixture — apportioned over an integer token budget (half the corpus
    here; the knob is a constant) by the largest-remainder method.
    Everything is INTEGER arithmetic by construction: weights are
    isqrt(tokens) (floor of a correctly-rounded IEEE sqrt of an exact
    int — bit-identical in both engines), quotas are floor(B*w/W) with
    remainders ranked by the exact integer B*w mod W (ties by source),
    and the per-source epochs factor is ONE IEEE division of exact ints
    (the WordPiece-likelihood precedent) — so the DuckDB oracle matches
    hash-exactly with no float accumulation anywhere.

context_shuffle_manifest     which reader gets which context, in what
    order? Training wants an epoch-stable pseudorandom order that any
    worker can reproduce without coordination. Each packed context
    (source, shard, bin) gets a keyed hash (md5 over a seed + its
    coordinates); a reader owns the contexts with hash % N_READERS ==
    its id, ordered by hash. Deliberately NO global sequence number —
    a global row_number is a single-partition sort at 100 TB; per-reader
    positions come from a window bounded by the reader count, the same
    scale discipline as the packing shard. The manifest is closed-form
    from the bins table, so the oracle re-derives every (reader,
    position) pair.

Both ride sequence_pack_* outputs: corpus -> contexts -> mixture ->
shuffled readers is the full pretraining hand-off chain, and every step
is driver-hashable integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cc_mapreducer_spark.operators.seqprep import (
    _PACK_BINS_SQL,
    _PACK_SUMMARY_SQL,
    CONTEXT_LEN,
    sequence_pack_bins,
    sequence_pack_summary,
)
from cc_mapreducer_spark.registry import register

BUDGET_NUM, BUDGET_DEN = 1, 2  # consume half the corpus (integer knob)
N_READERS = 8  # dataloader readers (fixture; production = worker count)
SHUFFLE_SEED = "r10"  # epoch seed: change it, every key/order changes


_MIXTURE_SQL = f"""
WITH avail AS (
    SELECT source, total_tokens AS available_tokens
    FROM ({_PACK_SUMMARY_SQL})
), weighted AS (
    -- isqrt: floor of a correctly-rounded IEEE sqrt of an exact int —
    -- bit-identical in both engines for any int < 2^52
    SELECT source, available_tokens,
           CAST(floor(sqrt(CAST(available_tokens AS DOUBLE))) AS BIGINT)
               AS weight
    FROM avail
), tot AS (
    SELECT sum(weight) AS w_tot,
           CAST(sum(available_tokens) * {BUDGET_NUM} // {BUDGET_DEN}
                AS BIGINT) AS budget
    FROM weighted
), quota AS (
    SELECT w.source, w.available_tokens, w.weight,
           t.budget * w.weight // t.w_tot AS base,
           t.budget * w.weight % t.w_tot AS rem,
           t.budget, t.w_tot
    FROM weighted w CROSS JOIN tot t
), ranked AS (
    SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rr,
           budget - sum(base) OVER () AS leftover
    FROM quota
)
SELECT source,
       CAST(available_tokens AS BIGINT) AS available_tokens,
       CAST(weight AS BIGINT) AS weight,
       CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
           AS target_tokens,
       CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS DOUBLE)
           / available_tokens AS epochs,
       CAST(ceil((base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END)
                 / CAST({CONTEXT_LEN} AS DOUBLE)) AS BIGINT)
           AS target_contexts
FROM ranked
"""


@register("corpus_mixture_plan", oracle=_MIXTURE_SQL, driver=False)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted (alpha=0.5) token-budget apportionment per
    source by the largest-remainder method; see module docstring. The
    epochs column (target/available) says how many passes over a source
    the mixture implies — the over/under-sampling signal a pipeline
    owner reads before a run."""
    avail = sequence_pack_summary(spark, sf_dir).select(
        "source", F.col("total_tokens").alias("available_tokens")
    )
    weighted = avail.withColumn(
        "weight",
        F.floor(F.sqrt(F.col("available_tokens").cast("double"))).cast(
            "long"
        ),
    )
    # corpus totals via unbounded windows over the per-source frame —
    # tens of rows (one per source) at any corpus scale, and no join in
    # the plan (the broadcast-one-row alternative plans as a
    # BroadcastNestedLoopJoin the fleet audit rightly dislikes)
    quota = weighted.select(
        "source",
        "available_tokens",
        "weight",
        F.expr(
            f"(sum(available_tokens) OVER ()) * {BUDGET_NUM}"
            f" div {BUDGET_DEN}"
        ).alias("budget"),
        F.expr("sum(weight) OVER ()").alias("w_tot"),
    ).select(
        "source",
        "available_tokens",
        "weight",
        F.expr("budget * weight div w_tot").alias("base"),
        F.expr("budget * weight % w_tot").alias("rem"),
        "budget",
    )
    w = Window.orderBy(F.col("rem").desc(), F.col("source"))
    ranked = quota.withColumn("rr", F.row_number().over(w)).withColumn(
        "leftover",
        F.col("budget") - F.sum("base").over(Window.partitionBy()),
    )
    target = F.col("base") + F.when(
        F.col("rr") <= F.col("leftover"), F.lit(1)
    ).otherwise(F.lit(0))
    return ranked.select(
        "source",
        F.col("available_tokens").cast("long"),
        F.col("weight").cast("long"),
        target.cast("long").alias("target_tokens"),
        (target.cast("double") / F.col("available_tokens")).alias("epochs"),
        F.ceil(target / float(CONTEXT_LEN)).cast("long").alias(
            "target_contexts"
        ),
    )


_MANIFEST_SQL = f"""
WITH bins AS (
    SELECT source, shard, bin, fill_tokens FROM ({_PACK_BINS_SQL})
), keyed AS (
    SELECT source, shard, bin, fill_tokens,
           md5('{SHUFFLE_SEED}' || '|' || source || '|' || shard
               || '|' || bin) AS skey
    FROM bins
), assigned AS (
    SELECT *, ('0x' || substr(skey, 1, 8))::BIGINT % {N_READERS} AS reader
    FROM keyed
)
SELECT source, CAST(shard AS BIGINT) AS shard, CAST(bin AS BIGINT) AS bin,
       CAST(fill_tokens AS BIGINT) AS fill_tokens,
       CAST(reader AS INT) AS reader,
       CAST(row_number() OVER (
           PARTITION BY reader ORDER BY skey, source, shard, bin)
           AS BIGINT) AS pos
FROM assigned
"""


@register("context_shuffle_manifest", oracle=_MANIFEST_SQL, driver=False)
def context_shuffle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-stable pseudorandom reader assignment for every packed
    context: keyed md5 over (seed, source, shard, bin) -> reader =
    key % N_READERS, position = rank of the key within the reader. No
    global ordering anywhere (module docstring); re-running with the
    same seed reproduces the manifest bit-for-bit, changing the seed
    reshuffles every epoch."""
    bins = sequence_pack_bins(spark, sf_dir).select(
        "source", "shard", "bin", "fill_tokens"
    )
    keyed = bins.withColumn(
        "skey",
        F.md5(
            F.concat_ws(
                "|",
                F.lit(SHUFFLE_SEED),
                F.col("source"),
                F.col("shard").cast("string"),
                F.col("bin").cast("string"),
            )
        ),
    ).withColumn(
        "reader",
        (
            F.conv(F.substring("skey", 1, 8), 16, 10).cast("long")
            % N_READERS
        ).cast("int"),
    )
    w = Window.partitionBy("reader").orderBy("skey", "source", "shard", "bin")
    return keyed.select(
        "source",
        F.col("shard").cast("long"),
        F.col("bin").cast("long"),
        F.col("fill_tokens").cast("long"),
        "reader",
        F.row_number().over(w).cast("long").alias("pos"),
    )
