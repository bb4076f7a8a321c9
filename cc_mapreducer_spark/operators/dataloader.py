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

mixture_context_sample     WHICH contexts the mixture ships: the
    source's context target split over its shards by a second
    largest-remainder pass, each shard contributing its first
    `allocated` contexts in shuffle-key order — so the pick rank is a
    window WITHIN a shard, never per source (the same single-partition
    refusal as the manifest), and the sample is reproducible from the
    seed alone.

All three ride sequence_pack_* outputs: corpus -> contexts -> mixture
-> sampled set -> shuffled readers is the full pretraining hand-off
chain, and every step is driver-hashable integer arithmetic.
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
    -- split quotient: budget*weight overflows int64 once corpus tokens
    -- pass ~7e12 (budget ~ T/2 times weight ~ sqrt(T) > 2^63 near 28 TB
    -- of text — inside the claimed regime). (q*W + r)*w identity keeps
    -- every intermediate <= max(budget, w_tot^2) — bounded by T and by
    -- (n_sources * sqrt(T))^2, both safe past 100 TB. Same split in the
    -- Spark twin; exact integer identity, so values are unchanged.
    SELECT w.source, w.available_tokens, w.weight,
           (t.budget // t.w_tot) * w.weight
               + ((t.budget % t.w_tot) * w.weight) // t.w_tot AS base,
           ((t.budget % t.w_tot) * w.weight) % t.w_tot AS rem,
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
        # split quotient (see oracle comment): budget * weight wraps
        # int64 near 28 TB of text; (q*W + r)*w keeps intermediates
        # bounded by max(budget, w_tot^2) — exact identity, same values
        "source",
        "available_tokens",
        "weight",
        F.expr(
            "(budget div w_tot) * weight"
            " + ((budget % w_tot) * weight) div w_tot"
        ).alias("base"),
        F.expr("((budget % w_tot) * weight) % w_tot").alias("rem"),
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


_SAMPLE_SQL = f"""
WITH mix AS (
    SELECT source, target_contexts FROM ({_MIXTURE_SQL})
), ctx AS (
    SELECT source, shard, bin, fill_tokens,
           md5('{SHUFFLE_SEED}' || '|' || source || '|' || shard
               || '|' || bin) AS skey
    FROM ({_PACK_BINS_SQL})
), shard_cnt AS (
    SELECT source, shard, count(*) AS n_ctx FROM ctx GROUP BY source, shard
), src_cnt AS (
    SELECT source, sum(n_ctx) AS n_total FROM shard_cnt GROUP BY source
), alloc0 AS (
    -- second largest-remainder pass: the source's context target split
    -- over its shards by shard size — integer arithmetic again, with
    -- the same split-quotient as the mixture plan (target % n_total
    -- < n_total, times a shard's n_ctx ~ n_total / n_shards, keeps
    -- intermediates ~ n_total^2 / n_shards — bounded at production
    -- shard counts where target * n_ctx itself would wrap)
    SELECT c.source, c.shard, c.n_ctx,
           (m.target_contexts // s.n_total) * c.n_ctx
               + ((m.target_contexts % s.n_total) * c.n_ctx) // s.n_total
               AS base,
           ((m.target_contexts % s.n_total) * c.n_ctx) % s.n_total AS rem,
           m.target_contexts
    FROM shard_cnt c
    JOIN src_cnt s USING (source) JOIN mix m USING (source)
), alloc AS (
    SELECT *,
           row_number() OVER (
               PARTITION BY source ORDER BY rem DESC, shard) AS rr,
           target_contexts - sum(base) OVER (PARTITION BY source)
               AS leftover
    FROM alloc0
), quota AS (
    SELECT source, shard, n_ctx,
           least(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END, n_ctx)
               AS allocated
    FROM alloc
), ranked AS (
    SELECT source, shard, fill_tokens,
           row_number() OVER (
               PARTITION BY source, shard ORDER BY skey, bin) AS srank
    FROM ctx
)
SELECT q.source, CAST(q.shard AS BIGINT) AS shard,
       CAST(q.n_ctx AS BIGINT) AS available_contexts,
       CAST(q.allocated AS BIGINT) AS picked_contexts,
       CAST(coalesce(sum(r.fill_tokens), 0) AS BIGINT) AS sampled_tokens
FROM quota q
LEFT JOIN ranked r
  ON r.source = q.source AND r.shard = q.shard AND r.srank <= q.allocated
GROUP BY q.source, q.shard, q.n_ctx, q.allocated
"""


@register("mixture_context_sample", oracle=_SAMPLE_SQL, driver=False)
def mixture_context_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHICH contexts the mixture ships, per (source, shard): the
    source's context target is split over its shards by a second
    largest-remainder pass (integer, deterministic), and each shard
    contributes its first `allocated` contexts in shuffle-key order.
    Ranking therefore stays WITHIN a shard — a per-source pick order
    would be the same single-partition sort the manifest refuses — and
    the whole sample is reproducible from the seed alone."""
    mix = corpus_mixture_plan(spark, sf_dir).select(
        "source", "target_contexts"
    )
    ctx = sequence_pack_bins(spark, sf_dir).select(
        "source",
        "shard",
        "bin",
        "fill_tokens",
        F.md5(
            F.concat_ws(
                "|",
                F.lit(SHUFFLE_SEED),
                F.col("source"),
                F.col("shard").cast("string"),
                F.col("bin").cast("string"),
            )
        ).alias("skey"),
    )
    shard_cnt = ctx.groupBy("source", "shard").agg(
        F.count("*").alias("n_ctx")
    )
    alloc = (
        shard_cnt.withColumn(
            "n_total",
            F.sum("n_ctx").over(Window.partitionBy("source")),
        )
        .join(mix, "source")
        .select(
            "source",
            "shard",
            "n_ctx",
            F.expr(
                "(target_contexts div n_total) * n_ctx"
                " + ((target_contexts % n_total) * n_ctx) div n_total"
            ).alias("base"),
            F.expr(
                "((target_contexts % n_total) * n_ctx) % n_total"
            ).alias("rem"),
            "target_contexts",
        )
        .withColumn(
            "rr",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("rem").desc(), F.col("shard")
                )
            ),
        )
        .withColumn(
            "leftover",
            F.col("target_contexts")
            - F.sum("base").over(Window.partitionBy("source")),
        )
        .select(
            "source",
            "shard",
            "n_ctx",
            F.least(
                F.col("base")
                + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0),
                F.col("n_ctx"),
            ).alias("allocated"),
        )
    )
    ranked = ctx.withColumn(
        "srank",
        F.row_number().over(
            Window.partitionBy("source", "shard").orderBy("skey", "bin")
        ),
    )
    picked = (
        ranked.join(alloc, ["source", "shard"])
        .filter(F.col("srank") <= F.col("allocated"))
        .groupBy("source", "shard")
        .agg(F.sum("fill_tokens").alias("sampled_tokens"))
    )
    return (
        alloc.join(picked, ["source", "shard"], "left")
        .select(
            "source",
            F.col("shard").cast("long"),
            F.col("n_ctx").cast("long").alias("available_contexts"),
            F.col("allocated").cast("long").alias("picked_contexts"),
            F.coalesce("sampled_tokens", F.lit(0))
            .cast("long")
            .alias("sampled_tokens"),
        )
    )
