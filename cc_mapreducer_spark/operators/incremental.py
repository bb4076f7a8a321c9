"""Incremental near-dedup: dedupe NEW documents against an existing
corpus without re-processing the corpus.

At 100 TB you cannot re-shingle the whole corpus per ingest batch. The
production shape is a materialized MinHash index: (band, sig, doc_id,
m0..m7) written once, partitioned/bucketed by band signature; each new
batch shingles ONLY its own documents, joins its bands against the index
(shuffling just the new batch — the index side is pre-partitioned on the
join key, and with storage bucketing the join is shuffle-free), and
estimates Jaccard from minhash agreement on the candidates.

The estimator (fraction of the K=8 minhashes that agree) is the standard
unbiased MinHash estimate of Jaccard — verification never touches corpus
text. Candidates are LSH-gated exactly like the batch path
(operators/dedup.py), so the candidate set of the incremental run equals
the cross-(corpus, batch) subset of the batch run's candidates — pinned
in tests/test_incremental.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.operators.dedup import _K, minhash_bands, shingle_sets
from cc_mapreducer_spark.tables import load_table

# The band layout comes from dedup.minhash_bands — ONE builder for the
# batch path, this index, and the probe, so their candidates agree by
# construction (pinned in tests/test_incremental.py).
_minhash_bands = minhash_bands


def build_minhash_index(
    spark: SparkSession, sf_dir: str, index_path: str, max_doc_id: int | None = None
) -> None:
    """Materialize the corpus MinHash band index to parquet. Run once per
    corpus snapshot (or append per accepted batch). At scale, write with
    bucketBy(band, sig) into a table so the incremental join needs no
    shuffle on the index side at all."""
    sets = shingle_sets(spark, sf_dir).filter(F.size("ss") > 0)
    if max_doc_id is not None:
        sets = sets.filter(F.col("doc_id") < max_doc_id)
    _minhash_bands(sets).write.mode("overwrite").parquet(index_path)


def incremental_near_dups(
    spark: SparkSession,
    sf_dir: str,
    index_path: str,
    min_doc_id: int,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicates of the NEW batch (doc_id >= min_doc_id) against the
    indexed corpus: shingle the batch only, band-join against the index,
    estimate Jaccard as the fraction of agreeing minhashes, keep pairs
    with est >= threshold. Returns (corpus_doc, new_doc, est_jaccard).

    Plan: the index scan arrives pre-partitioned from storage; only the
    new batch's bands shuffle. The minhash columns ride along on both
    sides (16 hex strings per doc — constant width), so verification is
    a per-row expression, no extra join."""
    sets = shingle_sets(spark, sf_dir).filter(F.size("ss") > 0).filter(
        F.col("doc_id") >= min_doc_id
    )
    new_bands = _minhash_bands(sets)
    idx = spark.read.parquet(index_path)
    a = idx.select(
        F.col("doc_id").alias("corpus_doc"), "band", "sig",
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(_K)],
    )
    b = new_bands.select(
        F.col("doc_id").alias("new_doc"), "band", "sig",
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(_K)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(_K)
    )
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("corpus_doc") != F.col("new_doc"))
        .select("corpus_doc", "new_doc", *[c for i in range(_K) for c in (f"a{i}", f"b{i}")])
        .distinct()
        .select(
            "corpus_doc", "new_doc",
            (agree.cast("double") / F.lit(float(_K))).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# Incremental embedding near-dup (the ANN twin of the MinHash path above)
# --------------------------------------------------------------------------


def build_signlsh_index(
    spark: SparkSession,
    sf_dir: str,
    index_path: str,
    n_rows: int | None = None,
    max_vec_id: int | None = None,
) -> int:
    """Materialize the corpus sign-LSH bucket index to parquet:
    (t, bucket, vec_id, embedding), one row per (vector, table), built by
    the same _nd_stacked layout the batch self-join uses. The bucket
    width adapts to the FULL corpus size (n_rows defaults to the
    UNfiltered table count even when max_vec_id restricts which vectors
    are indexed — the batch path sizes on the whole corpus, and a
    different width would never collide with batch buckets) and is
    returned so probe batches reuse it. Like the MinHash twin above, the
    local layout is plain parquet; at scale, write with
    bucketBy(t, bucket) into a table so the probe join needs no
    index-side shuffle."""
    from cc_mapreducer_spark.operators.similarity import (
        _nd_stacked,
        near_dup_bits_for,
    )

    full = load_table(spark, sf_dir, "embeddings")
    if n_rows is None:
        n_rows = full.count()
    emb = full if max_vec_id is None else full.filter(F.col("vec_id") < max_vec_id)
    nbits = near_dup_bits_for(n_rows)
    _nd_stacked(emb, nbits).write.mode("overwrite").parquet(index_path)
    return nbits


def incremental_embedding_near_dups(
    spark: SparkSession,
    sf_dir: str,
    index_path: str,
    nbits: int,
    min_vec_id: int,
    threshold: float | None = None,
) -> DataFrame:
    """Near-duplicates of the NEW vector batch (vec_id >= min_vec_id)
    against the indexed corpus: bucket ONLY the batch at the index's
    width (same _nd_stacked layout), hash-join its (t, bucket) keys
    against the index, exact cosine on candidates, dedup pairs that
    collide in several tables. Returns (corpus_vec, new_vec, cosine);
    the threshold defaults to the batch path's _NEAR_DUP_T so the two
    paths cannot silently diverge. Only the new batch is re-bucketed per
    ingest; with the plain-parquet local layout the join still shuffles
    both sides on (t, bucket) — the bucketed-table write noted in
    build_signlsh_index is what removes the index-side exchange at
    scale."""
    from cc_mapreducer_spark.operators.similarity import (
        _NEAR_DUP_T,
        _cosine_pair_udf,
        _nd_stacked,
    )

    if threshold is None:
        threshold = _NEAR_DUP_T
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") >= min_vec_id
    )
    probes = _nd_stacked(emb, nbits).select(
        "t", "bucket", F.col("vec_id").alias("new_vec"), F.col("embedding").alias("eb")
    )
    idx = spark.read.parquet(index_path).select(
        "t", "bucket", F.col("vec_id").alias("corpus_vec"), F.col("embedding").alias("ea")
    )
    pairs = idx.join(probes, ["t", "bucket"]).filter(
        F.col("corpus_vec") != F.col("new_vec")
    )
    return (
        pairs.select(
            "corpus_vec", "new_vec", _cosine_pair_udf("ea", "eb").alias("cosine")
        )
        .distinct()
        .filter(F.col("cosine") >= threshold)
    )
