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

from cc_mapreducer_spark.operators.dedup import _BANDS, _K, shingle_sets
from cc_mapreducer_spark.tables import load_table


def _minhash_bands(docs_shingled: DataFrame) -> DataFrame:
    """doc_id -> one row per band: (doc_id, m0..m7, band, sig). Same
    hash family and banding as the batch path (dedup.py) so incremental
    and batch candidates agree."""
    sh = docs_shingled.select("doc_id", F.explode("ss").alias("s"))
    mh = sh.groupBy("doc_id").agg(
        *[F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"m{i}") for i in range(_K)]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat(*[F.col(f"m{r}") for r in rows]).alias("sig"),
            )
            for bi, rows in enumerate(_BANDS)
        ]
    )
    return mh.select("doc_id", *[f"m{i}" for i in range(_K)], F.explode(band_structs).alias("bs")).select(
        "doc_id", *[f"m{i}" for i in range(_K)],
        F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"),
    )


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
