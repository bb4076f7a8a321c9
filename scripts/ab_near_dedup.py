"""A/B the near_dedup_minhash verify-stage parallelism floor (VERDICT r5 #1).

Round 5's unconditional ``.repartition(defaultParallelism)`` on the
candidate-pair frame (operators/dedup.py:315) fixed the skew-corpus
single-task verify pathology (30s -> ~6s) but the uniform 30x trend point
regressed 2.6x (8.0s r4 -> 20.6s r5). This script measures four forms on
BOTH corpora at 1x/10x/30x, interleaved reps, best-of:

  A  unconditional repartition(P)                (r5 shipped)
  B  no repartition, plain AQE coalesce          (r4 shipped)
  C  persist cand + count, repartition only when candidates/core exceeds
     a floor (surgical: skew keeps the floor, uniform skips it)
  D  persist cand + count, broadcast the candidates into the verify
     joins when small, repartition floor otherwise

OUTCOME (round 6, 3 interleaved reps, 32g heap, 150k docs): A wins —
uniform 30x best-of A=7.6s C=8.7s D=13.3s B=23.8s; Zipf 30x
A=14.5s B=13.8s D=18.0s; Zipf 10x A=7.4s B=14.8s. B (removing the
floor) is 2-3x worse at 30x, D loses because its second verify join
still shuffles candidate rows with shingle arrays attached, and C's
extra count job buys nothing over A. The r5 "regression" reproduced
only under interleaved-lane load and was JIT code-cache eviction
(session.py now sets -XX:ReservedCodeCacheSize=512m); the shipped
operator keeps form A. Numbers recorded in BENCH_DETAIL
notes.near_dedup_ab_r6.

Usage: python scripts/ab_near_dedup.py [reps]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import TREND_FACTORS, _synth_corpus, _synth_corpus_zipf  # noqa: E402
from cc_mapreducer_spark.operators.dedup import (  # noqa: E402
    NEAR_DUP_JACCARD,
    minhash_bands,
    shingle_sets,
)
from cc_mapreducer_spark.session import get_spark  # noqa: E402


def variant(spark: SparkSession, sf_dir: str, mode: str) -> DataFrame:
    sets = shingle_sets(spark, sf_dir).filter(F.size("ss") > 0).persist()
    bands = minhash_bands(sets).select("doc_id", "band", "sig")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    par = spark.sparkContext.defaultParallelism
    broadcast_cand = False
    if mode == "A":
        cand = cand.repartition(par)
    elif mode == "C":
        cand = cand.persist()
        n = cand.count()
        if n > 64 * par:
            cand = cand.repartition(par)
    elif mode == "D":
        cand = cand.persist()
        n = cand.count()
        if n <= 2_000_000:
            broadcast_cand = True
        else:
            cand = cand.repartition(par)
    x = sets.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("ss_a"))
    y = sets.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("ss_b"))
    if broadcast_cand:
        verified = (
            x.join(F.broadcast(cand), "doc_a")
            .join(y, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                (
                    F.size(F.array_intersect("ss_a", "ss_b")).cast("double")
                    / F.size(F.array_union("ss_a", "ss_b"))
                ).alias("jaccard"),
            )
        )
        return verified.filter(F.col("jaccard") >= NEAR_DUP_JACCARD)
    verified = (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("ss_a", "ss_b")).cast("double")
                / F.size(F.array_union("ss_a", "ss_b"))
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= NEAR_DUP_JACCARD)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab-near-dedup")
    base = 5000  # sf0.1 documents row count
    tmp = tempfile.mkdtemp(prefix="ab_nd_")
    cells: dict[tuple, list[float]] = {}
    try:
        for k in TREND_FACTORS:
            os.makedirs(f"{tmp}/u{k}", exist_ok=True)
            _synth_corpus(f"{tmp}/u{k}", base * k, base * k, seed=1000 + k)
            os.makedirs(f"{tmp}/z{k}", exist_ok=True)
            _synth_corpus_zipf(f"{tmp}/z{k}", base * k, seed=2000 + k)
        for r in range(reps):
            spark.sparkContext._jvm.System.gc()
            for corpus in ("u", "z"):
                for k in TREND_FACTORS:
                    d = f"{tmp}/{corpus}{k}"
                    for mode in ("A", "B", "C"):
                        t0 = time.perf_counter()
                        variant(spark, d, mode).write.mode("overwrite").format(
                            "noop"
                        ).save()
                        dt = time.perf_counter() - t0
                        cells.setdefault((corpus, k, mode), []).append(dt)
                        spark.catalog.clearCache()
                        print(
                            f"rep{r} {corpus}x{k} {mode}: {dt:.2f}s", flush=True
                        )
        print("\n=== best-of ===")
        for corpus in ("u", "z"):
            for k in TREND_FACTORS:
                row = " ".join(
                    f"{m}={min(cells[(corpus, k, m)]):.2f}s" for m in "ABC"
                )
                print(f"{corpus}x{k}: {row}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

# Variant D (appended during the round-6 session): size-aware strategy pin —
# persist+count cand, then BROADCAST it into the verify joins when small
# (zero shuffle of the big shingle table, the fast mode AQE sometimes finds)
# else repartition(P) for the parallelism floor (the 100 TB-scale mode).
