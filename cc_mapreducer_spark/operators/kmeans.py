"""Distributed Lloyd's k-means over the embeddings table.

The ANN stack trains its codebooks driver-side on bounded samples
(similarity.py:ivf_centroids, pq.py) — right for k x dim tensors that
broadcast. This module is the complementary FULL-CORPUS trainer for
when the sample assumption fails (drifting corpora, tiny k, giant n):
classic distributed Lloyd's, the canonical Spark iterative algorithm.

Per iteration:
  * ASSIGN — one Arrow-batched numpy argmax per batch against the
    broadcast centroid tensor (the exact kernel ivf_assignments uses;
    cosine on unit vectors, first-max tiebreak);
  * UPDATE — per-dimension sums as 64 plain F.sum columns over a
    k-key groupBy (the simhash 64-column trick: all codegen, partial
    aggregation makes the shuffle k rows x 64 doubles per task), then
    a k-row collect renormalizes driver-side.

So each iteration costs one scan + one bounded shuffle (k keys), and
driver state is the k x dim tensor — nothing grows with the corpus.
Empty cells keep their previous centroid (the standard fix, matching
the numpy replica).

Determinism & verification: float iteration through and through, so —
the item_pagerank / train_lang_classifier policy — the registered
query is rows-only and pytest pins the trainer against a bit-faithful
dense numpy replica (same init, same update rule) at 1e-7, plus
monotone inertia. Init is the first k vec_ids' unit vectors: fully
deterministic, no seed dependence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table

_K = 8
_ITERS = 10
_DIM = 64


def _unit(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.where(n > 0, n, 1.0)


def assign_cells(emb: DataFrame, cent: np.ndarray) -> DataFrame:
    """(vec_id, cell, embedding): Arrow-batched cosine argmax against
    the broadcast centroid tensor — numpy's argmax takes the FIRST
    maximum, which is the deterministic tiebreak the numpy replica
    shares."""
    c = np.asarray(cent, dtype=np.float64)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = _unit(np.stack(pdf["embedding"].values).astype(np.float64))
            pdf = pdf[["vec_id", "embedding"]].copy()
            pdf["cell"] = np.argmax(x @ c.T, axis=1).astype("int32")
            yield pdf

    return emb.select("vec_id", "embedding").mapInPandas(
        run, "vec_id long, embedding array<double>, cell int"
    )


def kmeans_train(emb: DataFrame, k: int = _K, iters: int = _ITERS) -> np.ndarray:
    """Distributed Lloyd's: returns the k x dim unit-normalized centroid
    tensor. See module docstring for the per-iteration plan shape."""
    first = (
        emb.orderBy("vec_id").limit(k).select("embedding").collect()
    )
    if not first:
        return np.zeros((0, _DIM))
    cent = _unit(np.stack([np.asarray(r[0], dtype=np.float64) for r in first]))
    # normalize once so every iteration's assignment scan reads unit
    # vectors (cosine == dot); sums of unit vectors renormalize fine
    dim = cent.shape[1]
    unit_emb = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, v -> v / sqrt("
            "aggregate(embedding, 0.0D, (a, x) -> a + x * x)))"
        ).alias("embedding"),
    )
    for _ in range(iters):
        assigned = assign_cells(unit_emb, cent)
        sums = (
            assigned.groupBy("cell")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.col("embedding")[i]).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new = cent.copy()
        for r in sums:
            m = np.array([r[f"s{i}"] for i in range(dim)]) / r["n"]
            nrm = np.linalg.norm(m)
            if nrm > 0:
                new[r["cell"]] = m / nrm
        cent = new
    return cent


def kmeans_inertia(emb: DataFrame, cent: np.ndarray) -> float:
    """Mean cosine distance (1 - dot) to the assigned centroid — the
    quantity Lloyd's monotonically improves on unit vectors."""
    c = np.asarray(cent, dtype=np.float64)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = _unit(np.stack(pdf["embedding"].values).astype(np.float64))
            d = x @ c.T
            yield pd.DataFrame(
                {"s": [float((1.0 - d.max(axis=1)).sum())], "n": [len(pdf)]}
            )

    parts = emb.select("embedding").mapInPandas(run, "s double, n long")
    row = parts.agg(F.sum("s").alias("s"), F.sum("n").alias("n")).collect()[0]
    return float(row["s"] / row["n"]) if row["n"] else 0.0


@register("kmeans_cluster_sizes", driver=False)  # float iteration: numpy-checked in pytest
def kmeans_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train k={_K} distributed Lloyd's on the embeddings table and
    return per-cluster member counts — rows-only by the item_pagerank
    policy (float argmax assignments are not stably hashable across
    engines); the trainer itself is pinned to a dense numpy replica in
    tests/test_kmeans.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    cent = kmeans_train(emb)
    if cent.shape[0] == 0:
        return spark.createDataFrame([], "cell int, n_members bigint")
    return (
        assign_cells(emb, cent)
        .groupBy("cell")
        .agg(F.count("*").cast("bigint").alias("n_members"))
    )
