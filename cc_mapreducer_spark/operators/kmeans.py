"""Distributed Lloyd's k-means over the embeddings table.

The ANN stack trains its codebooks driver-side on bounded samples
(similarity.py:ivf_centroids, pq.py) — right for k x dim tensors that
broadcast. This module is the complementary FULL-CORPUS trainer for
when the sample assumption fails (drifting corpora, tiny k, giant n):
classic distributed Lloyd's, the canonical Spark iterative algorithm.

Per iteration, ASSIGN and UPDATE are FUSED inside one Arrow batch pass
(_cell_partials): numpy argmax against the broadcast centroid tensor
(cosine on unit vectors, first-max tiebreak — the exact kernel
ivf_assignments uses), then per-cell count + per-dim sums computed in
the same batch. Only <= k tiny partial rows per batch return to the
JVM — the map-side combine of classic distributed Lloyd's. The unit-
normalized corpus is persisted once before the loop, so an iteration
costs exactly one in-memory scan + one Arrow JVM->Python transfer and
a bounded collect; driver state is the k x dim tensor — nothing grows
with the corpus.

(The r5 form returned every (vec_id, embedding, cell) row to the JVM
and re-aggregated with 64 F.sum columns: a full corpus Arrow
round-trip BOTH ways plus a re-read of parquet per iteration — the
iterative trend lane measured 14.6s/iteration at 150k x 64, orders of
magnitude above the ~40 MB of arithmetic. VERDICT r5 item 2.)

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


def _cell_partials(emb: DataFrame, cent: np.ndarray) -> DataFrame:
    """ASSIGN + UPDATE fused per Arrow batch: argmax against the
    broadcast centroids, then per-cell count and per-dimension sums
    folded in numpy INSIDE the batch — <= k partial rows per batch
    return to the JVM (map-side combine). Cells with no members in a
    batch are omitted rather than sent as zero rows."""
    c = np.asarray(cent, dtype=np.float64)
    k = c.shape[0]

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = _unit(np.stack(pdf["embedding"].values).astype(np.float64))
            a = np.argmax(x @ c.T, axis=1)
            n = np.bincount(a, minlength=k)
            live = np.nonzero(n)[0]
            yield pd.DataFrame(
                {
                    "cell": live.astype(np.int32),
                    "n": n[live].astype(np.int64),
                    "s": [x[a == j].sum(axis=0).tolist() for j in live],
                }
            )

    return emb.select("embedding").mapInPandas(
        run, "cell int, n long, s array<double>"
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
    # Persist the RAW embedding column for the loop (iterations re-scan
    # memory, not parquet); unit-normalization happens in numpy inside
    # each batch (_unit is one vectorized divide, ~free) — the previous
    # JVM-side transform(...) higher-order function is interpreted
    # per-element and its persist alone measured 29s at 150k x 64.
    loop_emb = emb.select("embedding").persist()
    try:
        for _ in range(iters):
            parts = _cell_partials(loop_emb, cent).collect()
            n = np.zeros(cent.shape[0], dtype=np.float64)
            s = np.zeros_like(cent)
            for r in parts:
                n[r["cell"]] += r["n"]
                s[r["cell"]] += np.asarray(r["s"], dtype=np.float64)
            new = cent.copy()
            for j in np.nonzero(n)[0]:
                m = s[j] / n[j]
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    new[j] = m / nrm
            cent = new
    finally:
        loop_emb.unpersist()
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
