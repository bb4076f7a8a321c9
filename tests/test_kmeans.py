"""Distributed Lloyd's k-means: iterate-path parity against a dense
numpy replica, monotone inertia, planted-cluster recovery, and the
bounded-shuffle claim (update groupBy key space == k)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from cc_mapreducer_spark.operators.kmeans import (
    _K,
    assign_cells,
    kmeans_inertia,
    kmeans_train,
)
from cc_mapreducer_spark.tables import load_table
from tests.conftest import SF_ORACLE


def _numpy_lloyds(x, k, iters):
    """Dense replica: same init (first k unit rows, quantized), same
    first-max argmax, same empty-cell rule, same renormalized means
    with the same q() step — but BLAS reductions (matmul, norm), so it
    is an independent implementation of the same recipe; allclose, not
    bit-equality, is the contract (the bit-exact check is the DuckDB
    oracle)."""
    q = lambda a: np.floor(a * 1e9 + 0.5) / 1e9  # noqa: E731
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    cent = q(x[:k].copy())
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        new = cent.copy()
        for c in range(k):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    new[c] = q(m / n)
        cent = new
    return cent


def _load_numpy(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").sort_by("vec_id")
    return np.stack(t["embedding"].to_pylist()).astype(np.float64)


def test_trainer_matches_numpy_replica(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    got = kmeans_train(emb, k=_K, iters=4)
    want = _numpy_lloyds(_load_numpy(SF_ORACLE), _K, 4)
    assert np.allclose(got, want, rtol=1e-7, atol=1e-9)


def test_inertia_monotone_under_iterations(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    prev = None
    for iters in (0, 2, 5):
        cent = kmeans_train(emb, k=_K, iters=iters)
        cur = kmeans_inertia(emb, cent)
        if prev is not None:
            assert cur <= prev + 1e-9, (iters, cur, prev)
        prev = cur


def test_recovers_planted_clusters(spark, tmp_path):
    # three tight planted directions -> k=3 must separate them exactly
    rng = np.random.RandomState(7)
    dirs = np.eye(64)[:3]
    vecs, labels = [], []
    for i in range(120):
        c = i % 3
        v = dirs[c] + 0.01 * rng.randn(64)
        vecs.append((v / np.linalg.norm(v)).tolist())
        labels.append(c)
    t = pa.table(
        {
            "vec_id": pa.array(range(120), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
        }
    )
    pq.write_table(t, f"{tmp_path}/embeddings.parquet")
    emb = load_table(spark, str(tmp_path), "embeddings")
    cent = kmeans_train(emb, k=3, iters=8)
    rows = assign_cells(emb, cent).select("vec_id", "cell").collect()
    got = {r["vec_id"]: r["cell"] for r in rows}
    # every planted class lands wholly in one distinct cell
    cells_per_class = [
        {got[i] for i in range(120) if labels[i] == c} for c in range(3)
    ]
    assert all(len(s) == 1 for s in cells_per_class)
    assert len(set().union(*cells_per_class)) == 3


def test_update_shuffle_is_k_keyed(spark):
    # the only corpus-wide aggregation groups by cell: <= k keys
    emb = load_table(spark, SF_ORACLE, "embeddings")
    cent = kmeans_train(emb, k=_K, iters=1)
    cells = assign_cells(emb, cent).groupBy("cell").count().collect()
    assert len(cells) <= _K


def test_empty_embeddings(spark, tmp_path):
    t = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float64())),
        }
    )
    pq.write_table(t, f"{tmp_path}/embeddings.parquet")
    from cc_mapreducer_spark.operators.kmeans import kmeans_cluster_sizes

    assert kmeans_cluster_sizes(spark, str(tmp_path)).count() == 0
