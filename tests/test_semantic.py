"""Semantic dedup (SemDeDup-style): sizing discipline, planted-duplicate
recovery, and keeper-policy pins. Cross-engine parity at sf0.01 is covered
by test_oracle_parity[semantic_dedup_embeddings]."""

from __future__ import annotations

import numpy as np
import pytest

from cc_mapreducer_spark.operators.semantic import (
    _CELL_TARGET,
    _CENTROIDS,
    _POOL_K,
    n_cells_for,
    semantic_dedup,
)


def test_cell_count_grows_with_corpus():
    """The structural 100x guarantee: cells scale with the corpus so
    within-cell pair counts stay ~linear (no fixed-cell ceiling below the
    documented pool cap)."""
    assert n_cells_for(100) == 8
    assert n_cells_for(_CELL_TARGET * 8) == 8
    assert n_cells_for(_CELL_TARGET * 8 + 1) == 16
    assert n_cells_for(_CELL_TARGET * 16 + 1) == 32
    assert n_cells_for(_CELL_TARGET * 32 + 1) == 64
    assert n_cells_for(10**9) == _POOL_K  # pool cap — extend pool past this


def test_centroids_unit_norm():
    norms = np.linalg.norm(_CENTROIDS, axis=1)
    assert np.all(np.abs(norms - 1.0) < 1e-4)


@pytest.fixture()
def emb_frame(spark):
    """60 vectors: 20 seeded random + planted near-copies and an orthogonal
    control, as a (vec_id, embedding) frame."""
    rng = np.random.RandomState(11)
    base = rng.randn(20, 64)

    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # planted semantic duplicates of vectors 0..4: tiny perturbation ->
    # cosine ~0.999, must share the 0..4 vector's cell and be dropped
    for j in range(5):
        dup = base[j] + 0.01 * rng.randn(64)
        rows.append((100 + j, [float(x) for x in dup]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_planted_duplicates_dropped_originals_kept(emb_frame):
    out = {r["vec_id"]: (r["cell"], r["is_kept"]) for r in semantic_dedup(emb_frame).collect()}
    assert len(out) == 25  # full corpus labeled
    for j in range(5):
        cell_orig, kept_orig = out[j]
        cell_dup, kept_dup = out[100 + j]
        assert cell_orig == cell_dup, f"planted dup {j} landed in a different cell"
        assert kept_orig, f"lower-id original {j} must be the keeper"
        assert not kept_dup, f"planted dup of {j} must be dropped"


def test_trained_codebook_path_matches_literal_pool(emb_frame):
    """The production path (arbitrary-k trained codebook, Arrow-batched
    argmax) must reproduce the literal-pool path exactly when handed the
    same centroids — proving the two assignment engines share tie-break
    and rounding semantics, so swapping in a trained k = n/_CELL_TARGET
    codebook at scale changes capacity, not meaning."""
    n_cells = n_cells_for(emb_frame.count())
    lit = sorted(
        map(tuple, semantic_dedup(emb_frame, literal_expr=True).collect())
    )
    trained = sorted(
        map(tuple, semantic_dedup(emb_frame, centroids=_CENTROIDS[:n_cells]).collect())
    )
    assert lit == trained


def test_trained_codebook_scales_cell_count(emb_frame):
    """With k beyond the literal pool, assignment must use every cell —
    the capacity knob the 100 TB path turns."""
    rng = np.random.RandomState(3)
    big = rng.randn(128, 64)
    big = big / np.linalg.norm(big, axis=1, keepdims=True)
    out = semantic_dedup(emb_frame, centroids=big).collect()
    cells = {r["cell"] for r in out}
    assert max(cells) >= 64  # beyond the literal pool's ceiling
    assert len(out) == 25


def test_lower_id_rule_is_order_free(emb_frame):
    """Repartitioning must not change the keeper set (determinism under
    retries / different parallelism)."""
    a = sorted(map(tuple, semantic_dedup(emb_frame).collect()))
    b = sorted(map(tuple, semantic_dedup(emb_frame.repartition(7)).collect()))
    assert a == b
