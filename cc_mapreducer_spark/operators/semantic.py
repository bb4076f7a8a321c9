"""SemDeDup-style semantic deduplication over the embeddings table
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", 2023 — public method): partition the corpus into
centroid cells, then inside each cell drop every vector that is
semantically redundant with a kept lower-id vector.

Where near_dup_embeddings (operators/similarity.py) finds NEAR-IDENTICAL
vectors (cosine >= 0.35) with LSH recall, semantic dedup prunes at a much
LOWER similarity bar (eps = 0.25 here) where LSH recall collapses — the
published method therefore scopes the quadratic pair comparison to
k-means cells and bounds cell size by growing k with the corpus.

Scale shape:
- cell assignment: zero-shuffle map — one Arrow-batched numpy argmax per
  batch against the centroid pool riding in the closure (first-max =
  deterministic tie-break, bit-compatible with the all-built-ins
  whole-stage-codegen scoring expression kept behind literal_expr=True —
  equality pinned in tests; the interpreted HOF fold measured ~3x slower
  end-to-end, hence the matmul default).
- within-cell keeper election: ONE shuffle keyed by cell, then one
  blocked numpy matmul per cell group (applyInPandas) emitting is_kept
  directly — no occupancy² pair rows, no self-join. n_cells_for(n) keeps
  expected cell occupancy <= _CELL_TARGET rows, so within-cell work grows
  ~linearly in n (same sizing discipline as near_dup_bits_for). The
  literal pool caps at 64 cells ~ 4k rows at target occupancy — past
  that, extend the seeded pool (centroids are literals, so the DuckDB
  oracle stays verbatim-mirrorable at any k), or swap in the trained IVF
  codebook (similarity.py:ivf_centroids) which is the production path:
  train k ≈ n/_CELL_TARGET centroids offline on a sample, broadcast,
  assignment stays this exact distributed plan.

Keeper policy ("kept lower-id" rather than the paper's greedy sweep): a
vector is dropped iff SOME lower-vec_id vector in its cell has
cosine >= eps with it. The paper's sequential greedy (re-check against
survivors only) cannot be expressed as one parallel pass; the lower-id
rule is order-free, strictly more aggressive (drops a superset), and
deterministic under retries — the right trade for a distributed pruning
stage, and exactly hashable cross-engine.

Determinism: centroids are unit-normalized seeded Gaussians frozen to 6dp
literals in BOTH engines; all dot products round to the shared 9dp grid
before any compare — the grid that absorbs numpy-SIMD vs sequential-fold
last-ulp drift (same policy as similarity's matmul scoring; parity holds
at all three SFs by sweep).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.operators.similarity import _ROUND, _duck_dot
from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table

_SEM_EPS = 0.25
_CELL_TARGET = 64    # target rows per cell
_POOL_K = 64         # literal centroid pool (grows with corpus at scale)
_CELL_STEPS = (8, 16, 32, 64)

# Unit-normalized seeded Gaussian centroids, frozen to 6dp literals.
# Seed 7 is disjoint from the hyperplane pool's seed 42 — sharing draws
# would correlate cell boundaries with LSH buckets.
_pool = np.random.RandomState(7).randn(_POOL_K, 64)
_CENTROIDS = np.round(_pool / np.linalg.norm(_pool, axis=1, keepdims=True), 6)


def n_cells_for(n_rows: int) -> int:
    """Smallest step count c with n_rows <= _CELL_TARGET * c — integer
    comparisons only, so the DuckDB CASE chain reproduces it exactly."""
    for c in _CELL_STEPS:
        if n_rows <= _CELL_TARGET * c:
            return c
    return _CELL_STEPS[-1]


def _n_cells_duck() -> str:
    cases = " ".join(
        f"WHEN count(*) <= {_CELL_TARGET * c} THEN {c}" for c in _CELL_STEPS[:-1]
    )
    return f"SELECT CASE {cases} ELSE {_CELL_STEPS[-1]} END AS n_cells FROM embeddings"


_SPARK_DOT = (
    "aggregate(zip_with(embedding, {cent}, (x, y) -> cast(x as double) * y),"
    " 0D, (acc, v) -> acc + v)"
)


def _spark_centroid(k: int) -> str:
    vals = ", ".join(f"{float(v)!r}D" for v in _CENTROIDS[k])
    return f"array({vals})"


def _duck_centroid(k: int) -> str:
    vals = ", ".join(repr(float(v)) for v in _CENTROIDS[k])
    return f"([{vals}]::DOUBLE[])"


def _scores_spark() -> F.Column:
    return F.array(
        *[
            F.round(F.expr(_SPARK_DOT.format(cent=_spark_centroid(k))), _ROUND)
            for k in range(_POOL_K)
        ]
    )


def _scores_duck() -> str:
    return "[" + ", ".join(
        f"round({_duck_dot('embedding', _duck_centroid(k))}, {_ROUND})"
        for k in range(_POOL_K)
    ) + "]"


_SEMANTIC_SQL = f"""
WITH p AS (
    {_n_cells_duck()}
), scored AS (
    SELECT vec_id, embedding, {_scores_duck()} AS scores FROM embeddings
), assign AS (
    SELECT vec_id, embedding,
           CAST(list_position(scores[1:n_cells], list_max(scores[1:n_cells])) - 1 AS INT) AS cell
    FROM scored CROSS JOIN p
), dropped AS (
    SELECT DISTINCT b.vec_id
    FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE round({_duck_dot("a.embedding", "b.embedding")}
            / (sqrt({_duck_dot("a.embedding", "a.embedding")})
               * sqrt({_duck_dot("b.embedding", "b.embedding")})), {_ROUND}) >= {_SEM_EPS}
)
SELECT a.vec_id, a.cell, d.vec_id IS NULL AS is_kept
FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vec_id
"""


def _assign_cells_trained(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Distributed cell assignment against an arbitrary-k trained
    codebook: one numpy argmax per Arrow batch (the k x dim matrix rides
    into the closure — a few MB even at k=100k, the standard broadcast).
    First-max tie-break matches np.argmax == array_position semantics."""
    import pandas as pd

    # used exactly as given — callers pass unit-normalized centroids
    # (argmax dot == argmax cosine only when rows share a norm), and NOT
    # re-normalizing here keeps the pool-codebook path bit-compatible
    # with the literal-expression path (scores land on the same 9dp grid)
    cent = np.asarray(centroids, dtype=np.float64)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].map(lambda a: np.asarray(a, dtype=np.float64)).values)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values,
                    "embedding": pdf["embedding"].values,
                    "cell": np.argmax(np.round(m @ cent.T, 9), axis=1).astype("int32"),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, embedding array<double>, cell int"
    )


def _cell_keeper(pdf):
    """Per-cell keeper election, one Arrow group per cell: ids sorted
    ascending, vector j dropped iff SOME lower-id i has
    round(cosine, 9) >= eps — identical pair semantics to the former
    within-cell self-join, but ONE blocked matmul per cell instead of
    occupancy² pair rows through a scalar UDF (measured 5.5s -> sub-2s
    on the sf0.1 bench for the registered query). Column blocks bound
    memory to occupancy x 2048 on pathological hot cells; cosine
    arithmetic matches similarity._cosine_pair_fn (numpy dot / norm
    product, 9dp round — the grid that already absorbs fold-vs-SIMD
    last-ulp drift against the DuckDB oracle)."""
    import pandas as pd

    order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
    ids = pdf["vec_id"].to_numpy()[order]
    m = np.stack(
        [np.asarray(v, dtype=np.float64) for v in pdf["embedding"].to_numpy()[order]]
    )
    norms = np.linalg.norm(m, axis=1)
    n = len(ids)
    kept = np.ones(n, dtype=bool)
    B = 2048
    for s in range(1, n, B):
        e = min(n, s + B)
        cos = np.round(
            (m[:e] @ m[s:e].T) / np.outer(norms[:e], norms[s:e]), 9
        )
        rows = np.arange(e)[:, None]
        cols = np.arange(s, e)[None, :]
        kept[s:e] &= ~((cos >= _SEM_EPS) & (rows < cols)).any(axis=0)
    return pd.DataFrame(
        {"vec_id": ids, "cell": pdf["cell"].to_numpy()[order], "is_kept": kept}
    )


def semantic_dedup(
    emb: DataFrame,
    n_rows: int | None = None,
    centroids: np.ndarray | None = None,
    literal_expr: bool = False,
) -> DataFrame:
    """(vec_id, cell, is_kept) for any (vec_id, embedding) frame — the
    full corpus labeled, so a consumer filters ``WHERE is_kept``.

    ``centroids=None`` assigns against the seeded literal pool (capped
    at _POOL_K cells; the DuckDB oracle mirrors it verbatim). Pass a
    TRAINED codebook (e.g. k-means on a sample, as
    similarity.py:ivf_centroids does) for the production path:
    arbitrary k, so cell occupancy stays bounded at any corpus size.

    Both paths assign via the Arrow-batched argmax (one numpy matmul
    per batch); ``literal_expr=True`` forces the all-built-ins
    whole-stage-codegen scoring expression instead — kept as the
    UDF-free reference implementation, and tests pin the two
    assignments equal on the pool codebook. Default is the matmul: the
    interpreted HOF fold evaluates _POOL_K aggregates per row and
    measured ~3x slower end-to-end on the registered query."""
    if centroids is not None:
        assign = _assign_cells_trained(emb, centroids)
    else:
        if n_rows is None:
            n_rows = emb.count()  # count-star over parquet: metadata-cheap
        n_cells = n_cells_for(n_rows)
        if literal_expr:
            scores = _scores_spark()
            trimmed = F.slice(scores, 1, n_cells)
            assign = emb.select(
                "vec_id",
                "embedding",
                (F.array_position(trimmed, F.array_max(trimmed)) - 1)
                .cast("int")
                .alias("cell"),
            )
        else:
            assign = _assign_cells_trained(emb, _CENTROIDS[:n_cells])
    return assign.groupBy("cell").applyInPandas(
        _cell_keeper, "vec_id long, cell int, is_kept boolean"
    )


@register("semantic_dedup_embeddings", oracle=_SEMANTIC_SQL)
def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface: semantic dedup over the embeddings table."""
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb)
