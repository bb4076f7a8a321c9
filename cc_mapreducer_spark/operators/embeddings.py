"""Embedding compression: int8 scalar quantization.

Shrinks an embedding corpus 4x (float32 -> int8 + one float scale per
vector) — at 100 TB of vectors this is the difference between embeddings
fitting executor memory for similarity search or not. Pure built-in
expressions (transform / array_max), zero shuffle, DuckDB-parity-tested.

Rounding is floor(x/scale + 0.5) in BOTH engines rather than round():
engines disagree on banker's vs half-away rounding at exact .5
boundaries; floor(+0.5) ("half toward +inf") is bit-deterministic
everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def quantize_int8(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """(vec_id, embedding) -> (vec_id, scale, q) with q[i] =
    floor(embedding[i]/scale + 0.5) as tinyint and scale = max|x|/127.
    All-zero vectors get scale=0 and an all-zero q."""
    scale = (F.array_max(F.transform(F.col(col), lambda x: F.abs(x))) / F.lit(127.0)).alias(
        "scale"
    )
    with_scale = emb.select("vec_id", F.col(col), scale)
    q = F.when(
        F.col("scale") > 0,
        F.transform(
            F.col(col),
            lambda x: F.floor(x.cast("double") / F.col("scale") + F.lit(0.5)).cast("tinyint"),
        ),
    ).otherwise(F.transform(F.col(col), lambda x: F.lit(0).cast("tinyint")))
    return with_scale.select("vec_id", F.col("scale").cast("double").alias("scale"), q.alias("q"))


def dequantize(qdf: DataFrame) -> DataFrame:
    """(vec_id, scale, q) -> (vec_id, embedding array<double>): q[i]*scale."""
    return qdf.select(
        "vec_id",
        F.transform(F.col("q"), lambda v: v.cast("double") * F.col("scale")).alias("embedding"),
    )


def embedding_norm_outliers(
    emb: DataFrame, col: str = "embedding", lo_q: float = 0.01, hi_q: float = 0.99
) -> DataFrame:
    """Embedding-quality gate: flag vectors whose L2 norm falls outside
    the [lo_q, hi_q] norm quantiles — the cheap screen for corrupt,
    truncated, or mis-scaled vectors before they poison similarity
    search or clustering. Returns (vec_id, norm, is_outlier).

    Cross-engine determinism: the squared norm is the sequential
    ``aggregate(zip_with(...))`` fold, bit-identical to a DuckDB list
    comprehension (NOT the fast numpy path — a flipped low bit here
    could flip an is_outlier decision; see the similarity operators for
    when each is appropriate), and the thresholds use exact
    ``percentile``, which matches DuckDB's quantile_cont bit-for-bit.
    Scale shape: one pass for norms, a 2-value percentile aggregate
    broadcast back — the vectors themselves never shuffle."""
    sq = F.expr(
        f"aggregate(zip_with({col}, {col}, (x, y) -> cast(x as double) * cast(y as double)),"
        " 0D, (acc, v) -> acc + v)"
    )
    norms = emb.select("vec_id", F.sqrt(sq).alias("norm"))
    bounds = norms.agg(
        F.percentile("norm", F.lit(lo_q)).alias("__lo"),
        F.percentile("norm", F.lit(hi_q)).alias("__hi"),
    )
    return norms.crossJoin(F.broadcast(bounds)).select(
        "vec_id",
        "norm",
        ((F.col("norm") < F.col("__lo")) | (F.col("norm") > F.col("__hi"))).alias("is_outlier"),
    )


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (round 5)
# --------------------------------------------------------------------------
#
# Dimensionality reduction ahead of ANN/clustering: project d=64 vectors
# to k=16 with a dense ±1/sqrt(k) matrix (Achlioptas 2003: sign matrices
# satisfy the JL lemma with the same guarantees as Gaussian ones). The
# matrix is DERIVED, not drawn: sign(i, j) = +1 iff the first hex digit
# of md5("jl:i:j") < 8 — both engines (and the numpy replica in tests)
# rebuild the identical matrix from the string, so there is no runtime
# randomness and no weight artifact to ship.
#
# Plan shape: the projection is 16 literal-signed sum chains over the
# array elements in a FIXED order — one whole-stage-codegen projection,
# zero shuffle, nothing driver-side. Fixed order + double math makes the
# unrounded result bit-identical across engines (the sequential-fold
# rule the sign-LSH operators already follow); rounded to 6dp anyway.

_JL_D = 64
_JL_K = 16


def _jl_sign(i: int, j: int) -> int:
    import hashlib

    h = hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()
    return 1 if int(h[0], 16) < 8 else -1


def jl_sign_matrix():
    """(d, k) ±1 numpy matrix — the tests' replica entry point."""
    import numpy as np

    return np.array(
        [[_jl_sign(i, j) for j in range(_JL_K)] for i in range(_JL_D)],
        dtype=np.float64,
    )


def _jl_terms(j: int, elem_fmt: str) -> str:
    """The j-th output dim as a fixed-order signed sum chain — the ONE
    source of the sign/order logic; both engines' SQL is rendered from
    it. elem_fmt renders element i and may use ``{i}`` (0-based, Spark
    SQL array indexing) or ``{i1}`` (1-based, DuckDB)."""
    parts = []
    for i in range(_JL_D):
        s = "+" if _jl_sign(i, j) > 0 else "-"
        parts.append(f"{s} {elem_fmt.format(i=i, i1=i + 1)}")
    chain = " ".join(parts)
    return chain[2:] if chain.startswith("+ ") else chain


def _jl_sql() -> str:
    """DuckDB oracle: the same 16 fixed-order signed chains, 1-based
    element indexing."""
    cols = [
        f"round(({_jl_terms(j, 'CAST(embedding[{i1}] AS DOUBLE)')})"
        f" / sqrt({_JL_K}.0), 6) AS p{j}"
        for j in range(_JL_K)
    ]
    return "SELECT vec_id, " + ", ".join(cols) + " FROM embeddings"


def jl_project(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding[64]) -> (vec_id, p0..p15): the ±1/sqrt(k)
    projection as 16 codegen sum chains, zero shuffle. SQL's left-
    associative `a + b - c` parse is the same fixed fold order the
    DuckDB oracle renders from the shared _jl_terms chain."""
    cols = [F.col("vec_id")]
    for j in range(_JL_K):
        chain = _jl_terms(j, "CAST(embedding[{i}] AS DOUBLE)")
        cols.append(
            F.round(F.expr(chain) / F.lit(float(_JL_K) ** 0.5), 6).alias(
                f"p{j}"
            )
        )
    return emb.select(*cols)


def _register_jl():
    from cc_mapreducer_spark.registry import register
    from cc_mapreducer_spark.tables import load_table

    @register("embedding_jl_projection", oracle=_jl_sql(), driver=False)
    def embedding_jl_projection(spark, sf_dir: str) -> DataFrame:
        """JL sign-matrix projection of the embeddings table to 16
        dims — the dimensionality-reduction step ahead of ANN or
        clustering. One zero-shuffle codegen pass; oracle rebuilds the
        identical derived matrix. Distance-preservation (the JL
        guarantee this buys) is pinned statistically against the numpy
        replica in tests/test_embeddings_jl.py."""
        return jl_project(load_table(spark, sf_dir, "embeddings"))

    return embedding_jl_projection


embedding_jl_projection = _register_jl()
