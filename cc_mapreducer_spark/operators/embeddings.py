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
