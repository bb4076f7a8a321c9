"""Embedding similarity search (SURVEY.md §2.8; driver north-star).

Brute-force cosine top-k is the exact baseline; the sign-LSH variant is the
scale path (bucketed candidate generation). All vector math uses built-in
higher-order functions (`zip_with` + `aggregate` fold) — a sequential
left-fold over array elements in both engines, so dot products and norms
are bit-identical to the DuckDB oracle (verified) and rankings are
deterministic without rounding.

Scale notes (100 TB of embeddings): brute force is a broadcast of the
query block against a scan of the corpus — O(n_queries * n_corpus) FLOPs
but embarrassingly parallel with zero shuffle (the only exchange is the
final per-query top-k, k rows per query per partition thanks to
TakeOrdered-style window + filter). The sign-LSH variant cuts the scanned
fraction ~2^-bits; its shuffle key is the bucket signature (near-uniform).
For real ANN (IVF/HNSW) you'd precompute a codebook — out of scope, the
bucketed plan shape is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
)


def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)"
        f" for i in range(1, len({a}) + 1)])"
    )


_N_QUERIES = 5
_TOPK = 10

_BRUTE_SQL = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}
), scored AS (
    SELECT q.query_id, e.vec_id,
           {_duck_dot("qe", "e.embedding")}
             / (sqrt({_duck_dot("qe", "qe")}) * sqrt({_duck_dot("e.embedding", "e.embedding")}))
             AS cosine
    FROM q CROSS JOIN embeddings e
    WHERE e.vec_id <> q.query_id
), ranked AS (
    SELECT query_id, vec_id, cosine,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
    FROM scored
)
SELECT query_id, vec_id, cosine, CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= {_TOPK}
"""


@register("similarity_topk_bruteforce", oracle=_BRUTE_SQL)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine: broadcast the query block, scan the corpus once,
    per-query window top-k."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (
                F.expr(_DOT.format(a="qe", b="embedding"))
                / (
                    F.sqrt(F.expr(_DOT.format(a="qe", b="qe")))
                    * F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.select("query_id", "vec_id", "cosine", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _TOPK)
    )


_SIGN_BITS = 6

_SIGN_BUCKET_DUCK = (
    "array_to_string([CASE WHEN embedding[i] >= 0 THEN '1' ELSE '0' END"
    f" for i in range(1, {_SIGN_BITS + 1})], '')"
)
_SIGN_BUCKET_SPARK = (
    f"array_join(transform(sequence(1, {_SIGN_BITS}),"
    " i -> CASE WHEN element_at(embedding, i) >= 0 THEN '1' ELSE '0' END), '')"
)

_ANN_SQL = f"""
WITH b AS (
    SELECT vec_id, embedding, {_SIGN_BUCKET_DUCK} AS bucket FROM embeddings
), q AS (
    SELECT vec_id AS query_id, embedding AS qe, bucket FROM b WHERE vec_id < {_N_QUERIES}
), scored AS (
    SELECT q.query_id, e.vec_id,
           {_duck_dot("qe", "e.embedding")}
             / (sqrt({_duck_dot("qe", "qe")}) * sqrt({_duck_dot("e.embedding", "e.embedding")}))
             AS cosine
    FROM q JOIN b e ON e.bucket = q.bucket AND e.vec_id <> q.query_id
), ranked AS (
    SELECT query_id, vec_id, cosine,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
    FROM scored
)
SELECT query_id, vec_id, cosine, CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= {_TOPK}
"""


@register("similarity_topk_signlsh", oracle=_ANN_SQL)
def similarity_topk_signlsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: sign-LSH bucketing on the first 6 dimensions
    (a fixed hyperplane set) — candidates only from the query's bucket,
    then exact cosine within it. ~2^-6 of the corpus scanned per query;
    recall trades off against bits."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", F.expr(_SIGN_BUCKET_SPARK)
    )
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), "bucket"
    )
    scored = (
        emb.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (
                F.expr(_DOT.format(a="qe", b="embedding"))
                / (
                    F.sqrt(F.expr(_DOT.format(a="qe", b="qe")))
                    * F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.select("query_id", "vec_id", "cosine", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _TOPK)
    )


_EMB_NEAR_DUP_SQL = f"""
WITH b AS (
    SELECT vec_id, embedding, {_SIGN_BUCKET_DUCK} AS bucket FROM embeddings
)
SELECT a.vec_id AS vec_a, e.vec_id AS vec_b,
       {_duck_dot("a.embedding", "e.embedding")}
         / (sqrt({_duck_dot("a.embedding", "a.embedding")})
            * sqrt({_duck_dot("e.embedding", "e.embedding")})) AS cosine
FROM b a JOIN b e ON a.bucket = e.bucket AND a.vec_id < e.vec_id
WHERE {_duck_dot("a.embedding", "e.embedding")}
        / (sqrt({_duck_dot("a.embedding", "a.embedding")})
           * sqrt({_duck_dot("e.embedding", "e.embedding")})) >= 0.9
"""


@register("near_dup_embeddings", oracle=_EMB_NEAR_DUP_SQL)
def near_dup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-LSH bucket self-join
    (never n^2), exact cosine >= 0.9 within buckets."""
    b = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", F.expr(_SIGN_BUCKET_SPARK)
    )
    a = b.select("bucket", F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    e = b.select("bucket", F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = a.join(e, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    cosine = (
        F.expr(_DOT.format(a="ea", b="eb"))
        / (
            F.sqrt(F.expr(_DOT.format(a="ea", b="ea")))
            * F.sqrt(F.expr(_DOT.format(a="eb", b="eb")))
        )
    ).alias("cosine")
    return pairs.select("vec_a", "vec_b", cosine).filter(F.col("cosine") >= 0.9)
