"""KMV / theta sketches: fixed-size summaries that answer "how many
distinct?" and "how much do two corpora overlap?" WITHOUT the join.

At 100 TB the first question about two crawls is whether deduping them
against each other is worth the shuffle. A KMV sketch (k minimum
values; Bar-Yossef et al. 2002) keeps the k smallest hash values of a
set — a few KB per corpus regardless of corpus size — and from it:

  distinct estimate   (k-1) / u_k          (u_k = k-th smallest hash,
                                            normalized to [0,1))
  set operations      the theta-sketch framework (Dasgupta et al.,
                      DataSketches): cut BOTH sketches at
                      theta = min(theta_A, theta_B); surviving hashes
                      are a uniform sample of the union, so
                      |A∩B| ~= |{h in both, h < theta}| / theta and
                      Jaccard is the ratio of surviving counts.

Everything here is DETERMINISTIC: the element hash is the md5-48
prefix (portable across engines, the same key discipline as
operators/winnow.py), so the DuckDB oracle reproduces every estimate
bit-for-bit — these queries pin the sketch CONTRACT (exact math on the
k-minimum structure), not a statistical tolerance.

Scale shape: one distinct-shuffle over (source, shingle) builds all
sketches in one pass; per-group k-smallest runs through grouped_topk
(operators/sampling.py) so a dominant source never funnels through one
sorter; sketches are model-sized thereafter (k rows per source — the
pair analysis is broadcast work). The exact-Jaccard comparison legs
are the expensive path the sketch exists to avoid; they are computed
here as accuracy witnesses, which the fixture scale affords.

No counterpart in the reference (435-line anagram pipeline); extends
the dedup-planning toolkit (SURVEY §2.8) next to HLL/CMS/Bloom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.operators.sampling import grouped_topk
from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table, spread

K = 128  # sketch size: ~1/sqrt(k-1) ~= 9% relative error
_H_SPACE = float(1 << 48)  # md5-48 hash universe size

# 3-word shingles over [a-z]+ tokens — the dedup family's shared
# element definition (operators/dedup.py), re-keyed per SOURCE here.
_TOKS = (
    "filter(split(regexp_replace(lower(text), '[^a-z]+', ' '), ' '), "
    "w -> w != '')"
)


def _source_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (source, shingle-hash) pairs: h is the md5-48 prefix of
    the shingle, the portable integer the whole module keys on. One
    distinct-shuffle; shingle strings never travel further."""
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select(
        "doc_id", "source", F.posexplode(F.expr(_TOKS)).alias("pos", "word")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    w2 = F.lead("word", 2).over(win)
    shingles = words.select(
        "source",
        F.concat_ws(
            " ", "word", F.lead("word", 1).over(win), w2
        ).alias("s"),
        w2.alias("w2"),
    ).filter(F.col("w2").isNotNull())
    return shingles.select(
        "source",
        F.conv(F.substring(F.md5("s"), 1, 12), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()


def kmv_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, h) rows of each source's KMV sketch: the K smallest
    distinct hashes, exact per-group k-minimum via the sharded two-pass
    top-k (skew-immune — see grouped_topk)."""
    sh = _source_shingles(spark, sf_dir)
    return grouped_topk(
        sh, "source", [F.col("h").asc()], K, shard_key="h"
    ).select("source", "h")


_DUCK_SHINGLE_H = """
WITH dtoks AS (
    SELECT doc_id, source,
           list_filter(string_split(
               regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' '),
               w -> w != '') AS t
    FROM documents
), dsh AS (
    SELECT DISTINCT source,
           ('0x' || substr(md5(s), 1, 12))::BIGINT AS h
    FROM dtoks,
         unnest([array_to_string(t[i:i+2], ' ')
                 for i in range(1, len(t) - 1)]) AS u(s)
), sk AS (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM dsh
)
"""

_KMV_CARD_SQL = f"""
{_DUCK_SHINGLE_H}, stats AS (
    SELECT source,
           count(*) AS n_exact,
           count(*) FILTER (WHERE rn <= {K}) AS n_sketch,
           max(h) FILTER (WHERE rn <= {K}) AS kth_h
    FROM sk GROUP BY source
)
SELECT source,
       CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_sketch AS BIGINT) AS n_sketch,
       CAST(kth_h AS BIGINT) AS kth_h,
       CASE WHEN n_sketch < {K} THEN CAST(n_sketch AS DOUBLE)
            ELSE ({K} - 1) * {_H_SPACE!r} / CAST(kth_h AS DOUBLE)
       END AS est_distinct
FROM stats
"""


@register("kmv_shingle_cardinality", oracle=_KMV_CARD_SQL, driver=False)
def kmv_shingle_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: exact distinct shingle count next to the KMV
    estimate (k-1)/u_k. When a source has fewer than K distinct
    elements the sketch IS the set and the estimate is exact — both
    branches exercised across the test scale factors. Every value is
    deterministic; the oracle reproduces the estimate bit-for-bit."""
    sh = _source_shingles(spark, sf_dir).localCheckpoint()
    exact = sh.groupBy("source").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    sk = grouped_topk(sh, "source", [F.col("h").asc()], K, shard_key="h")
    sketch_stats = sk.groupBy("source").agg(
        F.count("*").cast("long").alias("n_sketch"),
        F.max("h").cast("long").alias("kth_h"),
    )
    return exact.join(sketch_stats, "source").select(
        "source",
        "n_exact",
        "n_sketch",
        "kth_h",
        F.when(
            F.col("n_sketch") < K, F.col("n_sketch").cast("double")
        )
        .otherwise(
            F.lit(float(K - 1)) * F.lit(_H_SPACE)
            / F.col("kth_h").cast("double")
        )
        .alias("est_distinct"),
    )


_KMV_OVERLAP_SQL = f"""
{_DUCK_SHINGLE_H}, sketch AS (
    SELECT source, h FROM sk WHERE rn <= {K}
), st AS (
    SELECT source,
           count(*) AS n_sketch,
           CASE WHEN count(*) < {K} THEN CAST({1 << 48} AS BIGINT)
                ELSE max(h) END AS theta_h
    FROM sketch GROUP BY source
), pairs AS (
    SELECT a.source AS source_a, b.source AS source_b,
           least(a.theta_h, b.theta_h) AS theta_h
    FROM st a JOIN st b ON a.source < b.source
), surv AS (
    SELECT p.source_a, p.source_b, p.theta_h, s.h,
           count(*) AS sides
    FROM pairs p
    JOIN sketch s
      ON (s.source = p.source_a OR s.source = p.source_b)
     AND s.h < p.theta_h
    GROUP BY p.source_a, p.source_b, p.theta_h, s.h
), est AS (
    SELECT source_a, source_b, theta_h,
           count(*) AS union_surv,
           count(*) FILTER (WHERE sides = 2) AS inter_surv
    FROM surv GROUP BY source_a, source_b, theta_h
), exact AS (
    SELECT a.source AS source_a, b.source AS source_b,
           count(*) AS inter_exact
    FROM dsh a JOIN dsh b ON a.h = b.h AND a.source < b.source
    GROUP BY a.source, b.source
), sizes AS (
    SELECT source, count(*) AS n FROM dsh GROUP BY source
)
SELECT e.source_a, e.source_b,
       CAST(e.inter_surv AS BIGINT) AS inter_surv,
       CAST(e.union_surv AS BIGINT) AS union_surv,
       e.inter_surv * {_H_SPACE!r} / CAST(e.theta_h AS DOUBLE)
           AS est_intersection,
       CAST(e.inter_surv AS DOUBLE) / CAST(e.union_surv AS DOUBLE)
           AS est_jaccard,
       CAST(x.inter_exact AS BIGINT) AS inter_exact,
       CAST(x.inter_exact AS DOUBLE)
           / CAST(sa.n + sb.n - x.inter_exact AS DOUBLE) AS exact_jaccard
FROM est e
JOIN exact x ON x.source_a = e.source_a AND x.source_b = e.source_b
JOIN sizes sa ON sa.source = e.source_a
JOIN sizes sb ON sb.source = e.source_b
"""


@register("kmv_corpus_overlap", oracle=_KMV_OVERLAP_SQL, driver=False)
def kmv_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every source pair's overlap, estimated from sketches alone and
    compared against ground truth: theta-cut survivor counts, the
    intersection estimate |{h in both, h < theta}| / theta, Jaccard as
    the survivor ratio, and the exact intersection/Jaccard the sketch
    path never has to compute at scale. The sketch-side work after the
    one build pass touches only K rows per source (broadcast joins);
    the exact legs are the accuracy witnesses."""
    sh = _source_shingles(spark, sf_dir).localCheckpoint()
    sketch = grouped_topk(
        sh, "source", [F.col("h").asc()], K, shard_key="h"
    ).select("source", "h").localCheckpoint()
    st = sketch.groupBy("source").agg(
        F.count("*").alias("n_sketch"), F.max("h").alias("max_h")
    ).select(
        "source",
        F.when(F.col("n_sketch") < K, F.lit(1 << 48).cast("long"))
        .otherwise(F.col("max_h"))
        .alias("theta_h"),
    )
    pairs = (
        st.alias("a")
        .join(
            F.broadcast(st.alias("b")),
            F.col("a.source") < F.col("b.source"),
        )
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.least("a.theta_h", "b.theta_h").alias("theta_h"),
        )
    )
    surv = (
        pairs.join(
            F.broadcast(sketch),
            (
                (F.col("source") == F.col("source_a"))
                | (F.col("source") == F.col("source_b"))
            )
            & (F.col("h") < F.col("theta_h")),
        )
        .groupBy("source_a", "source_b", "theta_h", "h")
        .agg(F.count("*").alias("sides"))
    )
    est = surv.groupBy("source_a", "source_b", "theta_h").agg(
        F.count("*").cast("long").alias("union_surv"),
        F.count(F.when(F.col("sides") == 2, 1))
        .cast("long")
        .alias("inter_surv"),
    )
    inter_exact = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").cast("long").alias("inter_exact"))
    )
    sizes = sh.groupBy("source").agg(F.count("*").alias("n"))
    return (
        est.join(inter_exact, ["source_a", "source_b"])
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "inter_surv",
            "union_surv",
            (
                F.col("inter_surv").cast("double")
                * F.lit(_H_SPACE)
                / F.col("theta_h").cast("double")
            ).alias("est_intersection"),
            (
                F.col("inter_surv").cast("double")
                / F.col("union_surv").cast("double")
            ).alias("est_jaccard"),
            "inter_exact",
            (
                F.col("inter_exact").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter_exact")).cast(
                    "double"
                )
            ).alias("exact_jaccard"),
        )
    )


def kmv_overlap_sketch_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-lane variant of kmv_corpus_overlap WITHOUT the exact-
    Jaccard witness joins: what a 100 TB deployment actually runs —
    sketch build (one distinct-shuffle + grouped_topk) and the K-row
    pair analysis. The registered query keeps the exact legs because
    they are the accuracy evidence; the trend lane must time the scale
    path, not the witness the sketch exists to avoid (the
    near_dedup_minhash precedent, bench.py TREND_QUERIES)."""
    sh = _source_shingles(spark, sf_dir)
    sketch = grouped_topk(
        sh, "source", [F.col("h").asc()], K, shard_key="h"
    ).select("source", "h").localCheckpoint()
    st = sketch.groupBy("source").agg(
        F.count("*").alias("n_sketch"), F.max("h").alias("max_h")
    ).select(
        "source",
        F.when(F.col("n_sketch") < K, F.lit(1 << 48).cast("long"))
        .otherwise(F.col("max_h"))
        .alias("theta_h"),
    )
    pairs = (
        st.alias("a")
        .join(
            F.broadcast(st.alias("b")),
            F.col("a.source") < F.col("b.source"),
        )
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.least("a.theta_h", "b.theta_h").alias("theta_h"),
        )
    )
    surv = (
        pairs.join(
            F.broadcast(sketch),
            (
                (F.col("source") == F.col("source_a"))
                | (F.col("source") == F.col("source_b"))
            )
            & (F.col("h") < F.col("theta_h")),
        )
        .groupBy("source_a", "source_b", "theta_h", "h")
        .agg(F.count("*").alias("sides"))
    )
    est = surv.groupBy("source_a", "source_b", "theta_h").agg(
        F.count("*").cast("long").alias("union_surv"),
        F.count(F.when(F.col("sides") == 2, 1))
        .cast("long")
        .alias("inter_surv"),
    )
    return est.select(
        "source_a",
        "source_b",
        "inter_surv",
        "union_surv",
        (
            F.col("inter_surv").cast("double")
            * F.lit(_H_SPACE)
            / F.col("theta_h").cast("double")
        ).alias("est_intersection"),
        (
            F.col("inter_surv").cast("double")
            / F.col("union_surv").cast("double")
        ).alias("est_jaccard"),
    )
