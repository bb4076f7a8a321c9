"""Deduplication operators for large-scale training-data pipelines
(SURVEY.md §2.8; driver north-star extensions).

Four families, all expressed with JVM built-ins (no Python in the hot
path), each generalizing a reference mechanism:

  exact        content-hash groupBy           — generalizes the reference's
                                                group_collect_distinct with
                                                signature = sha256(text)
  MinHash-LSH  shingle -> minhash -> band join — generalizes map_signature +
                                                hash_partition (SURVEY §2.8)
  SimHash      weighted bit-vote fingerprint
  n-gram       character-shingle Jaccard

Cross-engine portability: every hash is md5-derived. A minhash here is the
MIN of md5 hex strings over the shingle set under per-function salts —
lexicographic min over a uniformly-hashed space is a valid random
permutation minimum, needs no integer conversion, and is identical in Spark
and DuckDB. SimHash converts the first 8 md5 hex chars to a 32-bit int
(Spark `conv` == DuckDB '0x' cast — verified bit-equal).

Scale notes (100 TB):
  * exact dedup is one hash-keyed shuffle; sha256 collisions are
    negligible, so no byte-compare pass is needed.
  * LSH candidate generation self-joins on (band, signature) — the shuffle
    key is the band signature, cardinality ~ n_docs * n_bands, near-uniform
    (md5), so no skew salting; hot buckets (boilerplate docs) are the known
    pathology and AQE skew-join handles them.
  * pairwise verification only touches LSH candidates, never the n^2 space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table, spread

# --------------------------------------------------------------------------
# shared shingling (3-word shingles over [a-z]+ tokens, no stop-word removal)
# --------------------------------------------------------------------------

_SPARK_TOKS = "filter(split(regexp_replace(lower(text), '[^a-z]+', ' '), ' '), w -> w != '')"
_SPARK_SHINGLES = (
    "CASE WHEN size(t) >= 3 "
    "THEN transform(sequence(1, size(t) - 2), i -> concat_ws(' ', t[i-1], t[i], t[i+1])) "
    "ELSE CAST(array() AS array<string>) END"
)

_DUCK_SHINGLE_CTE = """
WITH dtoks AS (
    SELECT doc_id,
           list_filter(string_split(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' '),
                       w -> w != '') AS t
    FROM documents
), dshingles AS (
    SELECT doc_id,
           list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS ss
    FROM dtoks
)
"""


def shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id -> distinct 3-word shingle set (array<string>).

    Implementation note: built via posexplode + window `lead`s +
    collect_set instead of the per-row `transform(sequence(...))`
    higher-order function — HOF lambdas with array indexing run
    interpreted (outside whole-stage codegen) and measured ~6x slower;
    the window form stays vectorized and its one exchange is on doc_id,
    which downstream groupBys reuse. Only docs with >= 3 tokens appear
    (shorter docs have no 3-shingles)."""
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select("doc_id", F.posexplode(F.expr(_SPARK_TOKS)).alias("pos", "word"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    w2 = F.lead("word", 2).over(win)
    shingles = words.select(
        "doc_id",
        F.concat_ws(" ", "word", F.lead("word", 1).over(win), w2).alias("s"),
        w2.alias("w2"),
    ).filter(F.col("w2").isNotNull())
    return shingles.groupBy("doc_id").agg(F.collect_set("s").alias("ss"))


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

_EXACT_DEDUP_SQL = """
SELECT sha256(text) AS content_sha,
       min(doc_id) AS doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY sha256(text)
"""


@register("exact_dedup", oracle=_EXACT_DEDUP_SQL)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per content hash. One shuffle on
    the 256-bit hash; at 100 TB hash first so the shuffle moves 32-byte
    keys, not document bodies."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.sha2("text", 256).alias("content_sha")).agg(
        F.min("doc_id").alias("doc_id"),
        F.count("*").alias("n_copies"),
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dedup (K=8 hashes, 2 bands x 4 rows)
# --------------------------------------------------------------------------

# K=8 minhashes in 2 bands x 4 rows: candidate probability 1-(1-j^4)^2 —
# steep around the j>=0.7 near-duplicate regime, near-zero for j<0.3, so
# candidate volume stays tiny even on a low-entropy corpus.
_K = 8
_BANDS = [(0, 1, 2, 3), (4, 5, 6, 7)]

_MINHASH_AGGS_SQL = ",\n    ".join(
    f"min(md5('{i}:' || s)) AS m{i}" for i in range(_K)
)
_BANDS_SQL = "\n    UNION ALL\n    ".join(
    "SELECT doc_id, {bi} AS band, {sig} AS sig FROM mh".format(
        bi=bi, sig=" || ".join(f"m{r}" for r in rows)
    )
    for bi, rows in enumerate(_BANDS)
)

_NEAR_DEDUP_SQL = (
    _DUCK_SHINGLE_CTE
    + f"""
, sh AS (
    SELECT doc_id, unnest(ss) AS s FROM dshingles
), mh AS (
    SELECT doc_id,
    {_MINHASH_AGGS_SQL}
    FROM sh GROUP BY doc_id
), bands AS (
    {_BANDS_SQL}
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
), verified AS (
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(x.ss, y.ss)) AS DOUBLE)
             / len(list_distinct(x.ss || y.ss)) AS jaccard
    FROM cand c
    JOIN dshingles x ON x.doc_id = c.doc_a
    JOIN dshingles y ON y.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= 0.2
"""
)


@register("near_dedup_minhash", oracle=_NEAR_DEDUP_SQL)
def near_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dedup: shingle -> K=8 salted-md5 minhashes ->
    2 bands x 4 rows -> band-signature self-join -> exact-Jaccard verify.

    The minimum of md5(salt:shingle) hex strings is the minhash (string
    order over a uniform hash = random permutation min). Candidate pairs
    then get exact Jaccard on the shingle sets; only candidates are
    verified, never the full n^2 space."""
    # Materialize the shingle-set table once: three branches below (minhash
    # input + both verify sides) would otherwise re-tokenize the corpus —
    # at 100 TB this is an explicit parquet checkpoint, here a cache.
    sets = shingle_sets(spark, sf_dir).filter(F.size("ss") > 0).cache()
    sh = sets.select("doc_id", F.explode("ss").alias("s"))
    mh = sh.groupBy("doc_id").agg(
        *[F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"m{i}") for i in range(_K)]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat(*[F.col(f"m{r}") for r in rows]).alias("sig"),
            )
            for bi, rows in enumerate(_BANDS)
        ]
    )
    bands = mh.select("doc_id", F.explode(band_structs).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    a = bands.alias("a")
    b = bands.alias("b")
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
    x = sets.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("ss_a"))
    y = sets.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("ss_b"))
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
    return verified.filter(F.col("jaccard") >= 0.2)


# --------------------------------------------------------------------------
# SimHash fingerprint (32-bit, token-frequency weighted)
# --------------------------------------------------------------------------

_SIMHASH_SQL = """
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' '),
                              w -> w != '')) AS word
    FROM documents
), tokcnt AS (
    SELECT doc_id, ('0x' || substr(md5(word), 1, 8))::BIGINT AS h, count(*) AS c
    FROM toks GROUP BY doc_id, word
), votes AS (
    SELECT doc_id, j,
           sum(CASE WHEN (h >> j) & 1 = 1 THEN c ELSE -c END) AS v
    FROM tokcnt CROSS JOIN range(0, 32) t(j)
    GROUP BY doc_id, j
)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""


@register("simhash_fingerprint", oracle=_SIMHASH_SQL)
def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash: per token, a 32-bit md5-derived hash votes +count on
    set bits and -count on unset bits; the sign of each bit's vote total
    forms the fingerprint. Near-duplicates land within small Hamming
    distance (see simhash_near_pairs)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(F.expr(_SPARK_TOKS)).alias("word")
    )
    tokcnt = toks.groupBy("doc_id", "word").agg(F.count("*").alias("c")).select(
        "doc_id",
        F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("bigint").alias("h"),
        "c",
    )
    # One groupBy with 32 sum aggregates (one per bit) instead of exploding
    # 32 vote rows per token: stays in whole-stage codegen and shuffles
    # n_docs rows, not n_docs*32. The oracle's explode form is the same math.
    votes = tokcnt.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {j}) & 1 = 1"), F.col("c")).otherwise(-F.col("c"))
            ).alias(f"v{j}")
            for j in range(32)
        ]
    )
    simhash = None
    for j in range(32):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        simhash = term if simhash is None else simhash + term
    return votes.select("doc_id", simhash.cast("bigint").alias("simhash"))


_SIMHASH_PAIRS_SQL = (
    """
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split(regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' '),
                              w -> w != '')) AS word
    FROM documents
), tokcnt AS (
    SELECT doc_id, ('0x' || substr(md5(word), 1, 8))::BIGINT AS h, count(*) AS c
    FROM toks GROUP BY doc_id, word
), votes AS (
    SELECT doc_id, j,
           sum(CASE WHEN (h >> j) & 1 = 1 THEN c ELSE -c END) AS v
    FROM tokcnt CROSS JOIN range(0, 32) t(j)
    GROUP BY doc_id, j
), sh AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
), blocked AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sh a JOIN sh b
      ON a.doc_id < b.doc_id
     AND (a.simhash >> 16 = b.simhash >> 16 OR (a.simhash & 65535) = (b.simhash & 65535))
)
SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
FROM blocked WHERE hamming <= 6
"""
    )


@register("simhash_near_pairs", oracle=_SIMHASH_PAIRS_SQL)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with half-word blocking: a pair within
    Hamming distance <= 6 on 32 bits must agree exactly on the high or low
    16 bits far more often than random.

    The OR-of-equalities blocking predicate is deliberately NOT written as
    one join condition — an OR can't drive a hash join and Spark would
    plan a nested loop (n^2). Instead: two hash-keyed self-joins (one per
    half-word), UNION, distinct — the standard multi-probe blocking plan;
    union-distinct of the two equality joins == the OR predicate."""
    sh = simhash_fingerprint(spark, sf_dir).cache()
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))

    def _block(expr_a: str, expr_b: str) -> DataFrame:
        aa = a.withColumn("blk", F.expr(expr_a))
        bb = b.withColumn("blk", F.expr(expr_b))
        return aa.join(bb, ["blk"]).filter(F.col("doc_a") < F.col("doc_b")).select(
            "doc_a", "doc_b", "sh_a", "sh_b"
        )

    blocked = _block("sh_a >> 16", "sh_b >> 16").unionAll(
        _block("sh_a & 65535", "sh_b & 65535")
    ).distinct()
    return blocked.select(
        "doc_a",
        "doc_b",
        F.expr("bit_count(sh_a ^ sh_b)").cast("int").alias("hamming"),
    ).filter(F.col("hamming") <= 6)


# --------------------------------------------------------------------------
# character n-gram Jaccard (exact, bounded candidate set)
# --------------------------------------------------------------------------

_NGRAM_JACCARD_SQL = """
WITH norm AS (
    SELECT doc_id, regexp_replace(lower(text), '[^a-z]+', ' ', 'g') AS nt
    FROM documents WHERE doc_id < 40
), grams AS (
    SELECT doc_id,
           list_distinct([substr(nt, i, 3) for i in range(1, length(nt) - 1)]) AS gs
    FROM norm
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
         / len(list_distinct(a.gs || b.gs)) AS jaccard
FROM grams a JOIN grams b ON a.doc_id < b.doc_id
"""


@register("ngram_jaccard_pairs", oracle=_NGRAM_JACCARD_SQL)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact character-3-gram Jaccard over a bounded candidate set
    (doc_id < 40 here; in production the candidate set comes from LSH —
    this operator is the verify stage, never run on the full n^2)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    # Guard len<3: sequence(1, 0) steps BACKWARDS in Spark ([1,0]) while the
    # oracle's range(1, len-1) is empty — emit an explicitly empty gram set
    # for sub-3-char docs so both engines agree (mirrors _SPARK_SHINGLES).
    grams = docs.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                "CASE WHEN length(regexp_replace(lower(text), '[^a-z]+', ' ')) >= 3 THEN "
                "transform(sequence(1, length(regexp_replace(lower(text), '[^a-z]+', ' ')) - 2),"
                " i -> substring(regexp_replace(lower(text), '[^a-z]+', ' '), i, 3))"
                " ELSE CAST(array() AS array<string>) END"
            )
        ).alias("gs"),
    )
    a = grams.select(F.col("doc_id").alias("doc_a"), F.col("gs").alias("gs_a"))
    b = grams.select(F.col("doc_id").alias("doc_b"), F.col("gs").alias("gs_b"))
    return a.join(b, F.col("doc_a") < F.col("doc_b")).select(
        "doc_a",
        "doc_b",
        (
            F.size(F.array_intersect("gs_a", "gs_b")).cast("double")
            / F.size(F.array_union("gs_a", "gs_b"))
        ).alias("jaccard"),
    )
