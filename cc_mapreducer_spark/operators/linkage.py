"""Record linkage (entity resolution) across two systems' catalogs.

The classic master-data problem: system B's records were keyed and
lightly mangled independently of system A; link each B record back to
its A master. Method (all public):

  * blocking — FastSS deletion neighborhoods on the name (complete for
    edit distance <= 1, the same construction as fuzzy_word_pairs),
    so the candidate join is an equi-join on variant strings, never
    all-pairs;
  * scoring — Fellegi-Sunter-style weighted field agreement: exact
    name +3, distance-1 name +2, brand agreement +2, type agreement
    +1; a candidate is a match at score >= 4 (a mangled name alone is
    not enough — corroboration from another field is required);
  * resolution — best match per B record (score desc, dist asc, a_id),
    a per-entity argmax over its bounded candidate set.

The B system derives from `part` IN-QUERY with deterministic
perturbations (char dropped from the name when p_partkey % 3 = 0, brand
corrupted when % 11 = 0), identically in Spark and DuckDB — the
anagram-HAVING lesson: the oracle hashes REAL linked rows, and the
planted design makes ground truth checkable (a record mangled in both
name and brand scores 3 and must NOT link — the threshold's job).

Scale notes (100 TB): names emit len+1 deletion variants (bounded by
name length); candidates join on near-unique variant strings; scoring
is per-candidate-row expressions; resolution windows over per-B
candidate sets, whose size is the blocking selectivity (hot duplicate
names are the skew — cap candidates per variant like winnowing's
MAX_DOCS_PER_FP if a corpus has mega-duplicate names).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table, spread

MATCH_THRESHOLD = 4

_DERIVE_B_DUCK = """
    SELECT p_partkey + 100000 AS b_id,
           CASE WHEN p_partkey % 3 = 0
                THEN substr(p_name, 1, (p_partkey % length(p_name)))
                     || substr(p_name, (p_partkey % length(p_name)) + 2)
                ELSE p_name END AS b_name,
           CASE WHEN p_partkey % 11 = 0 THEN 'Brand#0' ELSE p_brand END AS b_brand,
           p_type AS b_type
    FROM part
"""

_VARIANTS_DUCK = """
    SELECT {id} AS rid, {name} AS name,
           unnest(list_append(
               [substr({name}, 1, i - 1) || substr({name}, i + 1)
                for i in range(1, length({name}) + 1)],
               {name})) AS v
    FROM {src}
"""

_LINKAGE_SQL = f"""
WITH b AS (
{_DERIVE_B_DUCK}
), va AS (
{_VARIANTS_DUCK.format(id="p_partkey", name="p_name", src="part")}
), vb AS (
{_VARIANTS_DUCK.format(id="b_id", name="b_name", src="b")}
), cand AS (
    SELECT DISTINCT va.rid AS a_id, vb.rid AS b_id
    FROM va JOIN vb ON va.v = vb.v
), scored AS (
    SELECT c.a_id, c.b_id,
           CAST(levenshtein(p.p_name, b.b_name) AS BIGINT) AS dist,
           (p.p_brand = b.b_brand) AS brand_match,
           (p.p_type = b.b_type) AS type_match,
           CAST((CASE WHEN levenshtein(p.p_name, b.b_name) = 0 THEN 3
                      WHEN levenshtein(p.p_name, b.b_name) = 1 THEN 2
                      ELSE 0 END)
                + (CASE WHEN p.p_brand = b.b_brand THEN 2 ELSE 0 END)
                + (CASE WHEN p.p_type = b.b_type THEN 1 ELSE 0 END)
             AS BIGINT) AS score
    FROM cand c
    JOIN part p ON p.p_partkey = c.a_id
    JOIN b ON b.b_id = c.b_id
    WHERE levenshtein(p.p_name, b.b_name) <= 1
), best AS (
    SELECT *, row_number() OVER (PARTITION BY b_id
                                 ORDER BY score DESC, dist, a_id) AS rn
    FROM scored WHERE score >= {MATCH_THRESHOLD}
)
SELECT b_id, a_id, dist, brand_match, type_match, score
FROM best WHERE rn = 1
"""


def _derive_b(part: DataFrame) -> DataFrame:
    p = F.col("p_partkey") % F.length("p_name")
    mangled = F.concat(
        F.expr("substring(p_name, 1, p_partkey % length(p_name))"),
        F.expr("substring(p_name, (p_partkey % length(p_name)) + 2)"),
    )
    return part.select(
        (F.col("p_partkey") + 100000).alias("b_id"),
        F.when(F.col("p_partkey") % 3 == 0, mangled)
        .otherwise(F.col("p_name"))
        .alias("b_name"),
        F.when(F.col("p_partkey") % 11 == 0, F.lit("Brand#0"))
        .otherwise(F.col("p_brand"))
        .alias("b_brand"),
        F.col("p_type").alias("b_type"),
    )


def _variants(df: DataFrame, id_col: str, name_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("rid"),
        F.explode(
            F.concat(
                F.expr(
                    f"transform(sequence(1, length({name_col})), "
                    f"i -> concat(substring({name_col}, 1, i - 1), "
                    f"substring({name_col}, i + 1)))"
                ),
                F.array(F.col(name_col)),
            )
        ).alias("v"),
    )


@register("record_linkage_parts", oracle=_LINKAGE_SQL, driver=False)
def record_linkage_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best A-master per B record at score >= {MATCH_THRESHOLD}."""
    # spread(): the variant explode fans each part row into ~len(name)+1
    # rows of CPU-dense string work; without it the single-file local
    # scan ran the whole blocking stage on one core (suite_legs lane
    # measured 12.4s -> 3.1s at sf0.1 from this line alone)
    part = spread(
        load_table(spark, sf_dir, "part").select(
            "p_partkey", "p_name", "p_brand", "p_type"
        )
    )
    b = _derive_b(part)
    va = _variants(part, "p_partkey", "p_name")
    vb = _variants(b, "b_id", "b_name")
    cand = (
        va.join(vb.withColumnRenamed("rid", "b_rid"), "v")
        .select(F.col("rid").alias("a_id"), F.col("b_rid").alias("b_id"))
        .distinct()
    )
    scored = (
        cand.join(part, cand.a_id == part.p_partkey)
        .join(b, "b_id")
        .withColumn("dist", F.levenshtein("p_name", "b_name").cast("bigint"))
        .filter(F.col("dist") <= 1)
        .select(
            "a_id",
            "b_id",
            "dist",
            (F.col("p_brand") == F.col("b_brand")).alias("brand_match"),
            (F.col("p_type") == F.col("b_type")).alias("type_match"),
            (
                F.when(F.col("dist") == 0, 3)
                .when(F.col("dist") == 1, 2)
                .otherwise(0)
                + F.when(F.col("p_brand") == F.col("b_brand"), 2).otherwise(0)
                + F.when(F.col("p_type") == F.col("b_type"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("score"),
        )
    )
    w = Window.partitionBy("b_id").orderBy(F.desc("score"), "dist", "a_id")
    return (
        scored.filter(F.col("score") >= MATCH_THRESHOLD)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("b_id", "a_id", "dist", "brand_match", "type_match", "score")
    )
