"""EXACT threshold set-similarity join via prefix filtering.

The MinHash-LSH path (``operators/dedup.py``) is probabilistic: a true
near-duplicate pair can miss every band and silently survive dedup. This
module provides the exact complement — ALL pairs with Jaccard >= t, zero
false negatives — using the prefix-filtering family of algorithms
(Chaudhuri/Ganti/Kaushik SSJoin, ICDE 2006; Bayardo/Ma/Srikant AllPairs,
WWW 2007; Xiao et al. PPJoin, WWW 2008 — public methods), re-expressed
as DataFrame ops.

Why it is exact
---------------
For sets a, b with J(a,b) = |a∩b| / |a∪b| >= t:
  * overlap bound: |a∩b| >= t·|a| and >= t·|b|  (since |a∩b| <= |b|,
    J >= t  =>  o >= t(|a|+|b|-o) >= t·|a|);
  * length bound:  t·|a| <= |b| <= |a|/t;
  * prefix theorem: order ALL tokens by one global total order and take
    each set's first  p = |s| - ceil(t·|s|) + 1  tokens. If a and b
    share NO prefix token, their overlap is at most
    min(|a|-p_a, |b|-p_b) < t·max(|a|,|b|) — too small. So every
    qualifying pair shares >= 1 prefix token, and joining on prefix
    tokens loses nothing. Verification on candidates is exact Jaccard,
    so false positives die there.

The global token order is ASCENDING document frequency (rarest first,
ties on the token string): prefixes then hold each set's rarest tokens,
so the candidate join keys are the tokens with the FEWEST postings —
the self-join fan-out per key is bounded by the rarest tokens' df, not
the head of the Zipf curve.

Scale notes (100 TB)
--------------------
  * no global rank is materialized: the order is the (df, token) tuple
    itself, so prefix selection is a PER-DOC window (bounded by doc
    length), never a vocabulary-wide single-partition row_number (the
    bm25 r3 lesson).
  * candidate generation self-joins ONLY prefix tokens; the join key
    distribution is anti-Zipf by construction (rare tokens first).
    Low thresholds lengthen prefixes — inherent to the method: at
    t -> 0 every pair qualifies and no filter can prune. Production
    near-dup thresholds (t >= 0.7) keep prefixes ~30% of each set.
  * verification joins shingle arrays only for CANDIDATE docs; the
    n^2 space is never touched.
  * vs LSH: this path does more verify work per true pair but is
    lossless — the right tool for contamination/eval-leakage scans
    where a missed duplicate is a correctness bug, while LSH serves
    the bulk-dedup path. ``tests/test_setsim.py`` cross-validates the
    two (every LSH pair must re-appear here with the same Jaccard).

Reference parity: the reference engine has no similarity join at all
(its surface is the anagram pipeline, /root/reference/src/index.js);
this operator extends the engine for the training-data-pipeline duties
the round brief names as first-class.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cc_mapreducer_spark.operators.dedup import (
    _DUCK_SHINGLE_CTE,
    NEAR_DUP_JACCARD,
    shingle_sets,
)
from cc_mapreducer_spark.registry import register


def set_similarity_join(
    sets: DataFrame, id_col: str, set_col: str, threshold: float
) -> DataFrame:
    """All pairs (a, b), a < b, with Jaccard(set_a, set_b) >= threshold.

    ``sets``: one row per id with a distinct-element array column.
    Returns (doc_a, doc_b, jaccard) — jaccard as an exact double
    (integer overlap / integer union; bit-identical across engines).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    base = sets.select(
        F.col(id_col).alias("__id"),
        F.col(set_col).alias("__ss"),
        F.size(set_col).alias("__n"),
    ).filter(F.col("__n") > 0)

    toks = base.select("__id", "__n", F.explode("__ss").alias("__tok"))
    # document frequency per token: one map-side-combined agg; joining it
    # back is a shuffle on the token — the same key the candidate join
    # uses, so AQE can reuse the exchange.
    dfreq = toks.groupBy("__tok").agg(F.count("*").alias("__df"))
    ranked = toks.join(dfreq, "__tok")
    # prefix = the first  n - ceil(t*n) + 1  tokens in (df, token) order,
    # selected by a PER-DOC window (bounded by doc length).
    w = Window.partitionBy("__id").orderBy("__df", "__tok")
    prefix = (
        ranked.withColumn("__rn", F.row_number().over(w))
        .filter(
            F.col("__rn")
            <= F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1
        )
        .select("__id", "__n", "__tok")
    )

    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.__tok") == F.col("b.__tok"))
            & (F.col("a.__id") < F.col("b.__id"))
            # length filter: min size must reach t * max size
            & (
                F.least("a.__n", "b.__n")
                >= F.lit(threshold) * F.greatest("a.__n", "b.__n")
            ),
        )
        .select(
            F.col("a.__id").alias("doc_a"), F.col("b.__id").alias("doc_b")
        )
        .distinct()
    )

    sa = base.select(
        F.col("__id").alias("doc_a"),
        F.col("__ss").alias("__ssa"),
        F.col("__n").alias("__na"),
    )
    sb = base.select(
        F.col("__id").alias("doc_b"),
        F.col("__ss").alias("__ssb"),
        F.col("__n").alias("__nb"),
    )
    o = F.size(F.array_intersect("__ssa", "__ssb"))
    j = o.cast("double") / (F.col("__na") + F.col("__nb") - o).cast("double")
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", j)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 9).alias("jaccard"))
    )


def prefix_length(n: int, threshold: float) -> int:
    """The prefix-filtering length for a set of size n (exposed for
    tests: pruning claims are checked against this exact formula)."""
    return n - math.ceil(threshold * n) + 1


# Brute-force oracle: states the semantic contract directly — every pair,
# no filtering cleverness — so a prefix-filter bug (a lost candidate)
# surfaces as a missing row, not a matching wrong answer.
_SETSIM_SQL = f"""
{_DUCK_SHINGLE_CTE},
ssets AS (SELECT doc_id, ss, len(ss) AS n FROM dshingles WHERE len(ss) > 0),
stok AS (SELECT doc_id, unnest(ss) AS s FROM ssets),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS o
    FROM stok a JOIN stok b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(o * 1.0 / (na.n + nb.n - o), 9) AS jaccard
FROM inter
JOIN ssets na ON na.doc_id = doc_a
JOIN ssets nb ON nb.doc_id = doc_b
WHERE o * 1.0 / (na.n + nb.n - o) >= {NEAR_DUP_JACCARD}
"""


@register("setsim_exact_pairs", oracle=_SETSIM_SQL, driver=False)
def setsim_exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-duplicate pairs at the shared NEAR_DUP_JACCARD
    threshold over 3-word shingle sets — the lossless counterpart of
    ``near_dedup_pairs`` (which must be a subset of this; see
    tests/test_setsim.py)."""
    return set_similarity_join(
        shingle_sets(spark, sf_dir), "doc_id", "ss", NEAR_DUP_JACCARD
    )
