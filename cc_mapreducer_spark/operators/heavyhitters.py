"""Heavy hitters without a corpus-wide groupBy: mergeable Misra-Gries
summaries gate the candidates, an exact pass verifies them.

"Which words/domains/n-grams appear more than t times?" is a daily
question over a training corpus, and the naive answer — groupBy the
token stream — shuffles EVERY distinct token at 100 TB just to discard
all but a handful of heavy ones. The classic streaming answer is
Misra-Gries (Misra & Gries, "Finding repeated elements", 1982; merge
semantics per Agarwal et al., "Mergeable Summaries", PODS'12):

  * each partition folds its rows into a k-counter summary — O(k)
    memory, one pass, no shuffle;
  * summaries MERGE associatively (add counts, then subtract the
    (k+1)-th largest and drop non-positives) with the combined error
    bound <= n/(k+1) over the merged stream;
  * the merged summary's guarantee: every item with true count
    > n/(k+1) SURVIVES. With k sized so n/(k+1) <= t, the summary is a
    certified SUPERSET of the >= t heavy hitters (no false negatives);
  * the ~k surviving candidates broadcast into an exact count
    (filtered semi-join + groupBy over candidate rows only), which
    removes the false positives.

The final answer is therefore EXACT — bit-identical to the plain
`GROUP BY x HAVING count(*) >= t` the DuckDB oracle states — while the
only corpus-wide shuffle is the candidate-filtered count whose key
cardinality is <= k, not |distinct tokens|. Same contract shape as
operators/bloom.py: the sketch changes the PLAN, never the ANSWER.

Everything is deterministic: the per-partition fold visits rows in
partition order, the merge is a counter sum (order-free), and the
decrement step uses the exact (k+1)-th largest count, so the survivor
SET (what correctness depends on) is a pure function of the multiset of
(item, count) partials — tie handling can differ only for items below
the guarantee line, which the exact verify then adjudicates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table

# candidate capacity: guarantees survival of every item with true count
# > n/(_MG_K+1). For the registered query (threshold t = n/200 rounded
# up) any k >= 200 certifies the superset; headroom keeps the candidate
# broadcast trivially small while shrinking false positives.
_MG_K = 512


def _mg_fold(counts: dict, item, w: int, k: int) -> None:
    """Fold one (item, weight) into a Misra-Gries summary in place."""
    if item in counts:
        counts[item] += w
    elif len(counts) < k:
        counts[item] = w
    else:
        # decrement-all by the incoming weight (weighted MG): subtract
        # min(w, current minimum) repeatedly is O(k) worst case; the
        # standard one-shot form subtracts d = min over the bumped set
        d = min(w, min(counts.values()))
        dead = []
        for key in counts:
            counts[key] -= d
            if counts[key] <= 0:
                dead.append(key)
        for key in dead:
            del counts[key]
        if w - d > 0:
            counts[item] = w - d


def _merge_summaries(parts: list[dict], k: int) -> dict:
    """Mergeable-summaries combine: sum counters, then if over capacity
    subtract the (k+1)-th largest count and drop non-positives
    (Agarwal et al. §3.2 — keeps the n/(k+1) guarantee)."""
    total: dict = {}
    for p in parts:
        for item, c in p.items():
            total[item] = total.get(item, 0) + c
    if len(total) > k:
        cut = sorted(total.values(), reverse=True)[k]
        total = {i: c - cut for i, c in total.items() if c - cut > 0}
    return total


def mg_candidates(keyed: DataFrame, key_col: str, k: int = _MG_K) -> list:
    """Distributed Misra-Gries: one k-counter summary per partition
    (Arrow-batched fold, zero shuffle), summaries merged driver-side
    (<= n_partitions * k tiny rows — the same partial/merge shape as
    bloom.build_bloom). Returns the candidate items: a certified
    superset of every item with true count > n/(k+1)."""

    def partial(batches):
        counts: dict = {}
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            for item in pdf[key_col].values:
                _mg_fold(counts, item, 1, k)
        if seen and counts:
            yield pd.DataFrame(
                {"item": list(counts), "c": list(counts.values())}
            )

    parts_df = keyed.select(key_col).mapInPandas(
        partial, "item string, c long"
    )
    rows = parts_df.collect()
    by_part: dict = {}
    for r in rows:
        by_part[r["item"]] = by_part.get(r["item"], 0) + r["c"]
    merged = _merge_summaries([by_part], k)
    return sorted(merged)


def heavy_hitters_exact(
    keyed: DataFrame, key_col: str, threshold: int, k: int = _MG_K
) -> DataFrame:
    """Exact >= threshold heavy hitters, sketch-gated: MG candidates
    (superset for threshold > n/(k+1)) -> broadcast semi-join -> exact
    count over candidate rows only -> threshold filter. The groupBy's
    key cardinality is <= k regardless of corpus vocabulary."""
    spark = keyed.sparkSession
    cand = mg_candidates(keyed, key_col, k)
    cand_df = spark.createDataFrame(
        [(c,) for c in cand], f"{key_col} string"
    )
    return (
        keyed.join(F.broadcast(cand_df), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )


# Registered surface: words appearing in >= ceil(n_words/200) of the
# token stream — threshold derived from the corpus itself so the query
# is fixture-free and non-empty at every SF, and comfortably above the
# merged-summary guarantee line n/(_MG_K+1).
_HH_SQL_TMPL = """
WITH words AS (
    SELECT unnest({duck_words}) AS word FROM documents
), n AS (
    SELECT CAST(count(*) AS BIGINT) AS total FROM words
)
SELECT word, CAST(count(*) AS BIGINT) AS cnt
FROM words, n
GROUP BY word, n.total
HAVING count(*) >= CAST(ceil(total / 200.0) AS BIGINT)
"""


def _hh_sql() -> str:
    from cc_mapreducer_spark.operators.text_analysis import _DUCK_WORDS

    return _HH_SQL_TMPL.format(duck_words=_DUCK_WORDS)


@register("heavy_hitter_words", oracle=_hh_sql(), driver=False)
def heavy_hitter_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Words with count >= ceil(n_words/200), answered through the
    sketch-gated path — identical rows to the oracle's plain
    GROUP BY/HAVING (hash parity in test_oracle_parity.py), different
    plan: per-partition MG summaries, driver merge, candidate-only
    exact count."""
    from cc_mapreducer_spark.operators.text_analysis import _SPARK_WORDS
    from cc_mapreducer_spark.tables import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select(F.explode(F.expr(_SPARK_WORDS)).alias("word"))
    n = words.count()
    if n == 0:
        return spark.createDataFrame([], "word string, cnt bigint")
    threshold = -(-n // 200)  # ceil
    return heavy_hitters_exact(words, "word", threshold)


# --------------------------------------------------------------------------
# top-k groups + OTHER rollup (the reporting companion of heavy hitters)
# --------------------------------------------------------------------------

_TOPK_GROUPS = 3

_TOPK_OTHER_SQL = f"""
WITH counts AS (
    SELECT event_type, count(*) AS n,
           sum(CAST(value AS DECIMAL(14,2))) AS sv
    FROM events GROUP BY 1
), ranked AS (
    SELECT *, row_number() OVER (ORDER BY n DESC, event_type) AS rn
    FROM counts
)
SELECT CASE WHEN rn <= {_TOPK_GROUPS} THEN event_type ELSE 'OTHER' END AS label,
       CAST(sum(n) AS BIGINT) AS n_events,
       round(CAST(sum(sv) AS DOUBLE), 6) AS total_value
FROM ranked
GROUP BY 1
"""


@register("event_type_topk_rollup", oracle=_TOPK_OTHER_SQL, driver=False)
def event_type_topk_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TOPK_GROUPS} event types by volume, everything else
    collapsed into an 'OTHER' bucket — the standard long-tail reporting
    rollup. Ranking happens on the |groups|-row count table (TakeOrdered
    at scale, deterministic (count desc, name) tiebreak), never on the
    fact stream; value sums stay DECIMAL(14,2) through BOTH aggregates
    (cent values like x.01 are not exactly representable as binary
    doubles, so a double re-sum in the OTHER bucket would be
    order-dependent in the last ulps) and cast to double exactly once
    at output."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(14,2)")).alias("sv"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n"), "event_type")
    ranked = counts.withColumn("rn", F.row_number().over(w))
    label = F.when(
        F.col("rn") <= _TOPK_GROUPS, F.col("event_type")
    ).otherwise(F.lit("OTHER"))
    return (
        ranked.select(label.alias("label"), "n", "sv")
        .groupBy("label")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.round(F.sum("sv").cast("double"), 6).alias("total_value"),
        )
    )
