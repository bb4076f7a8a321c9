"""Quality-classifier training: distributed logistic regression with
one bounded aggregate per iteration.

Every serious curation pipeline ends with a learned scorer (fastText or
a linear head over cheap features — the CCNet / GPT-3 "quality filter"
recipe: train a classifier to separate a trusted corpus from the crawl,
keep what scores well). The Spark-shaped version of full-batch gradient
descent is: features once (one scan, cached), then per iteration ONE
aggregation producing d+1 doubles — the gradient — with the weight
vector living driver-side as plan literals. No per-row Python, no
vocabulary-sized state, no shuffle beyond the agg's partial-combine
tree: per iteration the executors ship d+1 numbers per partition.

The demo task is production-shaped: predict whether a document's `lang`
is 'en' from surface statistics (log word count, English-stopword hit
ratio, lexical diversity, mean word length). Labels in production come
from trusted-corpus membership; the lang column plays that role here.
One honest caveat: the driver's synthetic corpus draws `lang` labels
independently of the (always English-ish) token soup, so on that data
the optimum IS the base-rate predictor and converged accuracy sits just
above it. Learnability of the machinery is therefore proven separately
on a planted corpus where the label does depend on the text
(tests/test_classifier.py::test_learns_planted_signal, accuracy >= 0.95).

Determinism & verification:
- the trainer is float iteration (like item_pagerank, graph.py:156), so
  it is pytest-pinned against a bit-faithful numpy replica (same
  feature grid, same update rule) to 1e-7 — not driver-hashed;
- the SCORER is hash-green: `quality_classifier_scores` applies the
  weights this trainer converged to on the sf0.01 corpus, frozen to 6dp
  literals, and DuckDB recomputes the identical linear model (6dp
  feature grid, 6dp sigmoid output absorbs libm-vs-JVM exp ulp drift —
  the lm_perplexity precedent).

Scale: the feature scan is one pass over documents; each GD step
aggregates (p - y) * x_j sums — associative, partial-combined
map-side, d+1 doubles per partition over the wire. 100 iterations over
100 TB is 100 scans of a CACHED feature projection (4 doubles + 1 label
per doc = ~40 bytes/row); on a cluster you'd persist that projection to
parquet once (operators/curation.py staging convention) and train from
it. Mini-batching is deliberately absent: full-batch GD on a convex
loss with these row counts converges in tens of iterations and keeps
every step a pure one-agg plan.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table, spread

_EN_STOPS = ("the", "and", "of", "to", "in", "a", "is")
_LR = 2.0
_ITERS = 60
_L2 = 0.01  # on the non-bias weights: a finite, unique optimum even when
#             a planted corpus is linearly separable (weights would
#             otherwise diverge and the frozen-literal scorer would be
#             ill-defined)
_ROUND = 6


def _spark_features(docs: DataFrame) -> DataFrame:
    """(doc_id, y, x1..x4) on a 6dp grid. Uses the repo's one tokenizer
    so the features line up with every other text operator."""
    from cc_mapreducer_spark.operators.text_analysis import _SPARK_WORDS

    stops = ", ".join(f"'{s}'" for s in _EN_STOPS)
    w = f"({_SPARK_WORDS})"
    return docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("y"),
        F.round(F.expr(f"ln(1 + size({w}))"), _ROUND).alias("x1"),
        F.round(
            F.expr(
                f"size(filter({w}, t -> t IN ({stops})))"
            ).cast("double")
            / F.expr(f"size({w}) + 1.0"),
            _ROUND,
        ).alias("x2"),
        F.round(
            F.expr(f"size(array_distinct({w}))").cast("double")
            / F.expr(f"size({w}) + 1.0"),
            _ROUND,
        ).alias("x3"),
        F.round(
            F.col("n_chars").cast("double") / F.expr(f"size({w}) + 1.0"),
            _ROUND,
        ).alias("x4"),
    )


_DUCK_FEATURES_TMPL = """
SELECT doc_id,
       CAST(lang = 'en' AS INTEGER) AS y,
       round(ln(1 + len({w})), {r}) AS x1,
       round(len(list_filter({w}, t -> t IN ({stops}))) / (len({w}) + 1.0), {r}) AS x2,
       round(len(list_distinct({w})) / (len({w}) + 1.0), {r}) AS x3,
       round(CAST(n_chars AS DOUBLE) / (len({w}) + 1.0), {r}) AS x4
FROM documents
"""


def _duck_features_sql() -> str:
    from cc_mapreducer_spark.operators.text_analysis import _DUCK_WORDS

    stops = ", ".join(f"'{s}'" for s in _EN_STOPS)
    return _DUCK_FEATURES_TMPL.format(
        w=f"({_DUCK_WORDS})", stops=stops, r=_ROUND
    )


def train_logreg(
    feats: DataFrame, lr: float = _LR, iters: int = _ITERS
) -> list[float]:
    """Full-batch GD on the L2-regularized logistic loss. `feats` must
    carry columns y, x1..x4; returns [b, w1, w2, w3, w4] in RAW feature
    space. Internally features are standardized (one stats agg up
    front), GD runs on the z-scores — the conditioning trick that makes
    a single lr work for any feature scaling — and the learned weights
    are mapped back (w_raw = w_std/sd, b_raw = b - sum(w_std*mu/sd)).
    Each iteration is one agg job: sum((sigmoid(margin) - y) * z_j) for
    each j — d+1 doubles per partition through the partial-combine
    tree. The weight vector itself lives driver-side as plan literals."""
    feats = feats.persist()
    xs = ["x1", "x2", "x3", "x4"]
    try:
        n = feats.count()  # also materializes the cache
        if n == 0:
            return [0.0] * 5
        stats = feats.agg(
            *[F.avg(c).alias(f"mu{j}") for j, c in enumerate(xs)],
            *[F.stddev_pop(c).alias(f"sd{j}") for j, c in enumerate(xs)],
        ).collect()[0]
        mu = [stats[f"mu{j}"] for j in range(4)]
        sd = [stats[f"sd{j}"] or 0.0 for j in range(4)]
        sd = [s if s > 1e-12 else 1.0 for s in sd]  # constant col -> no-op
        w = [0.0] * 5
        for _ in range(iters):
            margin = F.lit(w[0])
            for j, c in enumerate(xs):
                z = (F.col(c) - F.lit(mu[j])) / F.lit(sd[j])
                margin = margin + F.lit(w[j + 1]) * z
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
            resid = p - F.col("y")
            row = feats.agg(
                F.sum(resid).alias("g0"),
                *[
                    F.sum(
                        resid * (F.col(c) - F.lit(mu[j])) / F.lit(sd[j])
                    ).alias(f"g{j + 1}")
                    for j, c in enumerate(xs)
                ],
            ).collect()[0]
            w = [
                w[j] - lr * (row[f"g{j}"] / n + (_L2 * w[j] if j else 0.0))
                for j in range(5)
            ]
        # back to raw-feature space so the scorer needs no stats
        w_raw = [w[j + 1] / sd[j] for j in range(4)]
        b_raw = w[0] - sum(w[j + 1] * mu[j] / sd[j] for j in range(4))
        return [b_raw, *w_raw]
    finally:
        feats.unpersist()


@register("train_lang_classifier", driver=False)  # float iteration: numpy-checked in pytest
def train_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the is-English logistic regression on the given corpus and
    return the learned weights as a 5-row (term, weight) table. Float
    iteration (gradient sums are doubles) ⇒ pytest-pinned against a
    numpy replica at 1e-7, not driver-hashed — the item_pagerank
    policy."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    w = train_logreg(_spark_features(docs))
    terms = ["bias", "x1", "x2", "x3", "x4"]
    return spark.createDataFrame(
        list(zip(terms, [float(v) for v in w])), "term string, weight double"
    )


# --------------------------------------------------------------------------
# hash-green scorer: the trained model frozen to literals
# --------------------------------------------------------------------------

# train_lang_classifier on /root/testdata/sf0.01, rounded to 6dp
# (tests/test_classifier.py retrains and pins these to 1e-4).
_W_SF001 = {
    "bias": 1.44537,
    "x1": -0.049498,
    "x2": 1.85111,
    "x3": -0.072243,
    "x4": -0.296714,
}


def _scorer_sql() -> str:
    f = _duck_features_sql()
    m = (
        f"{_W_SF001['bias']} + {_W_SF001['x1']} * x1 + {_W_SF001['x2']} * x2 "
        f"+ {_W_SF001['x3']} * x3 + {_W_SF001['x4']} * x4"
    )
    return f"""
WITH feats AS ({f})
SELECT doc_id, y,
       round(1.0 / (1.0 + exp(-({m}))), {_ROUND}) AS score,
       CAST(round(1.0 / (1.0 + exp(-({m}))), {_ROUND}) >= 0.5 AS BOOLEAN) AS pred_en
FROM feats
"""


@register("quality_classifier_scores", oracle=_scorer_sql(), driver=False)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with the frozen trained model (the serving
    path: weights are literals in the plan, so scoring is one
    whole-stage-codegen projection — zero shuffle, zero Python). Emits
    the 6dp sigmoid score and the >= 0.5 decision; DuckDB recomputes
    the identical model, so the key is fully hash-checkable."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    feats = _spark_features(docs)
    m = F.lit(_W_SF001["bias"])
    for c in ("x1", "x2", "x3", "x4"):
        m = m + F.lit(_W_SF001[c]) * F.col(c)
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
    return feats.select(
        "doc_id",
        "y",
        F.round(score, _ROUND).alias("score"),
        # Decision derives from the 6dp-ROUNDED score, not the raw sigmoid:
        # libm-vs-JVM exp() ulp drift could flip the raw comparison for a
        # doc with margin ~0, and the confusion/precision/recall metrics
        # built on pred_en must stay hash-identical across engines.
        (F.round(score, _ROUND) >= 0.5).alias("pred_en"),
    )


# --------------------------------------------------------------------------
# model evaluation: AUC, confusion counts, calibration bins
# --------------------------------------------------------------------------

_EVAL_SQL_TMPL = """
WITH scored AS ({scored}),
per_score AS (
    SELECT score,
           CAST(sum(y) AS BIGINT) AS p,
           CAST(count(*) - sum(y) AS BIGINT) AS neg
    FROM scored GROUP BY score
), cum AS (
    SELECT score, p, neg,
           CAST(coalesce(sum(neg) OVER (
               ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS neg_below
    FROM per_score
), agg AS (
    SELECT CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(neg) AS BIGINT) AS n_neg,
           CAST(sum(2 * p * neg_below + p * neg) AS BIGINT) AS auc_num2
    FROM cum
), conf AS (
    SELECT CAST(sum(CASE WHEN pred_en AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN pred_en AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN NOT pred_en AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(sum(CASE WHEN NOT pred_en AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
    FROM scored
)
SELECT n_pos, n_neg, tp, fp, fn, tn,
       CASE WHEN n_pos * n_neg > 0
            THEN round(auc_num2 / (2.0 * n_pos * n_neg), 9) END AS auc,
       round((tp + tn) / CAST(n_pos + n_neg AS DOUBLE), 9) AS accuracy,
       CASE WHEN tp + fp > 0
            THEN round(tp / CAST(tp + fp AS DOUBLE), 9) END AS precision_en,
       CASE WHEN n_pos > 0
            THEN round(tp / CAST(n_pos AS DOUBLE), 9) END AS recall_en
FROM agg, conf
"""


def _eval_sql() -> str:
    return _EVAL_SQL_TMPL.format(scored=_scorer_sql())


@register("classifier_eval_metrics", oracle=_eval_sql(), driver=False)
def classifier_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the frozen scorer against its labels: tie-aware AUC
    (Mann-Whitney), confusion counts at the 0.5 cut, accuracy,
    precision, recall — one row, every ratio a 9dp rounding of an
    exact-integer fraction, so the key is fully hash-checkable.

    The AUC avoids the textbook corpus-wide rank window: group by the
    6dp score first (per_score), then one cumulative window over THAT
    table — its size is bounded by the score grid (<= 1e6 + 1 rows no
    matter the corpus), so the single-partition window is over a
    bounded input (the tokenize.py TakeOrdered discipline). The pair
    count sums 2*p*neg_below + p*neg per distinct score — all integer
    arithmetic until the final division."""
    from pyspark.sql import Window

    # The scored corpus feeds BOTH the per-score AUC rollup and the
    # confusion-count aggregate; persist it through the keyed memo so
    # the feature+scoring pipeline executes once, not once per consumer
    # (r11; guide §2.4 — an eval harness materializes its scores table).
    from cc_mapreducer_spark.operators.similarity import (
        _frame_files,
        _persisted,
    )

    # Variant = the file listing of the frame ACTUALLY persisted, which
    # covers every source table the scoring pipeline reads — not just
    # documents (ADVICE r11: an in-session overwrite of another input
    # would have served a stale scored frame).
    scored_raw = quality_classifier_scores(spark, sf_dir)
    scored = _persisted(
        spark,
        ("classifier_scored", sf_dir),
        (_frame_files(scored_raw),),
        lambda: scored_raw,
    )
    per_score = scored.groupBy("score").agg(
        F.sum("y").cast("bigint").alias("p"),
        (F.count("*") - F.sum("y")).cast("bigint").alias("neg"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    cum = per_score.withColumn(
        "neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0)).cast("bigint")
    )
    agg = cum.agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum("neg").cast("bigint").alias("n_neg"),
        F.sum(
            2 * F.col("p") * F.col("neg_below") + F.col("p") * F.col("neg")
        )
        .cast("bigint")
        .alias("auc_num2"),
    )
    pred = F.col("pred_en")
    conf = scored.agg(
        F.sum(F.when(pred & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(pred & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when(~pred & (F.col("y") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
        F.sum(F.when(~pred & (F.col("y") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("tn"),
    )
    j = agg.crossJoin(conf)  # two 1-row aggregates
    total = (F.col("n_pos") + F.col("n_neg")).cast("double")
    return j.select(
        "n_pos",
        "n_neg",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(
            F.col("n_pos") * F.col("n_neg") > 0,
            F.round(
                F.col("auc_num2") / (2.0 * F.col("n_pos") * F.col("n_neg")), 9
            ),
        ).alias("auc"),
        F.round((F.col("tp") + F.col("tn")) / total, 9).alias("accuracy"),
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.round(F.col("tp") / (F.col("tp") + F.col("fp")).cast("double"), 9),
        ).alias("precision_en"),
        F.when(
            F.col("n_pos") > 0,
            F.round(F.col("tp") / F.col("n_pos").cast("double"), 9),
        ).alias("recall_en"),
    )


_CALIB_SQL_TMPL = """
WITH scored AS ({scored})
SELECT CAST(least(floor(score * 10), 9) AS INTEGER) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CAST(score AS DECIMAL(8,6))) AS DOUBLE) / count(*), 9)
           AS mean_score,
       round(sum(y) / CAST(count(*) AS DOUBLE), 9) AS frac_pos
FROM scored
GROUP BY 1
"""


def _calib_sql() -> str:
    return _CALIB_SQL_TMPL.format(scored=_scorer_sql())


@register("classifier_calibration_bins", oracle=_calib_sql(), driver=False)
def classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram input: decile bins of the frozen scorer's
    output, each with its exact count, mean predicted score, and
    observed positive fraction. mean_score sums the 6dp scores as
    DECIMAL(8,6) — exact, order-free — before one double division
    (the repo's decimal-sum determinism recipe), so the key hashes."""
    scored = quality_classifier_scores(spark, sf_dir)
    return (
        scored.groupBy(
            F.least(F.floor(F.col("score") * 10), F.lit(9))
            .cast("int")
            .alias("bin")
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(
                F.sum(F.col("score").cast("decimal(8,6)")).cast("double")
                / F.count("*"),
                9,
            ).alias("mean_score"),
            F.round(F.sum("y") / F.count("*").cast("double"), 9).alias(
                "frac_pos"
            ),
        )
    )
