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

import math

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
       CAST(1.0 / (1.0 + exp(-({m}))) >= 0.5 AS BOOLEAN) AS pred_en
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
        (score >= 0.5).alias("pred_en"),
    )
