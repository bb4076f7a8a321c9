"""Logistic-regression quality classifier: numpy replica parity for the
distributed GD iterates, learnability on a planted corpus, the frozen
serving weights, and loss monotonicity. Oracle parity for the
hash-green scorer (quality_classifier_scores) runs in
test_oracle_parity.py."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from cc_mapreducer_spark.operators.classifier import (
    _ITERS,
    _L2,
    _LR,
    _W_SF001,
    _duck_features_sql,
    _spark_features,
    train_logreg,
)
from cc_mapreducer_spark.tables import load_table, spread
from tests.conftest import SF_ORACLE


def _numpy_logreg(X, y, lr=_LR, iters=_ITERS, l2=_L2):
    """Bit-faithful replica of train_logreg's update rule: standardize,
    GD on z-scores, map weights back to raw space."""
    n, d = X.shape
    mu = X.mean(axis=0)
    sd = X.std(axis=0)  # population std, matching stddev_pop
    sd = np.where(sd > 1e-12, sd, 1.0)
    Z = (X - mu) / sd
    w = np.zeros(d + 1)
    for _ in range(iters):
        m = w[0] + Z @ w[1:]
        p = 1.0 / (1.0 + np.exp(-m))
        resid = p - y
        g = np.concatenate([[resid.sum()], Z.T @ resid])
        reg = np.concatenate([[0.0], l2 * w[1:]])
        w = w - lr * (g / n + reg)
    w_raw = w[1:] / sd
    b_raw = w[0] - float((w[1:] * mu / sd).sum())
    return np.concatenate([[b_raw], w_raw])


def _duck_features(sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    df = con.execute(_duck_features_sql()).df().sort_values("doc_id")
    X = df[["x1", "x2", "x3", "x4"]].to_numpy(dtype=np.float64)
    y = df["y"].to_numpy(dtype=np.float64)
    return X, y


def test_trainer_matches_numpy_replica(spark):
    # the distributed GD must walk the same iterate path as the dense
    # replica — features come from DUCKDB (independent construction),
    # so this also cross-checks the feature grid end to end
    docs = spread(load_table(spark, SF_ORACLE, "documents"))
    got = np.array(train_logreg(_spark_features(docs)))
    X, y = _duck_features(SF_ORACLE)
    want = _numpy_logreg(X, y)
    assert np.allclose(got, want, rtol=1e-6, atol=1e-8), (got, want)


def test_frozen_weights_match_training(spark):
    # the serving literals in _W_SF001 are the converged sf0.01 model
    docs = spread(load_table(spark, SF_ORACLE, "documents"))
    got = train_logreg(_spark_features(docs))
    frozen = [_W_SF001[k] for k in ("bias", "x1", "x2", "x3", "x4")]
    assert np.allclose(got, frozen, atol=1e-4), (got, frozen)


def _write_planted(tmp_path):
    # 'en' docs are stopword-dense, others stopword-free: the label IS a
    # function of the text, so the classifier must separate them
    en = ["the cat is in the hat and the dog is of the house %d" % i for i in range(40)]
    xx = ["zorple kwyjibo flumph grebnatz yolorp vexquill %d" % i for i in range(40)]
    texts = en + xx
    langs = ["en"] * 40 + ["xx"] * 40
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_learns_planted_signal(spark, tmp_path):
    sf = _write_planted(tmp_path)
    docs = spread(load_table(spark, sf, "documents"))
    feats = _spark_features(docs)
    w = train_logreg(feats)
    rows = feats.collect()
    correct = 0
    for r in rows:
        m = w[0] + w[1] * r["x1"] + w[2] * r["x2"] + w[3] * r["x3"] + w[4] * r["x4"]
        correct += int((1.0 / (1.0 + math.exp(-m)) >= 0.5) == bool(r["y"]))
    assert correct / len(rows) >= 0.95
    # the stopword-ratio feature must carry positive weight: it is the
    # only signal separating the classes
    assert w[2] > 0


def test_loss_decreases_under_training(spark, tmp_path):
    # convexity sanity on the planted corpus: the trained model's loss
    # must beat the zero-weight starting point
    sf = _write_planted(tmp_path)
    feats = _spark_features(spread(load_table(spark, sf, "documents")))
    w = train_logreg(feats)
    X, y = _duck_features(sf)
    def loss(wv):
        m = wv[0] + X @ np.array(wv[1:])
        return float(np.mean(np.log1p(np.exp(-m)) + (1 - y) * m))
    assert loss(w) < loss([0.0] * 5)


def test_empty_corpus_trains_to_zeros(spark, tmp_path):
    t = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
        }
    )
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    feats = _spark_features(spread(load_table(spark, str(tmp_path), "documents")))
    assert train_logreg(feats) == [0.0] * 5


def test_auc_matches_pair_counting(spark, tmp_path):
    # tie-aware AUC from the grouped cumulative form must equal the
    # O(n^2) definition computed directly on the scored rows
    from cc_mapreducer_spark.operators.classifier import (
        classifier_eval_metrics,
        quality_classifier_scores,
    )

    sf = _write_planted(tmp_path)
    scored = quality_classifier_scores(spark, sf).collect()
    pos = [r["score"] for r in scored if r["y"] == 1]
    neg = [r["score"] for r in scored if r["y"] == 0]
    pairs = sum(
        1.0 if p > q else 0.5 if p == q else 0.0 for p in pos for q in neg
    )
    want = round(pairs / (len(pos) * len(neg)), 9)
    row = classifier_eval_metrics(spark, sf).collect()[0]
    assert row["auc"] == want
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert row["tp"] + row["fp"] + row["fn"] + row["tn"] == len(scored)


def test_calibration_bins_partition_the_corpus(spark, tmp_path):
    from cc_mapreducer_spark.operators.classifier import (
        classifier_calibration_bins,
    )

    sf = _write_planted(tmp_path)
    rows = classifier_calibration_bins(spark, sf).collect()
    assert sum(r["n"] for r in rows) == 80
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["frac_pos"] <= 1.0
        # mean score must sit inside its bin (inclusive upper edge for 9)
        lo, hi = r["bin"] / 10.0, (r["bin"] + 1) / 10.0 + 1e-9
        assert lo <= r["mean_score"] <= hi
