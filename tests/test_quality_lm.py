"""LM perplexity quality scoring: DuckDB bit-parity on the driver corpus
(covered by the auto parity gate too), a pure-Python model cross-check,
and behavior pins — fluent (in-distribution) text must score lower
perplexity than shuffled-vocabulary gibberish."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.quality_lm import (
    LAM,
    lm_doc_scores,
    lm_quality_buckets,
    token_stream,
)
from cc_mapreducer_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _py_reference(texts: dict[int, str], lam: float = LAM) -> dict[int, tuple[int, float, float]]:
    """Independent plain-Python implementation of the documented model
    (same tokenizer, same fold order) — no Spark, no DuckDB."""
    import re

    toks = {
        d: [w for w in re.sub(r"[^a-z]+", " ", t.lower()).split(" ") if w]
        for d, t in texts.items()
    }
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for ws in toks.values():
        for i, w in enumerate(ws):
            uni[w] = uni.get(w, 0) + 1
            if i > 0:
                bi[(ws[i - 1], w)] = bi.get((ws[i - 1], w), 0) + 1
    n_total, n_vocab = sum(uni.values()), len(uni)
    out = {}
    for d, ws in toks.items():
        if not ws:
            continue
        lp = 0.0
        for i, w in enumerate(ws):
            pu = float(uni.get(w, 0) + 1) / float(n_total + n_vocab + 1)
            if i == 0:
                p = pu
            else:
                pb = (
                    float(bi[(ws[i - 1], w)]) / float(uni[ws[i - 1]])
                    if (ws[i - 1], w) in bi
                    else 0.0
                )
                p = lam * pb + (1.0 - lam) * pu
            lp += math.log(p)
        out[d] = (len(ws), lp, math.exp(-(lp / len(ws))))
    return out


def test_scores_match_python_reference(spark):
    texts = {
        1: "the cat sat on the mat and the cat sat again",
        2: "Zygote! quartz-vex jump; blitz frogs nymph.",
        3: "the cat sat on the mat",
        4: "",
        5: "solo",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm_doc_scores(df).collect()}
    ref = _py_reference(texts)
    assert set(got) == set(ref)  # doc 4 (empty) absent from both
    for d, (n, lp, ppl) in ref.items():
        assert got[d]["n_tokens"] == n
        assert got[d]["log_prob"] == lp  # bit-exact: same IEEE op sequence
        assert got[d]["ppl"] == ppl


def test_repetitive_text_scores_below_gibberish(spark):
    # 30 docs drawn from a tiny fluent pattern + 3 one-off token-salad
    # docs: the LM is trained on the union, so the pattern docs sit in
    # distribution (low ppl) and the salads out of it (high ppl).
    fluent = [(i, "the quick brown fox jumps over the lazy dog") for i in range(30)]
    salad = [(100, "qqq zzz www yyy xxx"), (101, "aa bb cc dd ee"), (102, "zz yy xx wwk vv")]
    df = spark.createDataFrame(fluent + salad, "doc_id long, text string")
    rows = {r["doc_id"]: r["ppl"] for r in lm_doc_scores(df).collect()}
    worst_fluent = max(v for d, v in rows.items() if d < 100)
    best_salad = min(v for d, v in rows.items() if d >= 100)
    assert worst_fluent < best_salad


def test_buckets_partition_corpus(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = lm_quality_buckets(docs)
    counts = {r["bucket"]: r["n"] for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    n_docs = docs.count()
    assert sum(counts.values()) == n_docs
    assert set(counts) <= {"head", "middle", "tail", None}
    # tertile split: each named bucket holds roughly a third (exact
    # percentile thresholds; <= comparisons make head/middle >= third)
    for b in ("head", "middle", "tail"):
        assert counts.get(b, 0) >= n_docs // 4


def test_token_stream_prev_alignment(spark):
    df = spark.createDataFrame([(7, "alpha beta gamma")], "doc_id long, text string")
    rows = sorted(
        token_stream(df).collect(), key=lambda r: r["pos"]
    )
    assert [(r["pos"], r["word"], r["prev"]) for r in rows] == [
        (1, "alpha", None),
        (2, "beta", "alpha"),
        (3, "gamma", "beta"),
    ]
