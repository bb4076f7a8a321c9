"""Collocation statistics: hand-computed G2/PMI on a planted corpus,
min-count pruning, and the TakeOrdered ranking plan. DuckDB parity for
the registered key runs via test_oracle_parity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.collocations import (
    collocations,
    collocations_top,
)
from tests.conftest import SF_ORACLE


def _corpus(spark):
    # "strong tea": words appear ONLY together (perfect association);
    # "the cat": same pair count but "the" also precedes dog/bird, so
    # its first-word margin is 3x diffuse -> both statistics must rank
    # (strong, tea) above (the, cat)
    rows = []
    for i in range(6):
        rows.append(
            (i, "strong tea the cat of day the dog of night the bird of dawn")
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_statistics_match_hand_computation(spark):
    out = {
        (r.w1, r.w2): r
        for r in collocations(_corpus(spark), min_count=5, k=20).collect()
    }
    assert ("strong", "tea") in out and ("the", "cat") in out
    st, of = out[("strong", "tea")], out[("the", "cat")]
    assert st.llr > of.llr and st.pmi > of.pmi

    # hand-check PMI for (strong, tea): each doc has 13 bigrams, N=78;
    # k11 = 6, r1(strong·) = 6, c1(·tea) = 6
    expect_pmi = round(math.log(6 * 78 / (6 * 6)), 6)
    assert st.pmi == expect_pmi
    assert st.n_pair == 6

    # hand-check G2 via the same contingency table
    def g2(k11, r1, c1, nn):
        k12, k21 = r1 - k11, c1 - k11
        k22 = nn - r1 - c1 + k11
        tot = 0.0
        for o, rr, cc in (
            (k11, r1, c1),
            (k12, r1, nn - c1),
            (k21, nn - r1, c1),
            (k22, nn - r1, nn - c1),
        ):
            if o > 0:
                tot += o * math.log(o * nn / (rr * cc))
        return round(2.0 * tot, 6)

    assert st.llr == g2(6, 6, 6, 78)
    assert of.llr == g2(6, 18, 6, 78)


def test_min_count_prunes_before_joins(spark):
    # pairs below the floor never appear, whatever their PMI
    out = collocations(_corpus(spark), min_count=7, k=10).collect()
    assert out == []


def test_registered_key_ranks_by_llr_and_plan(spark):
    df = collocations_top(spark, SF_ORACLE)
    rows = df.collect()
    assert 0 < len(rows) <= 50
    llrs = [r.llr for r in rows]
    assert llrs == sorted(llrs, reverse=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
