"""DSIR importance resampling: the selection must actually skew toward
the target domain, weights must rank target-domain docs above others,
the draw must be partition-layout independent, and the plan must select
via TakeOrdered with broadcast model tables. DuckDB hash parity runs via
test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.dsir import (
    SELECT_K,
    TARGET_LANG,
    dsir_select,
    dsir_selected_docs,
    importance_weights,
)
from cc_mapreducer_spark.plans.inspect import formatted_plan
from cc_mapreducer_spark.tables import load_table
from tests.conftest import SF_ORACLE


def test_selection_skews_toward_target(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    pool_share = (
        docs.filter(F.col("lang") == TARGET_LANG).count() / docs.count()
    )
    sel = dsir_selected_docs(spark, SF_ORACLE)
    got = sel.collect()
    assert len(got) == SELECT_K
    sel_share = sum(1 for r in got if r.lang == TARGET_LANG) / len(got)
    # fr is ~13% of the pool; importance resampling toward fr must at
    # least double its share (in practice it near-saturates)
    assert sel_share > 2 * pool_share, (pool_share, sel_share)


def test_weights_rank_target_docs_highest(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    w = importance_weights(docs)
    means = {
        r.lang: r.m
        for r in w.groupBy("lang").agg(F.avg("weight").alias("m")).collect()
    }
    assert means[TARGET_LANG] == max(means.values())
    # and the target mean must be positive (docs from the target look
    # MORE like the target model than the raw model)
    assert means[TARGET_LANG] > 0


def test_selection_is_partition_invariant(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    a = sorted(r.doc_id for r in dsir_select(docs).collect())
    b = sorted(r.doc_id for r in dsir_select(docs.repartition(17)).collect())
    assert a == b


def test_plan_takeordered_and_broadcast_models(spark):
    plan = formatted_plan(dsir_selected_docs(spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in plan  # selection is never a global sort
    assert "BroadcastExchange" in plan  # the B-row ratio table broadcasts
