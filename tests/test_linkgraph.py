"""Domain link graph (operators/linkgraph.py): extraction decisions
(absolute-only, self-edges dropped), oracle parity, and PageRank over
the extracted graph pinned to the numpy power-iteration replica."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.linkgraph import (
    domain_link_edges,
    domain_pagerank,
    extract_domain_edges,
)

SF_ORACLE = "/root/testdata/sf0.01"


def test_extraction_decisions(spark):
    html = (
        '<p><a href="https://www.other.org/x">a</a> '
        '<a href="https://other.org/y">b</a> '          # no-www same domain
        '<a href="https://www.me.org/self">self</a> '   # self-edge
        '<a href="/relative/path">rel</a> '             # not absolute
        '<a href="https://third.net:8080/z">c</a></p>'  # port stripped
    )
    df = spark.createDataFrame(
        [("me.org", html)], "src_domain string, html string"
    )
    got = {
        (r.src_domain, r.dst_domain): r.n_links
        for r in extract_domain_edges(df).collect()
    }
    assert got == {("me.org", "other.org"): 2, ("me.org", "third.net"): 1}


def test_fixture_edges_shape(spark):
    edges = domain_link_edges(spark, SF_ORACLE).toPandas()
    # no self-edges survived
    assert (edges.src_domain != edges.dst_domain).all()
    # every doc contributes at most 2 cross-domain links
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_ORACLE}/documents.parquet'"
    ).fetchone()[0]
    assert edges.n_links.sum() <= 2 * n_docs
    assert edges.n_links.sum() > n_docs  # most docs contribute both


def _numpy_pagerank(edges, damping, iterations):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_w = np.zeros(n)
    for s, _, w in edges:
        out_w[idx[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s, d, w in edges:
            if out_w[idx[s]] > 0:
                contrib[idx[d]] += r[idx[s]] * w / out_w[idx[s]]
        dangling = r[out_w == 0].sum()
        r = (1 - damping) / n + damping * dangling / n + damping * contrib
    return dict(zip(nodes, r))


def test_domain_pagerank_matches_numpy(spark):
    edges = [
        (r.src_domain, r.dst_domain, float(r.n_links))
        for r in domain_link_edges(spark, SF_ORACLE).collect()
    ]
    expected = _numpy_pagerank(edges, 0.85, 10)
    got = {
        r.domain: r.rank for r in domain_pagerank(spark, SF_ORACLE).collect()
    }
    assert set(got) == set(expected)
    for d in expected:
        assert abs(got[d] - expected[d]) < 1e-9, d
    assert abs(sum(got.values()) - 1.0) < 1e-9
