"""PageRank: numpy fixed-point cross-check, mass conservation,
dangling-node handling, and the per-user pair-fanout cap."""

from __future__ import annotations

import numpy as np

from cc_mapreducer_spark.operators.graph import (
    build_item_graph,
    item_pagerank,
    pagerank,
)
from tests.conftest import SF_ORACLE, SF_SMOKE


def _numpy_pagerank(edge_rows, damping, iterations):
    nodes = sorted({r[0] for r in edge_rows} | {r[1] for r in edge_rows})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, d, w in edge_rows:
        W[idx[s], idx[d]] = w
    out = W.sum(axis=1, keepdims=True)
    shares = np.divide(W, out, out=np.zeros_like(W), where=out > 0)
    r = np.full(n, 1.0 / n)
    dangling_mask = (out[:, 0] == 0)
    for _ in range(iterations):
        leaked = r[dangling_mask].sum()
        r = (1 - damping) / n + damping * leaked / n + damping * (shares.T @ r)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_and_conserves_mass(spark):
    g = build_item_graph(spark, SF_ORACLE)
    edge_rows = [(r["src"], r["dst"], float(r["weight"])) for r in g.collect()]
    sym = edge_rows + [(d, s, w) for s, d, w in edge_rows]
    expected = _numpy_pagerank(sym, 0.85, 10)

    got = {r["item"]: r["rank"] for r in item_pagerank(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for v, r in expected.items():
        assert abs(got[v] - r) < 1e-6 + 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-4  # 6dp grid rounding slack


def test_pagerank_dangling_and_asymmetric(spark):
    # chain 1->2->3 with 3 dangling: known closed-form fixed point
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, 0.85, 40).collect()}
    expected = _numpy_pagerank([(1, 2, 1.0), (2, 3, 1.0)], 0.85, 40)
    for v in expected:
        assert abs(got[v] - expected[v]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_symmetric_star_center_dominates(spark):
    # star: hub 0 connected to 1..5 — hub must outrank every leaf, and
    # all leaves tie exactly by symmetry
    rows = []
    for leaf in range(1, 6):
        rows += [(0, leaf, 1.0), (leaf, 0, 1.0)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    got = {r["node"]: r["rank"] for r in pagerank(edges, 0.85, 20).collect()}
    leaf_ranks = [got[i] for i in range(1, 6)]
    assert got[0] > max(leaf_ranks)
    assert max(leaf_ranks) - min(leaf_ranks) < 1e-15


def test_item_graph_cap_bounds_fanout(spark):
    full = build_item_graph(spark, SF_SMOKE, max_items_per_user=64)
    capped = build_item_graph(spark, SF_SMOKE, max_items_per_user=5)
    # cap keeps at most C(5,2)=10 pairs per user -> strictly fewer edges
    assert capped.count() < full.count()
    # capped edges are a subset of the full pair set (the cap only prunes)
    full_pairs = {(r["src"], r["dst"]) for r in full.collect()}
    capped_pairs = {(r["src"], r["dst"]) for r in capped.collect()}
    assert capped_pairs <= full_pairs


def test_item_graph_weights_are_shared_user_counts(spark):
    g = {(r["src"], r["dst"]): r["weight"] for r in build_item_graph(spark, SF_SMOKE).collect()}
    # recompute one pair's weight straight from the raw table
    import duckdb

    con = duckdb.connect()
    (s, d), w = next(iter(sorted(g.items())))
    got = con.sql(
        f"""
        WITH ui AS (SELECT DISTINCT user_id,
                    CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
                    FROM '{SF_SMOKE}/events.parquet')
        SELECT count(*) FROM ui a JOIN ui b USING (user_id)
        WHERE a.item = {s} AND b.item = {d}
        """
    ).fetchone()[0]
    con.close()
    assert got == w


def test_pagerank_zero_weight_edges_no_mass_leak(spark):
    # ADVICE r3: a source whose edge weights sum to 0 produced null w/0
    # shares — no outflow, yet not classified dangling — leaking its rank
    # mass every round. Zero-weight edges must carry no flow, their
    # endpoints stay nodes, and sum(rank) stays 1.
    edges = spark.createDataFrame(
        [
            (1, 2, 1.0),
            (2, 1, 1.0),
            (3, 1, 0.0),  # node 3's ONLY edge: zero weight -> dangling
            (1, 4, 0.0),  # zero-weight alongside real flow: ignored
        ],
        "src long, dst long, weight double",
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iterations=8).collect()}
    assert set(ranks) == {1, 2, 3, 4}  # zero-weight endpoints are still nodes
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert all(v > 0 for v in ranks.values())
