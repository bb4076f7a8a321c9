"""Degree-oriented triangle counting (operators/graph.py:triangle_stats):
planted-graph exactness, orientation invariance, and the full node
domain. The registered item_triangle_stats is DuckDB-parity-checked by
test_oracle_parity like every oracle-backed key (note: the sf0.01
co-engagement graph is complete — every wedge closes — so the planted
non-trivial graph here is the discriminating witness)."""

from __future__ import annotations

from cc_mapreducer_spark.operators.graph import triangle_stats


def _stats(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["item"]: r for r in triangle_stats(df).collect()}


def test_planted_k4_plus_tail(spark):
    # K4 on {1,2,3,4} (4 triangles, 3 per member) + path 4-5-6 (none)
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6),
    ]
    got = _stats(spark, edges)
    assert {k: r["n_triangles"] for k, r in got.items()} == {
        1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0,
    }
    assert got[1]["degree"] == 3 and got[1]["clustering_coeff"] == 1.0
    assert got[4]["degree"] == 4 and got[4]["clustering_coeff"] == 0.5
    assert got[5]["degree"] == 2 and got[5]["clustering_coeff"] == 0.0
    assert got[6]["degree"] == 1 and got[6]["clustering_coeff"] == 0.0


def test_triangle_free_graph(spark):
    # C4 (square): 4 edges, no triangles, every clustering coeff 0
    got = _stats(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    assert all(r["n_triangles"] == 0 for r in got.values())
    assert all(r["clustering_coeff"] == 0.0 for r in got.values())


def test_star_hub_spawns_no_wedge_center(spark):
    # star K1,5: hub degree 5, no triangles — the skew case the
    # orientation exists for (the hub is every edge's SINK)
    got = _stats(spark, [(1, h) for h in range(2, 7)])
    assert got[1]["degree"] == 5 and got[1]["n_triangles"] == 0
    assert all(got[h]["n_triangles"] == 0 for h in range(2, 7))


def test_complete_graph_counts(spark):
    # K5: C(5,3)=10 triangles, each node in C(4,2)=6, coefficient 1.0
    edges = [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]
    got = _stats(spark, edges)
    assert all(r["n_triangles"] == 6 for r in got.values())
    assert all(r["clustering_coeff"] == 1.0 for r in got.values())
    assert all(r["degree"] == 4 for r in got.values())
