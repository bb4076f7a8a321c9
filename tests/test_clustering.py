"""Connected-components / duplicate-cluster tests.

Three independent checks: a pure-Python union-find on adversarial graphs
(long chains force multiple star rounds), a DuckDB recursive-CTE
transitive closure on a seeded random graph, and the end-to-end
duplicate_clusters operator against union-find over the LSH pairs it
consumes."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.clustering import (
    connected_components,
    duplicate_clusters,
)
from tests.conftest import SF_ORACLE
from tests.oracle import duckdb_connection


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _spark_components(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: r.component for r in connected_components(df, "src", "dst").collect()
    }


def test_chain_graph_collapses(spark):
    """A 60-node path has diameter 59 — min-label propagation would need
    ~59 rounds; the star alternation must converge inside max_rounds=25
    and put every node in component 0."""
    edges = [(i, i + 1) for i in range(59)]
    got = _spark_components(spark, edges)
    assert got == {i: 0 for i in range(60)}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [e for e in edges if e[0] != e[1]]
    got = _spark_components(spark, edges)
    assert got == _union_find(edges)


def test_disjoint_cliques_and_duplicate_edges(spark):
    edges = []
    for base in (0, 100, 200):
        members = [base + i for i in range(5)]
        edges += [(a, b) for a in members for b in members if a < b]
    edges += edges[:10]  # duplicates must not matter
    got = _spark_components(spark, edges)
    for base in (0, 100, 200):
        for i in range(5):
            assert got[base + i] == base


def test_recursive_cte_oracle(spark):
    """DuckDB recursive CTE computes min-reachable-node per node — the
    same component labeling, derived by a completely different engine
    and algorithm."""
    rng = random.Random(13)
    edges = sorted({(rng.randrange(80), rng.randrange(80)) for _ in range(60)})
    edges = [e for e in edges if e[0] != e[1]]
    got = _spark_components(spark, edges)

    con = duckdb_connection(SF_ORACLE)
    con.sql(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        + ",".join(f"({a},{b})" for a, b in edges)
        + ") t(a, b)"
    )
    oracle = con.sql(
        """
        WITH RECURSIVE bi AS (
            SELECT a, b FROM e UNION SELECT b, a FROM e
        ), reach(n, m) AS (
            SELECT a, a FROM (SELECT a FROM bi UNION SELECT b FROM bi)
            UNION
            SELECT bi.b, reach.m FROM reach JOIN bi ON bi.a = reach.n
        )
        SELECT n AS node, min(m) AS component FROM reach GROUP BY n
        """
    ).df()
    assert got == dict(zip(oracle["node"].astype(int), oracle["component"].astype(int)))


def test_duplicate_clusters_end_to_end(spark):
    """Cluster ids equal union-find over the exact pair list the operator
    consumes; every doc appears exactly once; keepers are the cluster
    minima."""
    from cc_mapreducer_spark.operators.dedup import near_dedup_minhash

    pairs = [
        (r.doc_a, r.doc_b)
        for r in near_dedup_minhash(spark, SF_ORACLE)
        .filter(F.col("jaccard") >= 0.2)
        .collect()
    ]
    assert pairs, "fixture corpus should contain near-duplicate pairs"
    expected = _union_find(pairs)

    out = duplicate_clusters(spark, SF_ORACLE).collect()
    n_docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").count()
    assert len(out) == n_docs
    assert len({r.doc_id for r in out}) == n_docs
    for r in out:
        assert r.cluster_id == expected.get(r.doc_id, r.doc_id)
        assert r.is_keeper == (r.doc_id == r.cluster_id)


def test_canonical_docs_pick_max_quality_member(spark):
    from cc_mapreducer_spark.operators.clustering import canonical_docs, duplicate_clusters
    from cc_mapreducer_spark.operators.text_analysis import quality_score
    from pyspark.sql import functions as F

    canon = canonical_docs(spark, SF_ORACLE)
    clusters = duplicate_clusters(spark, SF_ORACLE)
    # covers the corpus exactly once
    assert canon.agg(F.sum("n_members")).first()[0] == clusters.count()
    # the canonical member's quality is the cluster max (9dp grid)
    q = quality_score(spark, SF_ORACLE).select("doc_id", "quality_score")
    member_q = (
        clusters.join(q, "doc_id", "left")
        .groupBy("cluster_id")
        .agg(F.max(F.round(F.coalesce("quality_score", F.lit(0.0)), 9)).alias("max_q"))
    )
    joined = canon.join(member_q, "cluster_id")
    assert joined.filter(F.col("canonical_quality") != F.col("max_q")).count() == 0
    # canonical doc is a member of its own cluster
    bad = canon.join(
        clusters.withColumnRenamed("doc_id", "canonical_doc"),
        ["cluster_id", "canonical_doc"],
        "left_anti",
    )
    assert bad.count() == 0


def test_leakage_safe_split_cluster_atomic(spark):
    from cc_mapreducer_spark.operators.clustering import leakage_safe_split
    from pyspark.sql import functions as F

    s = leakage_safe_split(spark, SF_ORACLE)
    # the guarantee: no cluster straddles the split
    straddle = (
        s.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert straddle.count() == 0
    # both sides populated and ~90/10 at the CLUSTER level
    per_split = {r["split"]: r["n"] for r in
                 s.select("cluster_id", "split").distinct()
                  .groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(per_split) == {"train", "val"}
    frac = per_split["train"] / sum(per_split.values())
    assert 0.8 < frac < 0.97
