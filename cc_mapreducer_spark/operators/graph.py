"""Graph analytics over DataFrames: co-engagement graph + PageRank.

Complements operators/clustering.py (connected components): clustering
answers "which docs are the same", PageRank answers "which nodes matter"
— the standard centrality prior for crawl frontier ordering and
training-corpus source weighting (the original use: rank pages by link
structure, Page et al. 1999). The reference engine has no graph surface
at all.

Graph construction and iteration are plain DataFrame ops:

  build_item_graph  user->item bipartite projection to a weighted
                    item-item co-engagement graph. The self-join keys on
                    user_id (ONE shuffle); per-user item sets are capped
                    (top max_items_per_user by frequency) so a single
                    hot user cannot emit a quadratic pair blowup — the
                    same guard every co-occurrence pipeline ships at
                    scale.
  pagerank          weighted PageRank, fixed damping/iterations. Each
                    iteration is join(ranks, edges on src) -> groupBy
                    (dst) sum — two shuffles keyed by node id, both
                    near-uniform after the degree cap. Lineage is
                    truncated per round (localCheckpoint; a cluster
                    writes parquet checkpoints instead). Dangling mass
                    is redistributed uniformly via one O(1) agg per
                    round, not a collect.

Float determinism: rank sums are unordered cross-partition double adds,
so exact bit-equality is not reproducible engine-to-engine OR run-to-run
— the published query rounds to a 6dp grid and registers driver=False
with a numpy fixed-point cross-check in pytest (same policy as the IVF
and PQ ANN variants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table


def build_item_graph(
    spark: SparkSession, sf_dir: str, max_items_per_user: int = 64
) -> DataFrame:
    """Weighted undirected item-item co-engagement edges from events:
    weight(i, j) = number of distinct users who touched both items.
    Returned canonically oriented (src < dst), one row per pair.

    The per-user item cap bounds the pair fanout at
    C(max_items_per_user, 2) regardless of how active a user is —
    without it, one bot account touching every item yields |items|^2
    pairs into one task.
    """
    e = load_table(spark, sf_dir, "events")
    ui = (
        e.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("item"),
        )
        .groupBy("user_id", "item")
        .agg(F.count("*").alias("n_touches"))
    )
    cap = Window.partitionBy("user_id").orderBy(
        F.desc("n_touches"), F.asc("item")
    )
    ui = ui.withColumn("rk", F.row_number().over(cap)).filter(
        F.col("rk") <= max_items_per_user
    )
    a = ui.select("user_id", F.col("item").alias("src"))
    b = ui.select(F.col("user_id").alias("uid2"), F.col("item").alias("dst"))
    return (
        a.join(b, (a.user_id == b.uid2) & (a.src < b.dst))
        .groupBy("src", "dst")
        .agg(F.count_distinct("user_id").alias("weight"))
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """Weighted PageRank with a fixed iteration count. ``edges`` is
    directed; pass both orientations for an undirected graph. Returns
    (node, rank) with sum(rank) == 1 (dangling mass redistributed
    uniformly each round).

    Per iteration: ranks ⋈ edges on src (shuffle 1) -> contributions
    grouped by dst (shuffle 2) -> closed-form update. The edge set with
    per-source weight shares is computed once and cached; only the rank
    vector (|V| rows) moves per round.
    """
    ed = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
        F.col(weight).cast("double").alias("w"),
    )
    # Zero-weight edges carry no flow but their endpoints are still graph
    # nodes (`nodes` below is built from the UNfiltered edge set). The
    # shares table must exclude them: a source whose weights sum to 0
    # would otherwise appear in shares.src with null w/0 shares —
    # contributing no outflow yet not counted as dangling — and its rank
    # mass would leak every iteration, drifting sum(rank) below 1.
    # Filtered out, such a source is classified dangling and its mass
    # redistributes uniformly, which is the standard treatment.
    flow = ed.filter(F.col("w") > 0)
    out_w = flow.groupBy("src").agg(F.sum("w").alias("out_w"))
    shares = (
        flow.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("share"))
        .localCheckpoint()
    )
    nodes = (
        ed.select(F.col("src").alias("node"))
        .unionAll(ed.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:  # empty edge set: no nodes, empty ranks with the schema
        return nodes.select("node", F.lit(0.0).alias("rank"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contrib = (
            ranks.join(shares, ranks.node == shares.src)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("share")).alias("inflow"))
        )
        # dangling nodes (no outgoing edge) leak their mass: collect the
        # leaked total with one O(1) agg and spread it uniformly
        dangling = (
            ranks.join(shares.select("src").distinct(),
                       ranks.node == F.col("src"), "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
            .first()["m"]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


@register("item_pagerank", driver=False)  # float iteration: numpy-checked in pytest
def item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality of items in the event co-engagement graph
    (both orientations of the undirected edges), 10 rounds at d=0.85,
    ranks on a 6dp grid. rows-only for the driver: cross-partition
    double summation is not bit-stable; pytest pins the values against
    a dense numpy fixed point at 1e-9."""
    g = build_item_graph(spark, sf_dir)
    sym = g.unionAll(
        g.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    pr = pagerank(sym, damping=0.85, iterations=10)
    return pr.select(
        F.col("node").alias("item"), F.round("rank", 6).alias("rank")
    )
