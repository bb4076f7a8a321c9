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
    # Null items (props without '$.k') must drop BEFORE the per-user cap:
    # a null that ties on n_touches sorts first under Spark's asc NULLS
    # FIRST but last under DuckDB's default NULLS LAST, so leaving it in
    # would let the two engines elect different cap slots — and hence
    # different edge sets (ADVICE r6).
    ui = (
        e.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("item"),
        )
        .filter(F.col("item").isNotNull())
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
        # dangling nodes (no outgoing edge) leak their mass: one O(1)
        # agg, broadcast back into the update as a 1-row frame so each
        # iteration is ONE job (the localCheckpoint), not a separate
        # driver collect per round. Expression order matches the old
        # driver-side arithmetic exactly: (d * m) / n, then the adds.
        dangling = (
            ranks.join(shares.select("src").distinct(),
                       ranks.node == F.col("src"), "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
        )
        base = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping) * F.col("m") / F.lit(float(n))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    base
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def _item_pagerank_sql(iters: int = 10, d: float = 0.85) -> str:
    """DuckDB oracle for item_pagerank (round 9, the domain_pagerank
    move): rebuild the weighted co-engagement edges in SQL (the
    _TRIANGLE_SQL derivation, weights = co-engaging user counts),
    symmetrize, and unroll the 10-round power method as generated
    MATERIALIZED CTEs. Inflow is a join-aggregate rather than a
    per-node correlated probe — the item graph is corpus-derived and
    can be thousands of nodes, unlike the domain graph. Ranks publish
    on the same 6dp grid as the query; cross-engine drift is summation
    order (~1e-13 relative), far below the grid."""
    head = f"""
WITH ui AS (
    SELECT user_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
           count(*) AS n_touches
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1, 2
), capped AS (
    SELECT user_id, item FROM (
        SELECT user_id, item,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n_touches DESC, item) AS rk
        FROM ui
    ) WHERE rk <= 64
), edges AS MATERIALIZED (
    SELECT a.item AS src, b.item AS dst,
           CAST(count(*) AS DOUBLE) AS w
    FROM capped a
    JOIN capped b ON a.user_id = b.user_id AND a.item < b.item
    GROUP BY 1, 2
), flow AS (
    SELECT src AS s, dst AS t, w FROM edges
    UNION ALL
    SELECT dst, src, w FROM edges
), outw AS (SELECT s, sum(w) AS ow FROM flow GROUP BY s),
shares AS MATERIALIZED (
    SELECT f.s, f.t, f.w / o.ow AS share FROM flow f JOIN outw o USING (s)
), nodes AS MATERIALIZED (
    SELECT DISTINCT d FROM (
        SELECT s AS d FROM flow UNION ALL SELECT t FROM flow
    )
), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS MATERIALIZED (
    SELECT d, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    steps = []
    for i in range(iters):
        steps.append(f""",
m{i} AS MATERIALIZED (
    SELECT coalesce(sum(rank), 0.0) AS m FROM r{i}
    WHERE d NOT IN (SELECT s FROM shares)
), inf{i} AS (
    SELECT sh.t AS d, sum(r.rank * sh.share) AS v
    FROM r{i} r JOIN shares sh ON sh.s = r.d GROUP BY sh.t
), r{i + 1} AS MATERIALIZED (
    SELECT n.d,
           ((1.0 - {d!r}) / (SELECT n FROM nn)
            + {d!r} * (SELECT m FROM m{i}) / (SELECT n FROM nn))
           + {d!r} * coalesce(i.v, 0.0) AS rank
    FROM nodes n LEFT JOIN inf{i} i ON i.d = n.d
)""")
    tail = f"""
SELECT d AS item, round(rank, 6) AS rank FROM r{iters}
"""
    return head + "".join(steps) + tail


# driver=False: hashed nowhere (the domain graph carries the driver
# evidence); oracle-backed since r9 via the unrolled power method
@register("item_pagerank", oracle=_item_pagerank_sql(), driver=False)
def item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality of items in the event co-engagement graph
    (both orientations of the undirected edges), 10 rounds at d=0.85,
    ranks on a 6dp grid. pytest pins the values against a dense numpy
    fixed point at 1e-9; the DuckDB oracle (_item_pagerank_sql) pins
    them cross-engine on the published grid."""
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


# --------------------------------------------------------------------------
# triangle counting (degree orientation) + local clustering coefficients
# --------------------------------------------------------------------------

# The canonical distributed triangle algorithm (Schank/Wagner's
# compact-forward, the shape every MPC/Spark treatment uses): orient
# each undirected edge from its lower-(degree, id) endpoint to the
# higher, enumerate wedges as pairs of out-neighbors, and close them
# with one equi-join back on the oriented edges. Orientation bounds
# every out-degree by O(sqrt(m)), so the wedge fanout — the only
# superlinear-risk step — is sum_u C(outdeg(u), 2) <= m^1.5 worst case
# and ~m * sqrt(m) / 2 only on pathological graphs; a power-law graph's
# hubs become SINKS (high rank), never wedge centers, which is exactly
# the skew story at 100 TB: the bot item with a million neighbors
# receives edges but spawns no wedges. Plans: one groupBy for degrees,
# two broadcast-eligible degree joins, one self-join on the wedge
# center (out-edges co-partition by `a`), one closing equi-join on
# (v, w) pairs, one explode + groupBy for per-node counts.

_TRIANGLE_SQL = """
WITH ui AS (
    SELECT user_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
           count(*) AS n_touches
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1, 2
), capped AS (
    SELECT user_id, item FROM (
        SELECT user_id, item,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n_touches DESC, item) AS rk
        FROM ui
    ) WHERE rk <= 64
), edges AS (
    SELECT a.item AS src, b.item AS dst
    FROM capped a
    JOIN capped b ON a.user_id = b.user_id AND a.item < b.item
    GROUP BY 1, 2
), deg AS (
    SELECT node, count(*) AS d FROM (
        SELECT src AS node FROM edges
        UNION ALL SELECT dst FROM edges
    ) GROUP BY node
), oriented AS (
    SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.src < e.dst)
                THEN e.src ELSE e.dst END AS a,
           CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.src < e.dst)
                THEN e.dst ELSE e.src END AS b,
           CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.src < e.dst)
                THEN db.d ELSE da.d END AS bd
    FROM edges e
    JOIN deg da ON da.node = e.src
    JOIN deg db ON db.node = e.dst
), wedges AS (
    SELECT x.a AS u, x.b AS v, y.b AS w
    FROM oriented x
    JOIN oriented y ON x.a = y.a
     AND ((x.bd < y.bd) OR (x.bd = y.bd AND x.b < y.b))
), tri AS (
    SELECT wg.u, wg.v, wg.w
    FROM wedges wg JOIN oriented o ON o.a = wg.v AND o.b = wg.w
), pernode AS (
    SELECT node, count(*) AS n FROM (
        SELECT u AS node FROM tri
        UNION ALL SELECT v FROM tri
        UNION ALL SELECT w FROM tri
    ) GROUP BY node
)
SELECT d.node AS item,
       CAST(d.d AS BIGINT) AS degree,
       CAST(coalesce(p.n, 0) AS BIGINT) AS n_triangles,
       round(CASE WHEN d.d >= 2
                  THEN 2.0 * coalesce(p.n, 0) / (d.d * (d.d - 1))
                  ELSE 0 END, 6) AS clustering_coeff
FROM deg d LEFT JOIN pernode p ON p.node = d.node
"""


def triangle_stats(edges: DataFrame) -> DataFrame:
    """(item, degree, n_triangles, clustering_coeff) for every node of a
    canonically-oriented (src < dst, one row per undirected pair) edge
    frame. Pure integer joins + one rounded small-int division."""
    und = edges.select("src", "dst")
    deg = (
        und.select(F.col("src").alias("node"))
        .unionByName(und.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    e = und.join(
        deg.select(F.col("node").alias("src"), F.col("d").alias("ds")), "src"
    ).join(
        deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst"
    )
    fwd = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    oriented = e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("b"),
        F.when(fwd, F.col("dd")).otherwise(F.col("ds")).alias("bd"),
    )
    x = oriented.alias("x")
    y = oriented.alias("y")
    wedges = x.join(
        y,
        (F.col("x.a") == F.col("y.a"))
        & (
            (F.col("x.bd") < F.col("y.bd"))
            | ((F.col("x.bd") == F.col("y.bd")) & (F.col("x.b") < F.col("y.b")))
        ),
    ).select(
        F.col("x.a").alias("u"), F.col("x.b").alias("v"), F.col("y.b").alias("w")
    )
    closing = oriented.select(F.col("a").alias("v"), F.col("b").alias("w"))
    tri = wedges.join(closing, ["v", "w"])
    pernode = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n"))
    )
    return deg.join(pernode, "node", "left").select(
        F.col("node").alias("item"),
        F.col("d").cast("bigint").alias("degree"),
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_triangles"),
        F.round(
            F.when(
                F.col("d") >= 2,
                2.0 * F.coalesce("n", F.lit(0)) / (F.col("d") * (F.col("d") - 1)),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("clustering_coeff"),
    )


@register("item_triangle_stats", oracle=_TRIANGLE_SQL, driver=False)
def item_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item triangle counts and local clustering coefficients over
    the co-engagement graph (build_item_graph's capped, canonically-
    oriented edges) via degree-oriented wedge closing — the community-
    density signal next to item_pagerank's centrality. All-integer until
    one rounded division, so the oracle hashes every value."""
    return triangle_stats(build_item_graph(spark, sf_dir))
