"""Duplicate-cluster resolution: connected components over near-duplicate
pairs (the step AFTER pair detection in a production dedup pipeline).

LSH / SimHash emit PAIRS; keeping one document per duplicate *group*
requires the transitive closure of those pairs. This module implements
the alternating large-star / small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public
algorithm), which converges in O(log^2 n) rounds independent of component
diameter. A naive min-label propagation needs O(diameter) rounds — a
10^6-long chain of pairwise-similar crawl snapshots would need 10^6
shuffles; star operations collapse it in ~20.

Scale shape per round: ONE groupBy-key shuffle of the edge set (window
min over the source node), map-side emit, distinct. Edges only shrink
toward the final star graph (one edge per non-root node), and lineage is
truncated every round with localCheckpoint — on a cluster you would
checkpoint to durable storage instead (documented inline).

Driver-hashed since round 3: the ITERATION SCHEDULE is data-dependent,
but the RESULT (min-node component labeling) is a pure function of the
edge set, so the DuckDB oracle states the semantics declaratively as a
recursive-CTE transitive closure over the same MinHash pair SQL —
different engine, different algorithm, same fixpoint.
tests/test_clustering.py additionally union-find cross-checks adversarial
graphs (long chains force multiple star rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cc_mapreducer_spark.operators.dedup import _NEAR_DEDUP_SQL, near_dedup_minhash
from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star round over an undirected edge set.

    ``edges`` holds (u, v) pairs, u != v, each undirected edge in
    canonical (min, max) orientation. Both operations attach nodes to the
    minimum of their neighborhood:

    * large-star: for every node u, connect each STRICTLY LARGER
      neighbor v to min(neighborhood(u) + {u}). Operates on the
      bidirected edge list.
    * small-star: orient edges large->small; for every node u, connect
      each smaller neighbor (and u itself) to the minimum.
    """
    if large:
        directed = edges.select("u", "v").unionAll(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
    else:
        directed = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
    w = Window.partitionBy("u")
    with_min = directed.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
    if large:
        out = with_min.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    else:
        out = (
            with_min.select("v", "m")
            .unionAll(with_min.select(F.col("u").alias("v"), "m").distinct())
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
    # canonical orientation + drop self-loops; distinct bounds the edge set
    return (
        out.filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_rounds: int = 25
) -> DataFrame:
    """Connected components of an undirected graph given as an edge list.

    Returns (node, component) for every node that appears in ``edges``,
    where component is the MINIMUM node id of its component — a stable,
    deterministic cluster id. Alternates large-star / small-star until
    the edge checksum is stable (the converged state is a star graph:
    exactly one edge root->member per non-root node).

    Each round localCheckpoints the shrinking edge set to truncate
    lineage (a cluster deployment would write to durable checkpoint
    storage / parquet instead — same plan, different sink).
    """
    # Materialize the input ONCE: `nodes` and `e` both read it, and the
    # roots anti-join reads `nodes` again after the loop — without this
    # checkpoint an expensive upstream plan (the MinHash-LSH verify that
    # duplicate_clusters feeds in) re-executes per consumer. At 100 TB
    # this is the "write pairs to parquet before clustering" step every
    # dedup pipeline does anyway.
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col(src).cast("long").alias("u"))
        .unionAll(edges.select(F.col(dst).cast("long").alias("u")))
        .distinct()
    )
    e = (
        edges.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    prev = None
    for _ in range(max_rounds):
        e = _star_round(_star_round(e, large=True), large=False).localCheckpoint()
        # one tiny driver-side checksum per round decides convergence —
        # O(1) result over one agg job, not a collect of the edge set
        sig = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),  # order-free, no ANSI overflow
        ).first()
        cur = (sig["n"], sig["h"])
        if cur == prev:
            break
        prev = cur
    # converged star graph: u (member) -> v (root = component min);
    # nodes without an outgoing edge are their own root
    membership = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = nodes.join(membership, nodes["u"] == membership["node"], "left_anti").select(
        F.col("u").alias("node"), F.col("u").alias("component")
    )
    return membership.unionAll(roots)


_DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS (
{_NEAR_DEDUP_SQL}
), bi AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs
), reach(n, m) AS (
    SELECT a, a FROM (SELECT a FROM bi UNION SELECT b FROM bi)
    UNION
    SELECT bi.b, reach.m FROM reach JOIN bi ON bi.a = reach.n
), comp AS (
    SELECT n AS node, min(m) AS component FROM reach GROUP BY n
)
SELECT d.doc_id,
       COALESCE(c.component, d.doc_id) AS cluster_id,
       d.doc_id = COALESCE(c.component, d.doc_id) AS is_keeper
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
"""


@register("duplicate_clusters", oracle=_DUP_CLUSTERS_SQL)
def duplicate_clusters(
    spark: SparkSession, sf_dir: str, pairs: DataFrame | None = None
) -> DataFrame:
    """End-to-end dedup-cluster resolution on the documents table:
    MinHash-LSH pairs (jaccard >= dedup.NEAR_DUP_JACCARD) -> connected
    components -> (doc_id, cluster_id, is_keeper). Keeper policy: lowest
    doc_id per cluster (deterministic; swap in any scoring rank at the
    marked line). Pass ``pairs`` (doc_a, doc_b, already thresholded) to
    reuse a pair set another stage computed — the curation DAG shares one
    LSH pass between clustering and contamination instead of running the
    band join twice.

    Docs that never appear in a pair are their own singleton cluster —
    the output covers the FULL corpus, which is what a filter-stage
    consumer needs (``WHERE is_keeper``)."""
    if pairs is None:
        pairs = near_dedup_minhash(spark, sf_dir)
    comp = connected_components(pairs, "doc_a", "doc_b")
    all_docs = load_table(spark, sf_dir, "documents").select("doc_id")
    clustered = all_docs.join(
        comp, all_docs["doc_id"] == comp["node"], "left"
    ).select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("cluster_id"),
    )
    # keeper = cluster minimum (== cluster_id by construction); replace
    # with e.g. argmax(quality_score) for a scored keeper policy
    return clustered.withColumn("is_keeper", F.col("doc_id") == F.col("cluster_id"))


# --------------------------------------------------------------------------
# cluster-aware curation (round 4): canonical-doc selection + leakage-safe
# splits — the two consumers of the cluster labels a real pipeline needs
# --------------------------------------------------------------------------

# shared CTE prefix: MinHash pairs -> recursive transitive closure ->
# full-corpus (doc_id, cluster_id); identical to _DUP_CLUSTERS_SQL's body
_CLUSTERS_CTE = f"""
WITH RECURSIVE pairs AS (
{_NEAR_DEDUP_SQL}
), bi AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs
), reach(n, m) AS (
    SELECT a, a FROM (SELECT a FROM bi UNION SELECT b FROM bi)
    UNION
    SELECT bi.b, reach.m FROM reach JOIN bi ON bi.a = reach.n
), comp AS (
    SELECT n AS node, min(m) AS component FROM reach GROUP BY n
), clusters AS (
    SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
)
"""


def _canonical_sql() -> str:
    from cc_mapreducer_spark.operators.text_analysis import _QUALITY_SQL

    # quality rounded to 9dp BEFORE ranking: both engines compute the
    # same doubles (text_profile is hash-green), and the grid removes
    # any last-ulp ambiguity from the argmax; ties break on doc_id
    return (
        _CLUSTERS_CTE
        + f""", q AS (
{_QUALITY_SQL}
), ranked AS (
    SELECT cl.cluster_id, cl.doc_id,
           round(COALESCE(q.quality_score, 0.0), 9) AS qs,
           row_number() OVER (
               PARTITION BY cl.cluster_id
               ORDER BY round(COALESCE(q.quality_score, 0.0), 9) DESC,
                        cl.doc_id
           ) AS rn
    FROM clusters cl LEFT JOIN q ON q.doc_id = cl.doc_id
)
SELECT cluster_id,
       max(CASE WHEN rn = 1 THEN doc_id END) AS canonical_doc,
       max(CASE WHEN rn = 1 THEN qs END) AS canonical_quality,
       CAST(count(*) AS BIGINT) AS n_members
FROM ranked GROUP BY cluster_id
"""
    )


@register("canonical_docs", oracle=_canonical_sql(), driver=False)
def canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: per duplicate cluster, keep the
    HIGHEST-QUALITY member, not an arbitrary one. duplicate_clusters'
    default keeper (cluster-min doc_id) is deterministic but blind — in
    a crawl, the lowest id is often the truncated or boilerplate-laden
    first fetch; ranking by the existing heuristic quality score keeps
    the best copy. Output: (cluster_id, canonical_doc,
    canonical_quality, n_members).

    Plan shape: cluster labels (the CC fixpoint) LEFT-join the per-doc
    quality scores on doc_id, then ONE cluster-keyed window picks the
    argmax — quality desc on a 9dp grid, doc_id tiebreak — and the same
    Exchange satisfies the per-cluster count. Nothing here is new
    shuffle topology: corpus-keyed join + one keyed window."""
    from cc_mapreducer_spark.operators.text_analysis import quality_score

    clusters = duplicate_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    q = quality_score(spark, sf_dir).select("doc_id", "quality_score")
    scored = clusters.join(q, "doc_id", "left").select(
        "cluster_id",
        "doc_id",
        F.round(F.coalesce("quality_score", F.lit(0.0)), 9).alias("qs"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("qs"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .groupBy("cluster_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias(
                "canonical_doc"
            ),
            F.max(F.when(F.col("rn") == 1, F.col("qs"))).alias(
                "canonical_quality"
            ),
            F.count("*").cast("bigint").alias("n_members"),
        )
    )


_SPLIT_SALT = "cluster-split-v1"
_SPLIT_WEIGHTS = {"train": 0.9, "val": 0.1}


def _leakage_safe_split_sql() -> str:
    # the md5 unit-hash formula documented in operators/sampling.py —
    # bit-identical across engines; the CUT runs on the CLUSTER id
    cut = _SPLIT_WEIGHTS["train"]
    return (
        _CLUSTERS_CTE
        + f"""
SELECT doc_id, cluster_id,
       CASE WHEN ('0x' || substr(md5('{_SPLIT_SALT}:' || CAST(cluster_id AS VARCHAR)), 1, 8))::BIGINT
                 / 4294967296.0 < {cut}
            THEN 'train' ELSE 'val' END AS split
FROM clusters
"""
    )


@register("leakage_safe_split", oracle=_leakage_safe_split_sql(), driver=False)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val split that can NEVER leak through near-duplicates: the
    split hash is keyed on the CLUSTER id, so every member of a
    duplicate cluster lands on the same side by construction. Splitting
    on doc_id — what a pipeline without cluster labels does — puts two
    near-identical documents on opposite sides of the split and the
    model memorizes its eval set; this is the standard fix (same reason
    eval decontamination exists, applied to the split itself).

    Output: (doc_id, cluster_id, split). Structural guarantee pinned in
    tests (no cluster spans two splits) on a planted-duplicate corpus;
    the assignment itself reuses sampling.deterministic_split's salted
    md5 unit hash, so it is reproducible years later from the salt."""
    from cc_mapreducer_spark.operators.sampling import deterministic_split

    clusters = duplicate_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    return deterministic_split(
        clusters, "cluster_id", _SPLIT_WEIGHTS, salt=_SPLIT_SALT
    ).select("doc_id", "cluster_id", "split")
