"""MMR re-ranking: exact equality with an independent pure-Python
greedy reference, the diversity property it exists for, first-pick
relevance, partition invariance — and, since r11, DuckDB-oracle parity
at the non-registry SFs (the unrolled greedy chain of
operators/mmr.py:_mmr_sql; sf0.01 is covered by test_oracle_parity)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.mmr import (
    MMR_K,
    mmr_rerank,
    similarity_topk_mmr,
)
from tests.conftest import SF_ORACLE


def _reference_mmr(cands, vecs_by_id, k, lam):
    """Independent greedy implementation: dict/loop based, no numpy
    argmax — pins the operator's kernel rather than re-using it."""
    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da = math.sqrt(sum(x * x for x in a))
        db = math.sqrt(sum(x * x for x in b))
        # the operator's sims ride the repo's 9dp grid (oracle contract)
        return round(num / (da * db), 9)

    # candidates arrive as [(vec_id, rel)] sorted by (rel desc, id)
    remaining = list(cands)
    selected = []
    out = []
    while remaining and len(out) < k:
        best, best_score = None, -float("inf")
        for vid, rel in remaining:
            if selected:
                ms = max(cos(vecs_by_id[vid], vecs_by_id[s]) for s in selected)
            else:
                ms = 0.0
            sc = lam * rel - (1 - lam) * ms
            if sc > best_score + 1e-12:
                best, best_score = (vid, rel), sc
        selected.append(best[0])
        remaining.remove(best)
        out.append((best[0], round(best_score, 6)))
    return out


def _clustered(spark):
    """3 tight clusters of 5 vectors each + a query axis: vectors in a
    cluster are near-identical (cosine ~1), across clusters ~orthogonal
    with decreasing relevance to the query."""
    rng = np.random.RandomState(7)
    base = np.eye(3)
    rows = []
    vid = 0
    for c in range(3):
        for _ in range(5):
            v = np.zeros(8)
            v[c] = 1.0
            v[3:] = rng.randn(5) * 0.01  # tiny jitter, cluster stays tight
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return rows


def test_equals_independent_reference(spark):
    rows = _clustered(spark)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # query relevance: cluster 0 most relevant, then 1, then 2
    rel = {vid: round(1.0 - 0.05 * vid, 6) for vid, _ in rows}
    cands = spark.createDataFrame(
        [(0, vid, r) for vid, r in rel.items()],
        "query_id long, vec_id long, cosine double",
    )
    lam = 0.5
    got = (
        mmr_rerank(cands, emb, k=6, lam=lam)
        .orderBy("mmr_rank")
        .collect()
    )
    vecs = {vid: v for vid, v in rows}
    expect = _reference_mmr(
        sorted(rel.items(), key=lambda kv: (-kv[1], kv[0])), vecs, 6, lam
    )
    assert [(r.vec_id, r.mmr_score) for r in got] == expect


def test_diversity_property_vs_plain_topk(spark):
    rows = _clustered(spark)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    rel = {vid: round(1.0 - 0.01 * vid, 6) for vid, _ in rows}
    cands = spark.createDataFrame(
        [(0, vid, r) for vid, r in rel.items()],
        "query_id long, vec_id long, cosine double",
    )
    # plain top-5 by relevance = all of cluster 0
    plain = sorted(rel, key=lambda v: (-rel[v], v))[:5]
    assert {v // 5 for v in plain} == {0}
    # MMR top-5 must cover all 3 clusters
    got = mmr_rerank(cands, emb, k=5, lam=0.5).collect()
    clusters = {r.vec_id // 5 for r in got}
    assert clusters == {0, 1, 2}
    # and the first pick is the most relevant candidate regardless
    first = [r for r in got if r.mmr_rank == 1][0]
    assert first.vec_id == plain[0]


def test_mmr_oracle_parity_other_sfs(spark):
    """sf0.01 is the registry parity gate (test_oracle_parity); the
    float-adjacent greedy chain is additionally pinned at the other two
    SFs (the kmeans / IVFPQ precedent)."""
    from cc_mapreducer_spark.operators.mmr import _MMR_SQL
    from tests.oracle import compare_frames, duckdb_connection

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        con = duckdb_connection(sf)
        try:
            compare_frames(
                similarity_topk_mmr(spark, sf).toPandas(),
                con.sql(_MMR_SQL).df(),
                f"similarity_topk_mmr@{sf}",
            )
        finally:
            con.close()


def test_registered_key_runs_and_is_partition_invariant(spark):
    out = similarity_topk_mmr(spark, SF_ORACLE)
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert len(per_q) == 5
    for q, rs in per_q.items():
        assert len(rs) == MMR_K
        ranks = sorted(r.mmr_rank for r in rs)
        assert ranks == list(range(1, MMR_K + 1))
        # mmr_score is non-increasing in rank for a fixed query
        by_rank = sorted(rs, key=lambda r: r.mmr_rank)
        scores = [r.mmr_score for r in by_rank]
        assert scores == sorted(scores, reverse=True)
    again = similarity_topk_mmr(spark, SF_ORACLE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
