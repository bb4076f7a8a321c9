"""KMV / theta sketch contract (operators/kmv.py): estimator accuracy
on sets of known cardinality, the exact small-set branch, sketch
mergeability, theta-cut intersection math, and the Spark pipeline
pinned against a pure-python replica of the same md5-48 hash space."""

from __future__ import annotations

import hashlib

from cc_mapreducer_spark.operators.kmv import K, _H_SPACE

SF_ORACLE = "/root/testdata/sf0.01"


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _kmv_estimate(hashes: set[int]) -> float:
    if len(hashes) < K:
        return float(len(hashes))
    kth = sorted(hashes)[K - 1]
    return (K - 1) * _H_SPACE / kth


def test_estimator_accuracy_known_cardinality():
    # distinct universes of three sizes; md5 is the uniformizer, so the
    # (k-1)/u_k estimate must land within ~3.5 sigma = 31% of truth
    for n in (1_000, 10_000, 100_000):
        hashes = {_h(f"element-{i}") for i in range(n)}
        est = _kmv_estimate(hashes)
        assert abs(est - n) / n < 0.31, (n, est)


def test_small_set_branch_is_exact():
    hashes = {_h(f"tiny-{i}") for i in range(K - 1)}
    assert _kmv_estimate(hashes) == float(len(hashes))


def test_sketch_merge_equals_sketch_of_union():
    # KMV's defining property: k-min(A ∪ B) == k-min(k-min(A) ∪ k-min(B))
    a = {_h(f"a-{i}") for i in range(5_000)}
    b = {_h(f"b-{i}") for i in range(5_000)}
    sk = lambda s: set(sorted(s)[:K])  # noqa: E731
    assert sk(a | b) == sk(sk(a) | sk(b))


def test_theta_intersection_math():
    # planted overlap: |A|=8000, |B|=6000, |A∩B|=2000
    shared = {f"s-{i}" for i in range(2_000)}
    a_el = shared | {f"a-{i}" for i in range(6_000)}
    b_el = shared | {f"b-{i}" for i in range(4_000)}
    ha = {_h(x) for x in a_el}
    hb = {_h(x) for x in b_el}
    sa, sb = set(sorted(ha)[:K]), set(sorted(hb)[:K])
    theta = min(sorted(ha)[K - 1], sorted(hb)[K - 1])
    inter_surv = len({h for h in sa & sb if h < theta})
    union_surv = len({h for h in (sa | sb) if h < theta})
    est_inter = inter_surv * _H_SPACE / theta
    est_jacc = inter_surv / union_surv
    true_jacc = 2_000 / 10_000
    assert abs(est_inter - 2_000) / 2_000 < 0.5  # ~k-limited resolution
    assert abs(est_jacc - true_jacc) < 0.15


def test_spark_sketch_matches_python_replica(spark):
    """grouped_topk sketches == python k-smallest over the same distinct
    (source, shingle) hash sets, derived independently from parquet."""
    import duckdb

    from cc_mapreducer_spark.operators.kmv import kmv_sketches

    got = kmv_sketches(spark, SF_ORACLE).toPandas()
    docs = duckdb.sql(
        f"SELECT doc_id, source, lower(text) AS text "
        f"FROM '{SF_ORACLE}/documents.parquet'"
    ).df()
    import re

    by_source: dict[str, set[int]] = {}
    for _, row in docs.iterrows():
        toks = [w for w in re.sub(r"[^a-z]+", " ", row.text).split() if w]
        for i in range(len(toks) - 2):
            s = " ".join(toks[i : i + 3])
            by_source.setdefault(row.source, set()).add(_h(s))
    for source, hashes in by_source.items():
        exp = sorted(hashes)[:K]
        have = sorted(got[got.source == source]["h"].tolist())
        assert have == exp, source


def test_fixture_estimates_are_calibrated(spark):
    from cc_mapreducer_spark.operators.kmv import kmv_shingle_cardinality

    df = kmv_shingle_cardinality(spark, SF_ORACLE).toPandas()
    assert len(df) > 0
    for _, r in df.iterrows():
        if r.n_sketch < K:
            assert r.est_distinct == r.n_exact
        else:
            assert abs(r.est_distinct - r.n_exact) / r.n_exact < 0.35
