"""Product quantization: code size/compression, determinism,
reconstruction-error bounds, ADC approximation quality, and recall vs
the exact scan. Float argmin ties make PQ unsuitable for the DuckDB
hash gate (like IVF), so these pins are its correctness story."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.pq import (
    _PQ_M,
    pq_encode,
    pq_reconstruct,
    pq_train,
    similarity_topk_pq,
)
from cc_mapreducer_spark.operators.similarity import similarity_topk_bruteforce
from cc_mapreducer_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _unit_matrix(emb_df):
    rows = sorted(emb_df.select("vec_id", "embedding").collect())
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    x = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    return ids, x / np.linalg.norm(x, axis=1, keepdims=True)


def test_codes_are_m_bytes_32x_smaller(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = pq_train(spark, SF_SMOKE)
    codes = pq_encode(emb, books)
    lens = codes.select(F.length("codes").alias("n")).distinct().collect()
    assert [r["n"] for r in lens] == [_PQ_M]
    dim = len(emb.select("embedding").first()[0])
    assert dim * 4 / _PQ_M == 16.0  # float32 bytes -> M code bytes


def test_encode_deterministic_across_runs(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = pq_train(spark, SF_SMOKE)
    a = {r["vec_id"]: bytes(r["codes"]) for r in pq_encode(emb, books).collect()}
    b = {r["vec_id"]: bytes(r["codes"]) for r in pq_encode(emb, books).collect()}
    assert a == b
    books2 = pq_train(spark, SF_SMOKE)
    assert np.array_equal(books, books2)


def test_reconstruction_error_bounded(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = pq_train(spark, SF_SMOKE)
    ids, x = _unit_matrix(emb)
    code_rows = {r["vec_id"]: bytes(r["codes"]) for r in pq_encode(emb, books).collect()}
    codes = np.stack([np.frombuffer(code_rows[i], dtype=np.uint8) for i in ids]).astype(int)
    recon = pq_reconstruct(codes, books)
    mse = float(((x - recon) ** 2).sum(axis=1).mean())  # vs ||x||^2 == 1
    # trained quantizer must beat shuffled-code assignment by a wide margin
    rng = np.random.RandomState(7)
    rand_codes = rng.randint(0, books.shape[1], size=codes.shape)
    rand_mse = float(((x - pq_reconstruct(rand_codes, books)) ** 2).sum(axis=1).mean())
    assert mse < 0.5, mse  # keeps >half the unit energy
    assert mse < 0.5 * rand_mse, (mse, rand_mse)


def test_adc_tracks_exact_scores(spark):
    """Raw compressed-domain scores (no re-rank) must approximate the
    true cosine closely — they are what ranks the shortlist."""
    from cc_mapreducer_spark.operators.pq import pq_adc_scores
    from cc_mapreducer_spark.operators.similarity import _query_matrix

    emb = load_table(spark, SF_SMOKE, "embeddings")
    ids, x = _unit_matrix(emb)
    qids, qm = _query_matrix(spark, SF_SMOKE)
    pos = {int(v): i for i, v in enumerate(ids)}
    books = pq_train(spark, SF_SMOKE)
    adc = pq_adc_scores(spark, SF_SMOKE, books).collect()
    err = [
        abs(float(qm[int(r["query_id"])] @ x[pos[r["vec_id"]]]) - r["cosine"])
        for r in adc
    ]
    assert max(err) < 0.35, max(err)
    assert sum(err) / len(err) < 0.1, sum(err) / len(err)


def test_recall_floor_vs_bruteforce(spark):
    """ADC shortlist + exact re-rank: recall@10 >= 0.9 (measured 1.0 at
    M=16, K=32, shortlist 100 — floor leaves noise margin)."""
    brute = similarity_topk_bruteforce(spark, SF_SMOKE).collect()
    pq = similarity_topk_pq(spark, SF_SMOKE).collect()
    by_q_exact: dict[int, set[int]] = {}
    for r in brute:
        by_q_exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    by_q_pq: dict[int, set[int]] = {}
    for r in pq:
        by_q_pq.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert set(by_q_exact) == set(by_q_pq)
    recalls = [
        len(by_q_exact[q] & by_q_pq[q]) / len(by_q_exact[q]) for q in by_q_exact
    ]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_saved_index_serving_path_matches_in_process(spark, tmp_path):
    from cc_mapreducer_spark.operators.pq import (
        pq_load_codebooks,
        pq_save_index,
        similarity_topk_pq,
        similarity_topk_pq_from_index,
    )

    idx = str(tmp_path / "pq_index")
    books = pq_save_index(spark, SF_SMOKE, idx)
    # codebooks roundtrip bit-exactly
    import numpy as np

    loaded = pq_load_codebooks(spark, idx)
    assert np.array_equal(books, loaded)
    # the serving path over the saved code table returns the identical
    # top-k (same shortlist, same exact re-rank)
    a = sorted(
        map(tuple, similarity_topk_pq(spark, SF_SMOKE).collect())
    )
    b = sorted(
        map(tuple, similarity_topk_pq_from_index(spark, SF_SMOKE, idx).collect())
    )
    assert a == b
    # the code table really is the compressed artifact: ~16B/vector
    import os

    code_bytes = sum(
        os.path.getsize(os.path.join(idx, "codes", f))
        for f in os.listdir(os.path.join(idx, "codes"))
        if f.endswith(".parquet")
    )
    n_vecs = spark.read.parquet(f"{idx}/codes").count()
    assert code_bytes / n_vecs < 120  # 16B codes + parquet overhead


def test_ivfpq_oracle_parity_other_sfs(spark):
    """sf0.01 is the registry parity gate (test_oracle_parity); the
    float-adjacent IVFPQ chain is additionally pinned at the other two
    SFs — cross-engine float edge cases are scale-dependent (the
    kmeans / q()-grid precedent)."""
    import pytest
    from cc_mapreducer_spark.operators.pq import (
        _IVFPQ_SQL,
        similarity_topk_ivfpq,
    )
    from tests.oracle import compare_frames, duckdb_connection

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        con = duckdb_connection(sf)
        try:
            compare_frames(
                similarity_topk_ivfpq(spark, sf).toPandas(),
                con.sql(_IVFPQ_SQL).df(),
                f"similarity_topk_ivfpq@{sf}",
            )
        finally:
            con.close()


def test_ivfpq_matches_ivf_candidate_recall_and_is_deterministic(spark):
    # IVFPQ = IVF's candidate set + PQ's compressed scoring + the exact
    # re-rank. Within the probed cells the re-rank is exact, so IVFPQ's
    # top-k must equal the EXACT top-k over the same candidate set that
    # similarity_topk_ivf scores — cell-probe recall is the only
    # approximation left.
    from cc_mapreducer_spark.operators.pq import similarity_topk_ivfpq
    from cc_mapreducer_spark.operators.similarity import similarity_topk_ivf

    a = {(r["query_id"], r["vec_id"]) for r in similarity_topk_ivfpq(spark, SF_SMOKE).collect()}
    b = {(r["query_id"], r["vec_id"]) for r in similarity_topk_ivfpq(spark, SF_SMOKE).collect()}
    assert a == b  # deterministic
    ivf = {(r["query_id"], r["vec_id"]) for r in similarity_topk_ivf(spark, SF_SMOKE).collect()}
    # same candidate universe + exact scoring on both ends -> IDENTICAL
    # sets (measured equal at sf0.001/0.01/0.1): the compressed scan +
    # re-rank is lossless relative to IVF; only the coarse probe
    # approximates. A dropped pair here means the ADC shortlist lost a
    # true candidate — a regression, not noise.
    assert a == ivf


def test_ivfpq_recall_floor_vs_bruteforce(spark):
    from cc_mapreducer_spark.operators.pq import similarity_topk_ivfpq

    got = {(r["query_id"], r["vec_id"]) for r in similarity_topk_ivfpq(spark, SF_SMOKE).collect()}
    exact = {(r["query_id"], r["vec_id"]) for r in similarity_topk_bruteforce(spark, SF_SMOKE).collect()}
    recall = len(got & exact) / len(exact)
    # bounded by the IVF cell probe (nprobe/k of the corpus scanned);
    # the floor pins regressions, not a marketing number
    assert recall >= 0.5, recall


def test_ivfpq_scans_only_probed_cells(spark):
    # structural scan bound: every scored candidate's cell must be in
    # its query's probe list (subset property), and the candidate count
    # is far below the brute-force Q x N pair count
    import numpy as np
    from cc_mapreducer_spark.operators.kmeans import _dots
    from cc_mapreducer_spark.operators.pq import pq_train, pq_encode
    from cc_mapreducer_spark.operators.similarity import (
        _IVF_NPROBE, _query_matrix_det, ivf_assignments, ivf_centroids,
    )

    qids, qm = _query_matrix_det(spark, SF_SMOKE)
    cent = ivf_centroids(spark, SF_SMOKE)
    probes = np.argsort(-_dots(qm, cent), axis=1)[:, :_IVF_NPROBE]
    probe = {(int(qids[i]), int(c)) for i in range(len(qids)) for c in probes[i]}
    probe_df = spark.createDataFrame(sorted(probe), "query_id long, cell int")
    books = pq_train(spark, SF_SMOKE)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    cells = ivf_assignments(spark, SF_SMOKE, cent)
    coded = pq_encode(emb, books).join(cells, "vec_id")
    pairs = coded.join(F.broadcast(probe_df), "cell")
    n_pairs = pairs.count()
    n_corpus = emb.count()
    assert n_pairs < len(qids) * n_corpus * 0.6  # well under all-pairs
    bad = pairs.select("query_id", "cell").distinct().collect()
    assert all((r["query_id"], r["cell"]) in probe for r in bad)
