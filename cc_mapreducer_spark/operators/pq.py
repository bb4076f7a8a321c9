"""Product quantization (PQ) for embedding search at memory-bandwidth
scale (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011).

The missing piece between this repo's int8 scalar quantization (4x,
operators/embeddings.py) and its IVF coarse partitioning (scan-fraction,
operators/similarity.py): PQ compresses each L2-normalized vector to
_PQ_M one-byte codes — 64 float32 dims (256 B) -> 16 B, 16x — and scores
queries directly IN the compressed domain via ADC (asymmetric distance
computation): the query builds an (M x K) lookup table of per-subspace
partial dot products, and each database vector's approximate dot product
is M table lookups summed, never a decode. The ADC scan produces a
per-query SHORTLIST that an exact re-rank stage rescores against the
raw vectors (FAISS's refine pattern) — at the 16x8 code rate the
corpus-adaptive shortlist (_shortlist_n) captures the exact top-10 on
every driver corpus and the re-rank restores recall@10 = 1.00. At
100 TB that turns a scan that is memory-bandwidth-bound on raw floats
into one over 16x fewer bytes plus an exact pass over
n_queries * shortlist vectors, and composes with IVF (probe cells, then
ADC-scan only their codes) exactly as FAISS's IVFPQ does — implemented
below as similarity_topk_ivfpq.

Pipeline shape (all the repo's standard patterns):
  * train: seeded Lloyd's k-means per subspace, driver-side numpy on a
    deterministic sample (first _PQ_TRAIN_N vec_ids) — the codebook is
    M*K*(dim/M) floats (tiny), trained once offline at scale;
  * encode: distributed mapInPandas, one vectorized argmin per Arrow
    batch; codes land in a BINARY column (M bytes per vector) — the
    honest compressed representation, parquet-friendly;
  * search: codebook + query LUTs ride into a mapInPandas scan of the
    CODES table (zero shuffle), then the shared per-query window top-k.

Driver surface: raw PQ ranks hinge on float argmin/argsort ties — the
class of decision the DuckDB hash gate cannot compare robustly (same
reason similarity_topk_ivf is pytest-only) — so the registered key is
``ann_recall_digest`` (end of file): the integer per-query overlap of
the SAVED-index serving path's top-10 with the exact brute-force top-10,
hashed against an oracle that pins perfect recall. tests/test_pq.py
additionally pins determinism, the 32x code size, a
reconstruction-error bound, ADC approximation quality against exact
scores, and the recall floor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.operators.similarity import _query_matrix, _topk
from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table

_PQ_M = 16       # subquantizers: dim must divide evenly (64 -> 4 dims each)
# K=256 = the classic PQ 16x8 configuration: the codes column stores a
# full byte per subspace either way, so 8 bits of codebook costs ZERO
# extra storage over the old K=32 (5 bits) and cuts ADC noise enough
# that a 100-deep shortlist captures the exact top-10 on every driver
# corpus (K=32 needed 4x the shortlist on the 2k-vector corpus).
_PQ_K = 256
_PQ_TRAIN_N = 1024  # training sample: first N vec_ids — deterministic
_PQ_ITERS = 10
_PQ_SHORTLIST = 100    # floor on ADC candidates per query (see _shortlist_n)
_PQ_SHORTLIST_FRAC = 0.05  # corpus fraction fed to the exact re-rank


def _shortlist_n(n_vecs: int) -> int:
    """ADC shortlist depth, corpus-adaptive: max(100, 5% of the corpus).

    At a FIXED code rate the quantization noise is fixed, but the cosine
    margin between the true rank-10 neighbor and the rest of the corpus
    shrinks as the corpus grows — so the shortlist that guarantees the
    true top-k survives the ADC cut must grow with n. Measured on the
    driver corpora (Gaussian vectors — the WORST case: no cluster
    structure, margins at their smallest) at the 16x8 code rate: the
    worst true-top-10 ADC rank is <= 100 at every SF, with the old 16x5
    rate it was ~400 on the 2k-vector corpus. At the scale where 5%
    re-rank volume hurts, the production knob is the code rate (raise
    _PQ_M) or IVF+PQ cell probing, NOT a deeper re-rank — the fraction
    here states the recall contract for the rate we ship."""
    import math

    return max(_PQ_SHORTLIST, math.ceil(n_vecs * _PQ_SHORTLIST_FRAC))
_ROUND = 9


# In-session memo for trained artifacts (codebooks here; coarse
# centroids in similarity.py use the same helper): training is
# deterministic and once-offline at scale — a serving job loads the
# persisted artifact, it never retrains per query. The memo is the
# local stand-in (same pattern as similarity._PERSISTED for LSH index
# frames). Key includes the embeddings file's identity (mtime+size) so
# an in-session overwrite of the corpus misses and retrains, plus every
# hyperparameter the artifact depends on.
_TRAIN_MEMO: dict[tuple, np.ndarray] = {}


def train_memo_key(spark: SparkSession, sf_dir: str, *params) -> tuple:
    import os

    p = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(p)
        sig = (st.st_mtime_ns, st.st_size)
    except OSError:
        sig = None
    return (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        sig,
        params,
    )


def pq_train(spark: SparkSession, sf_dir: str) -> np.ndarray:
    """Train per-subspace codebooks: (M, K, dim/M) float64. Seeded numpy
    Lloyd's on the deterministic sample, run driver-side like
    ivf_centroids — at scale this is a once-offline job; only encode and
    search are distributed (in-session, the trained tensor is memoized —
    see _TRAIN_MEMO). Empty cells keep their previous centroid (the
    standard k-means fix; deterministic)."""
    key = train_memo_key(
        spark, sf_dir, "pq", _PQ_M, _PQ_K, _PQ_TRAIN_N, _PQ_ITERS
    )
    if key in _TRAIN_MEMO:
        return _TRAIN_MEMO[key]
    emb = load_table(spark, sf_dir, "embeddings")
    rows = sorted(
        emb.filter(F.col("vec_id") < _PQ_TRAIN_N).select("vec_id", "embedding").collect()
    )
    x = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    dim = x.shape[1]
    if dim % _PQ_M:
        raise ValueError(f"dim {dim} not divisible by M={_PQ_M}")
    sub = dim // _PQ_M
    rng = np.random.RandomState(0)
    books = np.empty((_PQ_M, _PQ_K, sub))
    for m in range(_PQ_M):
        xm = x[:, m * sub : (m + 1) * sub]
        cent = xm[rng.choice(len(xm), _PQ_K, replace=False)]
        for _ in range(_PQ_ITERS):
            d2 = ((xm[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(_PQ_K):
                members = xm[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[m] = cent
    _TRAIN_MEMO[key] = books
    return books


def _encode_matrix(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) float64 -> (n, M) uint8 codes: per-subspace argmin of
    squared distance (ties -> lowest code id, numpy argmin semantics —
    deterministic)."""
    n, dim = mat.shape
    sub = dim // _PQ_M
    codes = np.empty((n, _PQ_M), dtype=np.uint8)
    for m in range(_PQ_M):
        xm = mat[:, m * sub : (m + 1) * sub]
        # ||x - c||^2 = ||x||^2 - 2<x,c> + ||c||^2; ||x||^2 is constant
        # per row so argmin needs only the cross and centroid terms.
        cross = xm @ books[m].T
        c2 = (books[m] ** 2).sum(axis=1)
        codes[:, m] = np.argmin(c2[None, :] - 2.0 * cross, axis=1).astype(np.uint8)
    return codes


def pq_encode(emb: DataFrame, books: np.ndarray) -> DataFrame:
    """(vec_id, codes binary): M bytes per vector, assigned distributedly
    — one vectorized argmin per Arrow batch, zero shuffle. The binary
    column IS the compressed index; at scale it materializes as a
    parquet table 32x smaller than the float column it replaces."""

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["embedding"].map(lambda a: np.asarray(a, dtype=np.float64)).values)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            codes = _encode_matrix(mat, books)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].values, "codes": [c.tobytes() for c in codes]}
            )

    return emb.select("vec_id", "embedding").mapInPandas(encode, "vec_id long, codes binary")


def pq_reconstruct(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Decode (n, M) codes back to (n, dim) — test-side utility for the
    quantization-error bound; the search path never decodes."""
    return np.concatenate([books[m][codes[:, m]] for m in range(_PQ_M)], axis=1)


def _query_luts(qids, qm: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n_queries, M, K) ADC lookup tables: lut[q, m, k] = <q_m, books[m, k]>.
    ONE einsum shared by the in-process and serving paths — the LUT (and
    therefore every downstream score bit) cannot diverge between them."""
    sub = qm.shape[1] // _PQ_M
    return np.einsum("qms,mks->qmk", qm.reshape(len(qids), _PQ_M, sub), books)


def _adc_scan(codes_df: DataFrame, qids, luts: np.ndarray) -> DataFrame:
    """Score every (query, vector) pair purely over the M-byte codes:
    one mapInPandas pass, LUT stack in the closure, zero shuffle.
    Shared verbatim by pq_adc_scores and the saved-index serving path so
    the two use the IDENTICAL summation order (np.sum pairwise) — a
    hand-rolled sequential fold here measurably differs in final ulps
    and can flip a 9dp rounding, shifting shortlist membership."""
    marange = np.arange(_PQ_M)

    def score(batches):
        for pdf in batches:
            if not len(pdf) or not len(qids):
                continue
            codes = np.stack(
                [np.frombuffer(b, dtype=np.uint8) for b in pdf["codes"].values]
            ).astype(np.int64)
            n = len(pdf)
            frames = []
            for i, qid in enumerate(qids):
                s = luts[i][marange, codes].sum(axis=1)
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(n, qid, dtype=np.int64),
                            "vec_id": pdf["vec_id"].values,
                            "cosine": np.round(s, _ROUND),
                        }
                    )
                )
            out = pd.concat(frames, ignore_index=True)
            yield out[out.query_id != out.vec_id]

    return codes_df.mapInPandas(score, "query_id long, vec_id long, cosine double")


def _shortlist_rerank(spark: SparkSession, sf_dir: str, adc: DataFrame) -> DataFrame:
    """ADC scores -> per-query shortlist (_shortlist_n(corpus), corpus-
    adaptive) -> EXACT re-rank on the shortlist's raw vectors (broadcast
    joins retrieve only n_queries x shortlist embeddings). Shared by
    both PQ paths."""
    from pyspark.sql import Window

    from cc_mapreducer_spark.operators.similarity import (
        _N_QUERIES,
        _cosine_pair_udf,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    depth = _shortlist_n(emb.count())  # parquet count: metadata-cheap
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    shortlist = (
        adc.select("query_id", "vec_id", F.row_number().over(w).alias("__rn"))
        .filter(F.col("__rn") <= depth)
        .select("query_id", "vec_id")
    )
    q_emb = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    exact = (
        emb.join(F.broadcast(shortlist), "vec_id")
        .join(F.broadcast(q_emb), "query_id")
        .select("query_id", "vec_id", _cosine_pair_udf("qe", "embedding").alias("cosine"))
    )
    return _topk(exact)


def _empty_adc(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], "query_id long, vec_id long, cosine double")


def pq_adc_scores(spark: SparkSession, sf_dir: str, books: np.ndarray) -> DataFrame:
    """ADC scores over freshly-encoded codes (the in-process path)."""
    qids, qm = _query_matrix(spark, sf_dir)
    if not len(qids):  # empty corpus: LUT reshape would fail before any scan
        return _empty_adc(spark)
    luts = _query_luts(qids, qm, books)
    emb = load_table(spark, sf_dir, "embeddings")
    return _adc_scan(pq_encode(emb, books), qids, luts)


def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN top-k = compressed-domain ADC scan -> per-query shortlist
    -> EXACT re-rank on the shortlist's raw vectors. Raw ADC ranks with
    ~0.6 recall@10 at this code rate; the refine stage lifts it to 1.0
    on the driver corpus while still never scanning raw floats
    corpus-wide. Output schema matches the other similarity_topk_*
    variants."""
    books = pq_train(spark, sf_dir)
    return _shortlist_rerank(spark, sf_dir, pq_adc_scores(spark, sf_dir, books))


# --------------------------------------------------------------------------
# index persistence: the PQ index as a table on disk
# --------------------------------------------------------------------------


def pq_save_index(
    spark: SparkSession, sf_dir: str, index_path: str
) -> np.ndarray:
    """Materialize the PQ index: codebooks (tiny, one row per
    (subspace, centroid) with the centroid's floats) and the code table
    (one 16-byte binary per vector) as parquet. This is the artifact a
    serving fleet loads — training happens once, search jobs only read
    the index. Returns the trained codebooks."""
    books = pq_train(spark, sf_dir)
    rows = [
        (m, k, books[m][k].tolist())
        for m in range(_PQ_M)
        for k in range(_PQ_K)
    ]
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["subspace", "centroid", "vec"]),
        "subspace int, centroid int, vec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/codebooks")
    emb = load_table(spark, sf_dir, "embeddings")
    pq_encode(emb, books).write.mode("overwrite").parquet(
        f"{index_path}/codes"
    )
    return books


def pq_load_codebooks(spark: SparkSession, index_path: str) -> np.ndarray:
    """Rebuild the (M, K, dim/M) codebook tensor from the saved table —
    a few KB, collected once per search job and shipped in the task
    closure like any broadcast constant. A partial table (interrupted
    overwrite) fails fast: zero-filled centroids would silently corrupt
    every downstream ADC score."""
    rows = spark.read.parquet(f"{index_path}/codebooks").collect()
    if len(rows) != _PQ_M * _PQ_K:
        raise ValueError(
            f"codebooks table at {index_path} has {len(rows)} rows, "
            f"expected {_PQ_M * _PQ_K} — partial/corrupt index"
        )
    dim_m = len(rows[0]["vec"])
    books = np.zeros((_PQ_M, _PQ_K, dim_m))
    for r in rows:
        books[r["subspace"], r["centroid"]] = r["vec"]
    return books


def similarity_topk_pq_from_index(
    spark: SparkSession, sf_dir: str, index_path: str
) -> DataFrame:
    """The serving path: ADC-scan the SAVED code table (never touching
    raw floats corpus-wide), shortlist, exact re-rank — identical
    results to the train-in-process path by test, guaranteed by sharing
    _query_luts/_adc_scan/_shortlist_rerank verbatim with it. The scan
    reads 16 B/vector from parquet; the only full-precision reads are
    the n_queries x shortlist re-rank rows."""
    books = pq_load_codebooks(spark, index_path)
    qids, qm = _query_matrix(spark, sf_dir)  # raw queries, like pq_adc_scores
    if not len(qids):
        return _shortlist_rerank(spark, sf_dir, _empty_adc(spark))
    luts = _query_luts(qids, qm, books)
    adc = _adc_scan(spark.read.parquet(f"{index_path}/codes"), qids, luts)
    return _shortlist_rerank(spark, sf_dir, adc)


# --------------------------------------------------------------------------
# driver-hashed digest: the PQ serving path vs the exact scan
# --------------------------------------------------------------------------

# The oracle states the CONTRACT, not the sketch: a perfect-recall ANN
# returns exactly the brute-force top-k set, so per query the expected
# digest is |brute top-10| hits (=10) with the boolean pinned true. The
# Spark side computes |PQ-serving top-10 ∩ brute top-10| from the ACTUAL
# saved-index serving path — any regression in train/encode/save/load/
# ADC/shortlist/re-rank drops a hit, flips the boolean, and fails the
# value hash. (Raw float ranks stay out of the hash: k-means/argsort tie
# decisions are not cross-engine comparable — this digest is the
# determinized integer form of the same evidence.)
def _ann_digest_sql() -> str:
    from cc_mapreducer_spark.operators.similarity import _BRUTE_SQL

    return f"""
WITH brute AS (
{_BRUTE_SQL}
)
SELECT query_id,
       CAST(count(*) AS BIGINT) AS pq_hits_at_10,
       true AS serving_matches_exact
FROM brute
GROUP BY query_id
"""


@register("ann_recall_digest", oracle=_ann_digest_sql())
def ann_recall_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end digest of the PQ index lifecycle: train -> persist
    (codebooks + 16 B/vector codes) -> load -> ADC scan -> shortlist ->
    exact re-rank, then count per-query overlap with the exact
    brute-force top-10. recall@10 = 1.0 on every driver corpus (pinned
    here by the hash, and in tests/test_pq.py), so the hashed columns
    are exact integers: (query_id, 10, true)."""
    import os
    import tempfile

    # empty corpus: no query block, nothing to train on — empty digest
    # with the stable schema (pq_train's np.stack would crash otherwise)
    qids, _ = _query_matrix(spark, sf_dir)
    if not len(qids):
        return spark.createDataFrame(
            [],
            "query_id long, pq_hits_at_10 long, serving_matches_exact boolean",
        )

    from cc_mapreducer_spark.operators.similarity import (
        _TOPK,
        similarity_topk_bruteforce,
    )

    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    index_path = os.path.join(
        tempfile.gettempdir(), f"cc_mr_spark_pq_index_{tag}"
    )
    pq_save_index(spark, sf_dir, index_path)
    serving = similarity_topk_pq_from_index(spark, sf_dir, index_path)
    brute = similarity_topk_bruteforce(spark, sf_dir)
    hits = (
        serving.select("query_id", "vec_id")
        .join(brute.select("query_id", "vec_id"), ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("bigint").alias("pq_hits_at_10"))
    )
    return hits.select(
        "query_id",
        "pq_hits_at_10",
        (F.col("pq_hits_at_10") == _TOPK).alias("serving_matches_exact"),
    )


# --------------------------------------------------------------------------
# IVF+PQ composition — FAISS's IVFPQ: cells bound the scan FRACTION,
# codes bound the BYTES per scanned vector
# --------------------------------------------------------------------------


def _adc_scan_paired(pairs_df: DataFrame, qids, luts: np.ndarray) -> DataFrame:
    """ADC scoring for PRE-PAIRED (query_id, vec_id, codes) rows — the
    IVFPQ shape, where the cell-probe join has already decided which
    (query, vector) pairs exist, so each row is scored against exactly
    its own query's LUT (vs _adc_scan, which scores every query against
    every row of a full scan). Same pairwise-summation order as
    _adc_scan, so a vector scores bit-identically through either path."""
    marange = np.arange(_PQ_M)
    qpos = {int(q): i for i, q in enumerate(qids)}

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(
                [np.frombuffer(b, dtype=np.uint8) for b in pdf["codes"].values]
            ).astype(np.int64)
            qidx = pdf["query_id"].map(qpos).values.astype(np.int64)
            s = luts[qidx[:, None], marange[None, :], codes].sum(axis=1)
            out = pd.DataFrame(
                {
                    "query_id": pdf["query_id"].values,
                    "vec_id": pdf["vec_id"].values,
                    "cosine": np.round(s, _ROUND),
                }
            )
            yield out[out.query_id != out.vec_id]

    return pairs_df.mapInPandas(
        score, "query_id long, vec_id long, cosine double"
    )


@register("similarity_topk_ivfpq", driver=False)  # float argsort ties: pytest-pinned like IVF
def similarity_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ ANN top-k (Jégou et al. 2011 §V / FAISS IVFPQ): the two
    orthogonal savings composed —

      * IVF coarse cells cut WHICH vectors are touched to ~nprobe/k of
        the corpus (broadcast probe-list hash join on cell, exactly
        similarity_topk_ivf's shape);
      * PQ codes cut the BYTES per touched vector 16x (the scan reads
        16 B codes, never raw floats);
      * the shared shortlist + exact re-rank stage restores exact
        ranking over the survivors.

    At 100 TB this is THE serving configuration: scan volume =
    corpus_bytes * (nprobe/k) / 16 + n_queries * shortlist raw rows.
    Output schema matches every other similarity_topk_* variant.

    Uses the same trained artifacts as the standalone paths (one coarse
    codebook, one PQ codebook — at scale both persisted once); candidate
    recall is bounded by the IVF probe, exactness within candidates by
    the re-rank (both pinned in tests/test_pq.py)."""
    from cc_mapreducer_spark.operators.similarity import (
        _IVF_NPROBE,
        ivf_assignments,
        ivf_centroids,
    )

    qids, qm = _query_matrix(spark, sf_dir)
    if not len(qids):
        return _shortlist_rerank(spark, sf_dir, _empty_adc(spark))
    cent = ivf_centroids(spark, sf_dir)
    books = pq_train(spark, sf_dir)
    luts = _query_luts(qids, qm, books)
    probes = np.argsort(-(qm @ cent.T), axis=1)[:, :_IVF_NPROBE]
    probe_df = spark.createDataFrame(
        [(int(qids[i]), int(c)) for i in range(len(qids)) for c in probes[i]],
        "query_id long, cell int",
    )
    emb = load_table(spark, sf_dir, "embeddings")
    coded = pq_encode(emb, books).join(
        ivf_assignments(spark, sf_dir, cent), "vec_id"
    )
    pairs = coded.join(F.broadcast(probe_df), "cell").select(
        "query_id", "vec_id", "codes"
    )
    return _shortlist_rerank(spark, sf_dir, _adc_scan_paired(pairs, qids, luts))
