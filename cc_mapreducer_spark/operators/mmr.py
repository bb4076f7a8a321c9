"""MMR diversified re-ranking over any candidate generator.

Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998 — public
method): greedily pick the next result maximizing

    lambda * rel(q, d)  -  (1 - lambda) * max_{s in selected} sim(d, s)

so near-duplicate hits don't crowd the top-k — the standard fix for
retrieval over corpora that (by construction, here) contain near-dup
embeddings.

Architecture: MMR is a RE-RANK STAGE, deliberately decoupled from
candidate generation — ``mmr_rerank`` takes any (query_id, vec_id,
cosine) frame (brute-force here; the IVF+PQ shortlist at scale) and
diversifies it. The greedy loop runs per query inside
``applyInPandas``: each group is the query's M candidates (M=50 — a
bounded reranking window, never the corpus), so the Python stage is
Arrow-batched and O(M^2 * k) per query with M fixed by contract. The
only shuffle is the groupBy on query_id — |queries| * M rows.

No DuckDB oracle: the greedy argmax chain is iterative and not
SQL-expressible (same policy as IVF/PQ float-argmin ties); instead the
pytest gate pins the operator EXACTLY against an independent
pure-Python reference and asserts the diversity property MMR exists
for (with planted duplicate clusters, plain top-k returns one cluster;
MMR covers several).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table

M_CANDIDATES = 50
MMR_K = 10
MMR_LAMBDA = 0.7


def mmr_numpy(
    cand_ids: np.ndarray,
    rel: np.ndarray,
    vecs: np.ndarray,
    k: int,
    lam: float,
) -> list[tuple[int, float]]:
    """The greedy MMR kernel on one query's candidate block.

    Deterministic: candidates must arrive sorted by (rel desc, id) —
    numpy argmax then resolves score ties to the better-relevance /
    lower-id candidate. Returns [(vec_id, mmr_score), ...] in selection
    order. Shared verbatim by the operator and the test reference's
    caller, but re-implemented loop-for-loop in the test to pin it."""
    n = len(cand_ids)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sim = vn @ vn.T  # candidate-candidate cosine, (n, n)
    selected: list[int] = []
    out: list[tuple[int, float]] = []
    remaining = np.ones(n, dtype=bool)
    for _ in range(min(k, n)):
        if selected:
            max_sim = sim[:, selected].max(axis=1)
        else:
            max_sim = np.zeros(n)
        score = lam * rel - (1.0 - lam) * max_sim
        score[~remaining] = -np.inf
        pick = int(np.argmax(score))
        remaining[pick] = False
        selected.append(pick)
        out.append((int(cand_ids[pick]), float(score[pick])))
    return out


def mmr_rerank(
    candidates: DataFrame,
    emb: DataFrame,
    k: int = MMR_K,
    lam: float = MMR_LAMBDA,
) -> DataFrame:
    """Diversify (query_id, vec_id, cosine) candidates to k per query.

    Output: (query_id, vec_id, cosine, mmr_rank, mmr_score) — rank is
    selection order (1 = most relevant, later ranks trade relevance
    for novelty), score on the repo's 6dp grid."""
    with_vec = candidates.join(
        emb.select("vec_id", "embedding"), "vec_id"
    ).select("query_id", "vec_id", "cosine", "embedding")

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["cosine", "vec_id"], ascending=[False, True]
        ).reset_index(drop=True)
        vecs = np.stack(
            pdf["embedding"].map(lambda a: np.asarray(a, dtype=np.float64)).values
        )
        picks = mmr_numpy(
            pdf["vec_id"].to_numpy(),
            pdf["cosine"].to_numpy(dtype=np.float64),
            vecs,
            k,
            lam,
        )
        rel = dict(zip(pdf["vec_id"], pdf["cosine"]))
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "vec_id": [v for v, _ in picks],
                "cosine": [rel[v] for v, _ in picks],
                "mmr_rank": np.arange(1, len(picks) + 1, dtype=np.int32),
                "mmr_score": np.round([s for _, s in picks], 6),
            }
        )

    return with_vec.groupBy("query_id").applyInPandas(
        per_query,
        "query_id long, vec_id long, cosine double, mmr_rank int, mmr_score double",
    )


@register("similarity_topk_mmr", driver=False)
def similarity_topk_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-{MMR_K} over the exact top-{M_CANDIDATES}
    candidate set (at scale the candidates come from the IVF+PQ
    shortlist instead — the re-rank stage is generator-agnostic)."""
    from cc_mapreducer_spark.operators.similarity import (
        _query_matrix,
        _ROUND,
    )
    from pyspark.sql import Window

    qids, qm = _query_matrix(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    if not len(qids):
        return spark.createDataFrame(
            [],
            "query_id long, vec_id long, cosine double, mmr_rank int, mmr_score double",
        )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(
                pdf["embedding"].map(lambda a: np.asarray(a, dtype=np.float64)).values
            )
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            s = m @ qm.T
            n = len(pdf)
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(qids, n),
                    "vec_id": np.tile(pdf["vec_id"].values, len(qids)),
                    "cosine": np.round(s.T.ravel(), _ROUND),
                }
            )
            yield out[out.query_id != out.vec_id]

    scored = emb.select("vec_id", "embedding").mapInPandas(
        score, "query_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    cands = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= M_CANDIDATES)
        .drop("rn")
    )
    return mmr_rerank(cands, emb)
