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

DuckDB oracle (r11): the greedy argmax chain is k FIXED iterations
over a bounded candidate set, so it unrolls into generated CTE stages
(_mmr_sql below — the kmeans/IVFPQ playbook); candidate sims ride the
9dp grid in both engines so every greedy score is bit-identical. The
pytest gate additionally pins the kernel EXACTLY against an
independent pure-Python reference and asserts the diversity property
MMR exists for (with planted duplicate clusters, plain top-k returns
one cluster; MMR covers several).
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
    # candidate-candidate cosines on the repo's 9dp grid — the same
    # rounding contract the relevance scores already carry, which makes
    # every greedy score (two exact multiplies and a subtract over
    # 9dp-grid inputs) reproducible by the unrolled SQL oracle
    sim = np.round(vn @ vn.T, 9)  # (n, n)
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


# --------------------------------------------------------------------------
# the MMR DuckDB oracle: the greedy chain unrolled (r11)
# --------------------------------------------------------------------------
#
# The module docstring's old "not SQL-expressible" policy fell to the
# same playbook as kmeans/IVFPQ (VERDICT r10 next-round #1): the greedy
# loop is k fixed iterations of argmax over a bounded candidate set, so
# it unrolls into k generated CTE stages. Determinism rules:
#   - rel and candidate-candidate sims are on the 9dp grid in BOTH
#     engines (the proven brute-force cosine pattern);
#   - the per-step score is two IEEE multiplies and a subtract over
#     grid inputs (lam and 1-lam emitted as exact double literals), so
#     it is bit-identical;
#   - max over selected sims is order-free; the argmax tiebreak
#     (score desc, rel desc, vec_id) equals numpy's first-max over the
#     (rel desc, vec_id)-sorted candidate block;
#   - sel{i} accumulators are MATERIALIZED (each referenced twice —
#     the repo's MATERIALIZED-or-exponential discipline).


def _mmr_sql(k: int = MMR_K, m: int = M_CANDIDATES) -> str:
    from cc_mapreducer_spark.operators.similarity import (
        _N_QUERIES,
        _ROUND,
        _duck_dot,
    )

    lam = repr(float(MMR_LAMBDA))
    oml = repr(1.0 - MMR_LAMBDA)  # 0.30000000000000004 — the IEEE value

    def cos(a: str, b: str) -> str:
        return (
            f"round(({_duck_dot(a, b)})"
            f" / (sqrt({_duck_dot(a, a)}) * sqrt({_duck_dot(b, b)})),"
            f" {_ROUND})"
        )

    out = [
        f"""WITH q AS (
    SELECT vec_id AS query_id, embedding AS qe FROM embeddings
    WHERE vec_id < {_N_QUERIES}
), cand AS MATERIALIZED (
    SELECT query_id, vec_id, rel
    FROM (SELECT query_id, vec_id, rel,
                 row_number() OVER (
                     PARTITION BY query_id ORDER BY rel DESC, vec_id) AS rn
          FROM (SELECT q.query_id, e.vec_id,
                       {cos('qe', 'e.embedding')} AS rel
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.query_id))
    WHERE rn <= {m}
), sim AS MATERIALIZED (
    SELECT a.query_id, a.vec_id AS va, b.vec_id AS vb,
           {cos('ea.embedding', 'eb.embedding')} AS s
    FROM cand a
    JOIN cand b ON b.query_id = a.query_id AND b.vec_id <> a.vec_id
    JOIN embeddings ea ON ea.vec_id = a.vec_id
    JOIN embeddings eb ON eb.vec_id = b.vec_id
), p1 AS MATERIALIZED (
    SELECT query_id, vec_id, rel, {lam} * rel AS score, 1 AS mmr_rank
    FROM (SELECT query_id, vec_id, rel,
                 row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY {lam} * rel DESC, rel DESC, vec_id) AS rn
          FROM cand)
    WHERE rn = 1
), sel1 AS MATERIALIZED (
    SELECT query_id, vec_id FROM p1
)"""
    ]
    for i in range(2, k + 1):
        out.append(
            f""", p{i} AS MATERIALIZED (
    SELECT query_id, vec_id, rel, score, {i} AS mmr_rank
    FROM (
        SELECT c.query_id, c.vec_id, c.rel,
               {lam} * c.rel - {oml} * ms.msim AS score,
               row_number() OVER (
                   PARTITION BY c.query_id
                   ORDER BY ({lam} * c.rel - {oml} * ms.msim) DESC,
                            c.rel DESC, c.vec_id) AS rn
        FROM cand c
        JOIN (SELECT s.query_id, s.va AS vec_id, max(s.s) AS msim
              FROM sim s
              JOIN sel{i - 1} t
                ON t.query_id = s.query_id AND t.vec_id = s.vb
              GROUP BY s.query_id, s.va) ms
          ON ms.query_id = c.query_id AND ms.vec_id = c.vec_id
        WHERE NOT EXISTS (SELECT 1 FROM sel{i - 1} t2
                          WHERE t2.query_id = c.query_id
                            AND t2.vec_id = c.vec_id)
    ) WHERE rn = 1
), sel{i} AS MATERIALIZED (
    SELECT query_id, vec_id FROM sel{i - 1}
    UNION ALL SELECT query_id, vec_id FROM p{i}
)"""
        )
    picks = " UNION ALL ".join(f"SELECT * FROM p{i}" for i in range(1, k + 1))
    out.append(
        f"""
SELECT query_id, vec_id, rel AS cosine,
       CAST(mmr_rank AS INT) AS mmr_rank,
       round(score, 6) AS mmr_score
FROM ({picks})
"""
    )
    return "".join(out)


_MMR_SQL = _mmr_sql()


@register("similarity_topk_mmr", oracle=_MMR_SQL, driver=False)
def similarity_topk_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-{MMR_K} over the exact top-{M_CANDIDATES}
    candidate set (at scale the candidates come from the IVF+PQ
    shortlist instead — the re-rank stage is generator-agnostic).
    Oracle-backed since r11: _mmr_sql unrolls the greedy chain."""
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
