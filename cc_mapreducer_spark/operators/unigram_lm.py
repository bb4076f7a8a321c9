"""Unigram-LM subword tokenizer (SentencePiece's default algorithm) —
the second standard subword trainer next to BPE (operators/bpe.py).

Kudo, "Subword Regularization: Improving Neural Network Translation
Models with Multiple Subword Candidates" (ACL 2018 — public method;
independent implementation). Where BPE GROWS a vocabulary by greedy
pair merging, unigram-LM SHRINKS one: seed with every frequent
substring, fit piece probabilities by EM under the unigram model
P(word) = sum over segmentations of prod P(piece), prune the pieces
whose removal costs the least likelihood, repeat until the target size,
then segment by Viterbi.

Spark decomposition (the same shape as BPE's):

  * everything runs on the DISTINCT-WORD table weighted by frequency —
    the corpus-sized token stream collapses to |vocab| rows first (ONE
    groupBy), so EM cost scales with vocabulary, not corpus.
  * E-step: per-word forward/backward over the segmentation lattice
    (bounded: len(word) x MAX_PIECE_LEN states) inside an Arrow batch
    (mapInPandas) with the CURRENT piece table broadcast as a plain
    dict; emits (piece, expected_count * word_freq) partials.
  * M-step: one groupBy-sum over piece keys + normalize — a bounded
    model-sized aggregate, exactly the k-means/classifier pattern.
  * pruning keeps the ALWAYS-KEPT single characters (coverage must stay
    total) and drops the lowest-expected-count multi-char pieces by a
    fixed shrink ratio.

Determinism: expected counts are rounded to a 9dp grid before each
M-step (cross-partition float sums are unordered; the grid absorbs the
last-ulp wiggle — the repo's similarity-score policy), piece
probabilities are recomputed from the rounded counts, and Viterbi ties
break on (rounded 6dp score, fewer pieces, lexicographic first piece) —
fully reproducible across runs, partitionings, and the pytest replica.

Reference parity note: the reference engine has no tokenizer surface;
this extends SURVEY §2.8's training-data family beside bpe.py.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cc_mapreducer_spark.operators.bpe import word_freq_table
from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table, spread

MAX_PIECE_LEN = 6
SEED_VOCAB = 600  # multi-char seed pieces kept after scoring
TARGET_VOCAB = 200  # multi-char pieces kept after EM pruning
EM_ITERS = 3
SHRINK = 0.75  # fraction of multi-char pieces surviving each prune


# --------------------------------------------------------------------------
# lattice E-step / Viterbi (pure python over one word — bounded work)
# --------------------------------------------------------------------------


def _forward_backward(word: str, logp: dict[str, float]) -> tuple[float, dict[str, float]]:
    """(log-likelihood, expected piece counts) of one word under the
    unigram model, by forward/backward over the segmentation lattice.
    Pieces absent from ``logp`` don't exist; single characters always
    do (coverage guarantee). Log-space sums via math.log/exp with the
    standard max-shift; the lattice is at most len(word) x MAX_PIECE_LEN
    edges."""
    n = len(word)
    NEG = float("-inf")
    fwd = [NEG] * (n + 1)
    fwd[0] = 0.0
    edges: list[list[tuple[int, str, float]]] = [[] for _ in range(n + 1)]
    for j in range(1, n + 1):
        acc: list[float] = []
        for i in range(max(0, j - MAX_PIECE_LEN), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None or fwd[i] == NEG:
                continue
            edges[j].append((i, piece, lp))
            acc.append(fwd[i] + lp)
        if acc:
            m = max(acc)
            fwd[j] = m + math.log(sum(math.exp(a - m) for a in acc))
    if fwd[n] == NEG:
        return NEG, {}
    bwd = [NEG] * (n + 1)
    bwd[n] = 0.0
    for j in range(n, 0, -1):
        if bwd[j] == NEG:
            continue
        for i, piece, lp in edges[j]:
            contrib = fwd[i] + lp + bwd[j]
            if bwd[i] == NEG:
                bwd[i] = lp + bwd[j]
            else:
                m = max(bwd[i], lp + bwd[j])
                bwd[i] = m + math.log(
                    math.exp(bwd[i] - m) + math.exp(lp + bwd[j] - m)
                )
    exp_counts: dict[str, float] = {}
    total = fwd[n]
    for j in range(1, n + 1):
        for i, piece, lp in edges[j]:
            if fwd[i] == NEG or bwd[j] == NEG:
                continue
            post = math.exp(fwd[i] + lp + bwd[j] - total)
            exp_counts[piece] = exp_counts.get(piece, 0.0) + post
    return total, exp_counts


def _viterbi(word: str, logp: dict[str, float]) -> list[str]:
    """Best segmentation; ties break on (rounded score, FEWER pieces,
    lexicographically smaller piece list) so the answer is reproducible
    across engines and float wiggle."""
    n = len(word)
    # state: (neg_rounded_score, n_pieces, pieces_tuple) — min() picks
    # highest score, then fewest pieces, then lexicographic
    best: list[tuple[float, int, tuple[str, ...]] | None] = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for j in range(1, n + 1):
        cands = []
        for i in range(max(0, j - MAX_PIECE_LEN), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None or best[i] is None:
                continue
            prev = best[i]
            score = prev[0] - round(lp, 6)  # accumulate NEGATED rounded
            cands.append((score, prev[1] + 1, prev[2] + (piece,)))
        if cands:
            best[j] = min(cands)
    if best[n] is None:  # cannot happen while single chars are kept
        return list(word)
    return list(best[n][2])


# --------------------------------------------------------------------------
# distributed trainer
# --------------------------------------------------------------------------


def _seed_pieces(freq: DataFrame) -> DataFrame:
    """Candidate pieces: every substring of length 2..MAX_PIECE_LEN of
    every distinct word, scored by freq * len (Kudo's seed heuristic),
    top SEED_VOCAB kept — plus every single character (always kept).
    One explode + one groupBy on piece keys."""
    subs = freq.select(
        "cnt",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, length(word)), i -> "
                f"transform(sequence(2, least({MAX_PIECE_LEN}, "
                f"length(word) - i + 1)), l -> substring(word, i, l))))"
            )
        ).alias("piece"),
    ).filter(F.length("piece") >= 2)
    scored = subs.groupBy("piece").agg(
        (F.sum("cnt") * F.length("piece")).alias("score")
    )
    return scored.orderBy(F.desc("score"), "piece").limit(SEED_VOCAB)


def _em_step_counts(
    freq: DataFrame, logp: dict[str, float]
) -> tuple[list[tuple[str, float]], float]:
    """One E-step over the distinct-word table: returns (piece expected
    counts rounded to the 9dp grid as collected (piece, c) tuples,
    corpus log-likelihood) — both from a SINGLE Spark action."""
    schema = StructType(
        [
            StructField("piece", StringType()),
            StructField("c", DoubleType()),
            StructField("ll", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            agg: dict[str, float] = {}
            ll = 0.0
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                total, ec = _forward_backward(str(word), logp)
                if total == float("-inf"):
                    continue
                ll += total * int(cnt)
                for piece, c in ec.items():
                    agg[piece] = agg.get(piece, 0.0) + c * int(cnt)
            yield pd.DataFrame(
                {
                    "piece": list(agg) + ["\x00ll"],
                    "c": list(agg.values()) + [0.0],
                    "ll": [0.0] * len(agg) + [ll],
                }
            )

    # ONE action per E-step (ADVICE r7): the ll sentinel rides the same
    # grouped collect as the counts, so the expensive lattice pass runs
    # exactly once instead of once per consumer.
    rows = (
        freq.mapInPandas(run, schema)
        .groupBy("piece")
        .agg(
            F.round(F.sum("c"), 9).alias("c"),
            F.round(F.sum("ll"), 6).alias("ll"),
        )
        .collect()  # bounded: |pieces| + 1 rows (model-sized)
    )
    counts = [(r["piece"], r["c"]) for r in rows if r["piece"] != "\x00ll"]
    ll_total = sum(r["ll"] for r in rows if r["piece"] == "\x00ll")
    return counts, float(ll_total or 0.0)


def train_unigram(
    docs: DataFrame,
    target_vocab: int = TARGET_VOCAB,
    em_iters: int = EM_ITERS,
    freq: DataFrame | None = None,
) -> dict[str, float]:
    """Fit the unigram-LM piece table: seed -> (EM x em_iters -> prune)
    until <= target_vocab multi-char pieces -> final EM. Returns
    {piece: logprob} (single chars always present). Pass ``freq`` when
    the caller already built/checkpointed the distinct-word table so it
    is not rebuilt (ADVICE r7)."""
    if freq is None:
        freq = word_freq_table(docs).localCheckpoint()
    chars = {
        r["c"]
        for r in freq.select(
            F.explode(F.split("word", "")).alias("c")
        ).distinct().collect()
        if r["c"]
    }
    seed = {r["piece"] for r in _seed_pieces(freq).collect()}
    pieces = sorted(chars | seed)
    # uniform init on the 6dp grid
    logp = {p: round(-math.log(len(pieces)), 6) for p in pieces}
    while True:
        for _ in range(em_iters):
            counts, _ll = _em_step_counts(freq, logp)
            tot = sum(c for _, c in counts)
            logp = {
                piece: round(math.log(c / tot), 6)
                for piece, c in counts
                if c > 0
            }
            for ch in chars:  # coverage floor: characters never vanish
                if ch not in logp:
                    logp[ch] = round(math.log(1e-9), 6)
        multi = sorted(
            (p for p in logp if len(p) > 1), key=lambda p: (-logp[p], p)
        )
        if len(multi) <= target_vocab:
            break
        keep = max(target_vocab, int(len(multi) * SHRINK))
        kept = set(multi[:keep]) | chars
        logp = {p: lp for p, lp in logp.items() if p in kept}
    return logp


ENCODE_SCHEMA = StructType(
    [
        StructField("word", StringType()),
        StructField("cnt", LongType()),
        StructField("n_pieces", LongType()),
        StructField("segmentation", StringType()),
    ]
)


def encode_unigram(freq: DataFrame, logp: dict[str, float]) -> DataFrame:
    """Viterbi-segment every distinct word: (word, cnt, n_pieces,
    'pi|pj|...'). The piece table is a broadcast-sized dict riding the
    Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            segs = [_viterbi(str(w), logp) for w in pdf["word"]]
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "cnt": pdf["cnt"].astype("int64"),
                    "n_pieces": [len(s) for s in segs],
                    "segmentation": ["|".join(s) for s in segs],
                }
            )

    return freq.mapInPandas(run, ENCODE_SCHEMA)


# --------------------------------------------------------------------------
# model lifecycle: train once -> persist -> serve (the PQ index pattern,
# operators/pq.py pq_save_index / similarity_topk_pq_from_index)
# --------------------------------------------------------------------------


def unigram_save_model(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Train on sf_dir's corpus and persist the piece table as parquet
    (piece, logp) — the standing artifact a real pipeline trains once
    and ships to every tokenization job."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    freq = word_freq_table(docs).localCheckpoint()
    logp = train_unigram(docs, freq=freq)
    spark.createDataFrame(
        sorted(logp.items()), "piece string, logp double"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def unigram_load_model(spark: SparkSession, path: str) -> dict[str, float]:
    """Load a persisted piece table back into the broadcastable dict the
    encoder rides (model-sized collect)."""
    return {
        r["piece"]: r["logp"] for r in spark.read.parquet(path).collect()
    }


def unigram_encode_from_model(
    spark: SparkSession, sf_dir: str, path: str
) -> DataFrame:
    """Serving path: Viterbi-encode sf_dir's distinct-word table with the
    SAVED model — no EM, one scan + one mapInPandas."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return encode_unigram(word_freq_table(docs), unigram_load_model(spark, path))


# per-process memo: corpus input files -> trained-model artifact path.
# Training is deterministic (9dp/6dp grids), so re-serving a model that
# an earlier call of THIS process trained on the same files is exact;
# the first call per process always (re)trains and overwrites.
_MODEL_PATHS: dict[tuple[str, ...], str] = {}


def _model_path_for(spark: SparkSession, sf_dir: str) -> str:
    import hashlib
    import os
    import tempfile

    files = tuple(sorted(load_table(spark, sf_dir, "documents").inputFiles()))
    path = _MODEL_PATHS.get(files)
    if path is None:
        tag = hashlib.md5("|".join(files).encode()).hexdigest()[:12]
        path = os.path.join(
            tempfile.gettempdir(), f"cc_mr_spark_unigram_model_{tag}"
        )
        unigram_save_model(spark, sf_dir, path)
        _MODEL_PATHS[files] = path
    return path


@register("unigram_token_stats", driver=False)  # EM floats: replica-pinned
def unigram_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi-segment the corpus' distinct-word table with the
    unigram-LM tokenizer: per word the piece count and the segmentation
    string, plus corpus fertility built from (cnt, n_pieces).

    Round 8: the query is the SERVING path — it encodes from the saved
    model artifact (training runs once per corpus per process via
    unigram_save_model, the PQ index lifecycle), so per-query cost is
    the encode, not the EM fit. rows-only for the driver (EM is not
    SQL-expressible); pytest pins the full trainer against a pure-python
    replica, pins saved-vs-inline equality, and checks segmentation
    invariants."""
    return unigram_encode_from_model(
        spark, sf_dir, _model_path_for(spark, sf_dir)
    )
