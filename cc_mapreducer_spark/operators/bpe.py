"""Distributed BPE (byte-pair-encoding) tokenizer training.

operators/tokenize.py builds a WORD-level vocab; real LM pipelines train
subword tokenizers. This is Sennrich et al. 2016 BPE, trained with Spark
aggregations:

  1. The corpus collapses to the distinct-word frequency table ONCE
     (the classic trick: BPE statistics only need (word, count), so the
     iteration runs over vocab-sized data — millions of rows at 100 TB,
     not the corpus).
  2. Each round: explode adjacent symbol pairs weighted by word count ->
     ONE shuffle on the pair -> the driver takes the argmax pair (a
     1-row TakeOrdered with a count-desc / pair-asc total order, so
     training is deterministic) -> every word's symbol sequence applies
     the merge via a left fold (built-in `aggregate` HOF — the fold is
     provably equivalent to the reference greedy leftmost scan: the
     just-merged element a+b can never equal the pair's left symbol a,
     so "last element == a" only matches unmerged occurrences).
  3. n_merges rounds; the shrinking word frame is localCheckpoint'd per
     round (cluster deployments write parquet), same discipline as
     clustering.connected_components.

Encoding applies the learned merge list in rank order per word — a
Python loop, so it runs Arrow-batched in mapInPandas (the production
analog swaps in a native tokenizer library behind the same seam).

No DuckDB oracle: training is iterative with a data-dependent schedule.
Evidence is a pure-Python reference implementation (exact merge-list and
encoding equality on the driver corpus) plus hand-pinned merges on a
constructed corpus — the policy of the other iterative operators
(IVF/PQ/pagerank/connected components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table, spread

_EOW = "</w>"  # end-of-word marker (standard BPE)
N_MERGES = 40
MIN_PAIR_COUNT = 2


def word_freq_table(docs: DataFrame) -> DataFrame:
    """(word, cnt) over the tokenized corpus — the only corpus-sized
    job in training; everything after runs on distinct words. Uses the
    repo's shared tokenizer expression (text_analysis._SPARK_WORDS) so
    BPE sees exactly the words every other text operator sees."""
    from cc_mapreducer_spark.operators.text_analysis import _SPARK_WORDS

    words = docs.select(F.explode(F.expr(_SPARK_WORDS)).alias("word"))
    return words.groupBy("word").agg(F.count("*").alias("cnt"))


def _initial_symbols(freq: DataFrame) -> DataFrame:
    """word -> array of single-char symbols + end-of-word marker."""
    return freq.select(
        "word",
        "cnt",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(_EOW))
        ).alias("syms"),
    )


# Left fold == greedy leftmost merge (see module docstring for why the
# equivalence holds). acc is the output array; each step either fuses the
# incoming symbol with the accumulator's last element or appends it.
_MERGE_FOLD = (
    "aggregate(syms, cast(array() as array<string>), (out, x) -> "
    "IF(size(out) > 0 AND element_at(out, -1) = '{a}' AND x = '{b}', "
    "   concat(slice(out, 1, size(out) - 1), array('{ab}')), "
    "   concat(out, array(x))))"
)


def _apply_merge(syms_df: DataFrame, a: str, b: str) -> DataFrame:
    def q(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "\\'")

    expr = _MERGE_FOLD.format(a=q(a), b=q(b), ab=q(a + b))
    return syms_df.select("word", "cnt", F.expr(expr).alias("syms"))


def train_bpe(
    docs: DataFrame,
    n_merges: int = N_MERGES,
    min_pair_count: int = MIN_PAIR_COUNT,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` merges; returns [(left, right, count)]
    in rank order. Stops early when no pair reaches min_pair_count."""
    syms = _initial_symbols(word_freq_table(docs)).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = syms.select(
            "cnt",
            # guard: sequence(1, 0) is DESCENDING in Spark, so a fully
            # merged single-symbol word must yield an empty pair array,
            # not an out-of-bounds probe
            F.explode(
                F.expr(
                    "IF(size(syms) < 2, "
                    "cast(array() as array<struct<a: string, b: string>>), "
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(element_at(syms, i) as a, "
                    "element_at(syms, i + 1) as b)))"
                )
            ).alias("p"),
        ).groupBy("p.a", "p.b").agg(F.sum("cnt").alias("n"))
        # deterministic argmax: count desc, then pair lexicographic
        top = pairs.orderBy(F.desc("n"), "a", "b").take(1)
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        syms = _apply_merge(syms, a, b).localCheckpoint()
    return merges


def encode_bpe(docs: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """(doc_id, tokens array<string>, n_tokens) — applies the merge list
    in rank order per word, Arrow-batched (a per-word Python loop is the
    honest shape here; production swaps in a native tokenizer behind
    this exact seam). The merge table rides into the closure — a few KB
    broadcast, never a join."""
    import pandas as pd

    ranked = [(a, b) for a, b, _ in merges]

    def enc_word(word: str) -> list[str]:
        out = list(word) + [_EOW]
        for a, b in ranked:
            merged, i = [], 0
            while i < len(out):
                if i + 1 < len(out) and out[i] == a and out[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(out[i])
                    i += 1
            out = merged
        return out

    def run(batches):
        # per-task memo: words repeat heavily (the same fact that lets
        # training collapse to the distinct-word table), so encode each
        # distinct word once per task, not once per occurrence
        memo: dict[str, list[str]] = {}

        def enc_cached(w: str) -> list[str]:
            t = memo.get(w)
            if t is None:
                t = memo[w] = enc_word(w)
            return t

        for pdf in batches:
            toks, word_counts = [], []
            for text in pdf["text"]:
                words = [w for w in _normalize(text).split(" ") if w]
                doc_tokens: list[str] = []
                for w in words:
                    doc_tokens.extend(enc_cached(w))
                toks.append(doc_tokens)
                word_counts.append(len(words))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                    # words are already split here — emitting the count
                    # saves consumers (bpe_token_stats) a second full
                    # tokenization pass over the corpus
                    "n_words": word_counts,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        run, "doc_id long, tokens array<string>, n_tokens int, n_words int"
    )


def _normalize(text: str) -> str:
    import re

    return re.sub("[^a-z]+", " ", text.lower())


from cc_mapreducer_spark.functions.trainer_sql import bpe_stats_sql

# driver=False: the stats are hashed inside tokenizer_suite (the roster
# is pinned at exactly 50 keys); since round 9 the single carries its
# own DuckDB oracle anyway - the trainer unrolls in SQL
# (functions/trainer_sql.py) - so pytest value-checks it cross-engine
@register("bpe_token_stats", oracle=bpe_stats_sql(), driver=False)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train BPE on the documents corpus and report per-source token
    compression: words in, subword tokens out, tokens-per-word. The
    driver-facing evidence for the trainer (values are pinned exactly
    against a pure-Python reference in pytest)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    merges = train_bpe(docs)
    enc = encode_bpe(docs, merges)  # carries n_words: no second tokenize pass
    per_doc = docs.select("doc_id", "source").join(enc, "doc_id")
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum("n_tokens") / F.sum("n_words").cast("double"), 6
        ).alias("tokens_per_word"),
    )
