"""Unigram-LM tokenizer (operators/unigram_lm.py): the lattice
forward/backward matches brute-force enumeration exactly, Viterbi
matches a brute-force best-segmentation search under the same rounded
tie-break, the distributed trainer matches a pure-python replica on a
planted corpus, and the registered query holds its invariants."""

from __future__ import annotations

import itertools
import math

from cc_mapreducer_spark.operators.unigram_lm import (
    MAX_PIECE_LEN,
    _forward_backward,
    _viterbi,
    encode_unigram,
    train_unigram,
    unigram_token_stats,
)

SF_ORACLE = "/root/testdata/sf0.001"


def _all_segmentations(word: str, pieces: set[str]):
    """Every segmentation of word into pieces (brute force)."""
    if not word:
        yield []
        return
    for ln in range(1, min(MAX_PIECE_LEN, len(word)) + 1):
        head = word[:ln]
        if head in pieces:
            for rest in _all_segmentations(word[ln:], pieces):
                yield [head] + rest


def test_forward_backward_matches_brute_force():
    logp = {
        "a": math.log(0.3),
        "b": math.log(0.2),
        "ab": math.log(0.35),
        "ba": math.log(0.1),
        "bab": math.log(0.05),
    }
    for word in ("abab", "aabb", "babab", "a"):
        total, ec = _forward_backward(word, logp)
        segs = list(_all_segmentations(word, set(logp)))
        probs = [math.exp(sum(logp[p] for p in s)) for s in segs]
        z = sum(probs)
        assert abs(math.exp(total) - z) < 1e-12
        # expected counts: posterior-weighted piece counts
        expect: dict[str, float] = {}
        for s, pr in zip(segs, probs):
            for p in s:
                expect[p] = expect.get(p, 0.0) + pr / z
        assert set(ec) == set(expect)
        for p in expect:
            assert abs(ec[p] - expect[p]) < 1e-10, (word, p)


def test_forward_backward_unreachable_word():
    total, ec = _forward_backward("xyz", {"a": -1.0})
    assert total == float("-inf") and ec == {}


def test_viterbi_matches_brute_force_with_tiebreak():
    import random

    rng = random.Random(17)
    alphabet = "abc"
    for _ in range(60):
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
        pieces = {c: round(math.log(0.2), 6) for c in alphabet}
        for _ in range(5):
            i = rng.randint(0, len(word) - 1)
            j = rng.randint(i + 1, min(len(word), i + MAX_PIECE_LEN))
            pieces[word[i:j]] = round(math.log(rng.uniform(0.01, 0.5)), 6)
        got = _viterbi(word, pieces)
        best = min(
            (
                (
                    -sum(round(pieces[p], 6) for p in s),
                    len(s),
                    tuple(s),
                )
                for s in _all_segmentations(word, set(pieces))
            ),
        )
        assert tuple(got) == best[2], (word, got, best)


def _replica_train(words: dict[str, int]) -> dict[str, float]:
    """Pure-python replica of train_unigram's exact schedule: seed by
    freq*len (top SEED_VOCAB), uniform init, EM_ITERS EM steps with
    9dp-rounded counts, prune multi-char pieces by SHRINK toward
    TARGET_VOCAB, repeat; char coverage floored."""
    from cc_mapreducer_spark.operators.unigram_lm import (
        EM_ITERS,
        SEED_VOCAB,
        SHRINK,
        TARGET_VOCAB,
    )

    chars = {c for w in words for c in w}
    scores: dict[str, int] = {}
    for w, cnt in words.items():
        for i in range(len(w)):
            for ln in range(2, min(MAX_PIECE_LEN, len(w) - i) + 1):
                p = w[i : i + ln]
                scores[p] = scores.get(p, 0) + cnt * len(p)
    seed = sorted(scores, key=lambda p: (-scores[p], p))[:SEED_VOCAB]
    pieces = sorted(chars | set(seed))
    logp = {p: round(-math.log(len(pieces)), 6) for p in pieces}
    while True:
        for _ in range(EM_ITERS):
            agg: dict[str, float] = {}
            for w, cnt in words.items():
                total, ec = _forward_backward(w, logp)
                if total == float("-inf"):
                    continue
                for p, c in ec.items():
                    agg[p] = agg.get(p, 0.0) + c * cnt
            agg = {p: round(c, 9) for p, c in agg.items()}
            tot = sum(agg.values())
            logp = {
                p: round(math.log(c / tot), 6) for p, c in agg.items() if c > 0
            }
            for ch in chars:
                if ch not in logp:
                    logp[ch] = round(math.log(1e-9), 6)
        multi = sorted((p for p in logp if len(p) > 1), key=lambda p: (-logp[p], p))
        if len(multi) <= TARGET_VOCAB:
            break
        keep = max(TARGET_VOCAB, int(len(multi) * SHRINK))
        kept = set(multi[:keep]) | chars
        logp = {p: lp for p, lp in logp.items() if p in kept}
    return logp


def test_trainer_matches_python_replica(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox",
        "lowering the lowest newer wider low lower newest",
        "tokenization tokenizer tokens token tokenize",
        "the the the quick quick brown",
    ] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from cc_mapreducer_spark.operators.bpe import word_freq_table

    words = {
        r["word"]: r["cnt"] for r in word_freq_table(docs).collect()
    }
    expect = _replica_train(words)
    got = train_unigram(docs)
    assert set(got) == set(expect)
    for p in expect:
        assert abs(got[p] - expect[p]) <= 2e-6, p
    # and the segmentations agree exactly under the shared Viterbi
    freq = word_freq_table(docs)
    segs = {
        r["word"]: r["segmentation"]
        for r in encode_unigram(freq, got).collect()
    }
    for w in words:
        assert segs[w] == "|".join(_viterbi(w, expect)), w
        assert segs[w].replace("|", "") == w  # concatenation invariant


def test_registered_query_invariants(spark):
    rows = unigram_token_stats(spark, SF_ORACLE).collect()
    assert len(rows) >= 20
    for r in rows:
        assert r["segmentation"].replace("|", "") == r["word"]
        assert r["n_pieces"] == r["segmentation"].count("|") + 1
        assert 1 <= r["n_pieces"] <= len(r["word"])
    # a corpus this repetitive must learn real multi-char pieces
    assert any(r["n_pieces"] < len(r["word"]) for r in rows)


def test_saved_model_serving_equals_inline(spark, tmp_path):
    """The train->persist->load->encode lifecycle must reproduce the
    inline train->encode result exactly (round 8 split, mirroring the
    PQ index lifecycle)."""
    from cc_mapreducer_spark.operators.bpe import word_freq_table
    from cc_mapreducer_spark.operators.unigram_lm import (
        encode_unigram,
        train_unigram,
        unigram_encode_from_model,
        unigram_load_model,
        unigram_save_model,
    )
    from cc_mapreducer_spark.tables import load_table, spread

    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "unigram_model")
    unigram_save_model(spark, sf, path)
    docs = spread(load_table(spark, sf, "documents"))
    freq = word_freq_table(docs).localCheckpoint()
    inline = encode_unigram(freq, train_unigram(docs, freq=freq)).toPandas()
    served = unigram_encode_from_model(spark, sf, path).toPandas()
    # the loaded dict must round-trip the trained one exactly
    assert unigram_load_model(spark, path) == train_unigram(docs, freq=freq)
    key = lambda df: sorted(
        map(tuple, df[["word", "cnt", "n_pieces", "segmentation"]].values)
    )
    assert key(inline) == key(served)
