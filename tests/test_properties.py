"""Property-grade guarantees, batched into single Spark jobs:

* BPE merge fold == reference greedy leftmost scan, EXHAUSTIVELY over
  every symbol sequence up to length 6 (the fold's equivalence argument
  in operators/bpe.py, machine-checked rather than argued).
* Winnowing detection guarantee on randomized planted runs at random
  positions (the w+k-1 theorem exercised across many layouts at once).
* FastSS completeness for randomized single edits of all three kinds.
"""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.bpe import _MERGE_FOLD
from cc_mapreducer_spark.operators.winnow import K, W, winnow_fingerprints


def _greedy_merge(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_bpe_fold_equals_greedy_exhaustively(spark):
    # every sequence up to length 6 over {a, b, ab} x merges (a,b),(a,a),
    # (ab,b): includes the adversarial cases where a previously-merged
    # token equals a pair element — ONE Spark job for all ~3.2k cases
    alphabet = ["a", "b", "ab"]
    merges = [("a", "b"), ("a", "a"), ("ab", "b")]
    cases = []
    for ln in range(0, 7):
        for seq in itertools.product(alphabet, repeat=ln):
            cases.append(list(seq))
    for a, b in merges:
        df = spark.createDataFrame(
            [(i, 1, c) for i, c in enumerate(cases)],
            "word long, cnt long, syms array<string>",
        )
        expr = _MERGE_FOLD.format(a=a, b=b, ab=a + b)
        got = {
            r["word"]: r["m"]
            for r in df.select("word", F.expr(expr).alias("m")).collect()
        }
        for i, c in enumerate(cases):
            assert got[i] == _greedy_merge(c, a, b), (c, a, b)


def _rand_word(rng, prefix):
    return prefix + "".join(
        rng.choice("abcdefghijklmnop") for _ in range(5)
    )


def test_winnowing_guarantee_randomized_layouts(spark):
    # 10 cases, each its own prefix-space: a shared run of exactly
    # w + k - 1 words planted at RANDOM positions in two docs of random
    # lengths must always yield a common fingerprint — one job total
    rng = random.Random(23)
    docs, expect_pairs = [], []
    doc_id = 0
    for case in range(10):
        p = chr(ord("q") + case % 8) + str(case)
        run = [_rand_word(rng, p) for _ in range(W + K - 1)]
        for _ in range(2):
            pre = [_rand_word(rng, p) for _ in range(rng.randint(0, 40))]
            post = [_rand_word(rng, p) for _ in range(rng.randint(0, 40))]
            docs.append((doc_id, " ".join(pre + run + post)))
            doc_id += 1
        expect_pairs.append((doc_id - 2, doc_id - 1))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = winnow_fingerprints(df).collect()
    fps = {}
    for r in rows:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    for a, b in expect_pairs:
        assert fps[a] & fps[b], f"case pair ({a},{b}) shared no fingerprint"


def test_fastss_finds_every_random_single_edit(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cc_mapreducer_spark.operators.dedup import fuzzy_word_pairs

    rng = random.Random(29)
    letters = "abcdefghijklmnop"
    pairs, vocab_words = [], []
    for case in range(12):
        base = "".join(rng.choice(letters) for _ in range(rng.randint(4, 8)))
        kind = rng.choice(["sub", "ins", "del"])
        i = rng.randint(0, len(base) - 1)
        if kind == "sub":
            repl = rng.choice([c for c in letters if c != base[i]])
            other = base[:i] + repl + base[i + 1 :]
        elif kind == "ins":
            other = base[:i] + rng.choice(letters) + base[i:]
        else:
            other = base[:i] + base[i + 1 :]
        if other == base or len(other) < 3:
            continue
        pairs.append(tuple(sorted((base, other))))
        vocab_words += [base, other]
    texts = [" ".join(vocab_words)]
    t = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"]),
            "source": pa.array(["t"]),
            "n_chars": pa.array([len(texts[0])], pa.int64()),
        }
    )
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    got = {
        (r["word_a"], r["word_b"])
        for r in fuzzy_word_pairs(spark, str(tmp_path)).collect()
    }
    for p in set(pairs):
        assert p in got, f"edit pair {p} missed by deletion blocking"


def test_bloom_no_false_negatives_property():
    # Bloom guarantee, hypothesis-driven over the PURE kernel (the same
    # numpy code the executors run): for ANY key set and any sane (m, k),
    # every inserted key must probe all-hit. False negatives are the one
    # failure mode the exact verify stage cannot repair — a missed dupe
    # enters the corpus silently — so this is the property to hammer.
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from cc_mapreducer_spark.operators.bloom import (
        _bloom_params,
        _probe_positions,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        keys=st.lists(
            st.integers(min_value=0, max_value=2**64 - 1),
            min_size=1,
            max_size=300,
        ),
        fpp=st.sampled_from([0.001, 0.01, 0.1]),
    )
    def run(keys, fpp):
        arr = np.array(keys, dtype=np.uint64)
        m, k = _bloom_params(len(set(keys)), fpp)
        bm = np.zeros(m // 8, dtype=np.uint8)
        pos = _probe_positions(arr, m, k).ravel()
        np.bitwise_or.at(bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        probe = _probe_positions(arr, m, k)
        hit = (bm[probe >> 3] & (1 << (probe & 7)).astype(np.uint8)) != 0
        assert hit.all(), "false negative — inserted key not found"

    run()
