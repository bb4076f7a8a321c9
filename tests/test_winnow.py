"""Winnowing: the SIGMOD-2003 detection guarantee on planted passages,
the rightmost-min tie rule, density, and the boilerplate-fingerprint cap.
Oracle parity for shared_passages runs in test_oracle_parity.py."""

from __future__ import annotations

import random

from cc_mapreducer_spark.operators.winnow import (
    K,
    MAX_DOCS_PER_FP,
    W,
    shared_passages,
    winnow_fingerprints,
)
from tests.conftest import SF_ORACLE


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _rand_words(rng, n):
    return " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(6))
        for _ in range(n)
    )


def test_guarantee_shared_run_produces_shared_fingerprint(spark):
    # the paper's guarantee: a shared run of >= w + k - 1 words yields at
    # least one common fingerprint, wherever the run sits in each doc
    rng = random.Random(7)
    passage = _rand_words(rng, W + K - 1)  # minimal guaranteed length
    a = _rand_words(rng, 40) + " " + passage + " " + _rand_words(rng, 40)
    b = passage + " " + _rand_words(rng, 80)
    fps = winnow_fingerprints(_docs(spark, [a, b]))
    rows = fps.collect()
    set_a = {r["fp"] for r in rows if r["doc_id"] == 0}
    set_b = {r["fp"] for r in rows if r["doc_id"] == 1}
    assert set_a & set_b


def test_no_shared_fingerprints_without_shared_grams(spark):
    rng = random.Random(11)
    fps = winnow_fingerprints(
        _docs(spark, [_rand_words(rng, 60), _rand_words(rng, 60)])
    )
    rows = fps.collect()
    set_a = {r["fp"] for r in rows if r["doc_id"] == 0}
    set_b = {r["fp"] for r in rows if r["doc_id"] == 1}
    assert not (set_a & set_b)


def test_density_roughly_two_over_w_plus_one(spark):
    # expected fingerprint density for random text is ~2/(w+1) of grams
    rng = random.Random(13)
    n_words = 2000
    doc = _docs(spark, [_rand_words(rng, n_words)])
    n_fp = winnow_fingerprints(doc).count()
    n_grams = n_words - (K - 1)
    density = n_fp / n_grams
    assert 0.25 < density < 0.55  # 2/(W+1) = 0.4 for W=4


def test_shared_passages_planted_pair_found_with_count(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(17)
    passage = _rand_words(rng, 30)  # long passage -> several shared fps
    texts = [
        _rand_words(rng, 50) + " " + passage,
        passage + " " + _rand_words(rng, 50),
        _rand_words(rng, 80),
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["t"] * 3),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    rows = shared_passages(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["n_shared"] >= 2


def test_boilerplate_cap_suppresses_universal_footer(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(19)
    footer = _rand_words(rng, 30)
    n_docs = MAX_DOCS_PER_FP + 10  # footer fp exceeds the cap -> dropped
    texts = [_rand_words(rng, 40) + " " + footer for _ in range(n_docs)]
    t = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_docs),
            "source": pa.array(["t"] * n_docs),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    # without the cap this would be C(60, 2) = 1770 pairs; the footer's
    # fingerprints are hot (60 docs > cap) so almost everything drops.
    # Boundary grams (random-prefix + footer-start) are per-doc-pair rare
    # and below MIN_SHARED, so the pair set is empty.
    assert shared_passages(spark, str(tmp_path)).count() == 0


def test_driver_corpus_has_passage_pairs(spark):
    # the sf0.01 corpus contains planted near-dups: passage pairs exist,
    # so the parity check upstream is evidence on real rows, not 0 == 0
    assert shared_passages(spark, SF_ORACLE).count() > 0
