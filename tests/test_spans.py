"""Exact repeated-span detection (operators/spans.py): planted-corpus
semantics for the fixed-L window family — a shared run longer than L is
found by every window it contains and its coverage union never
double-counts overlapping windows; within-doc repeats count; short docs
and clean docs report zero coverage with the full doc domain intact."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from cc_mapreducer_spark.operators.spans import (
    L,
    repeated_spans,
    span_dup_coverage,
)

SF_ORACLE = "/root/testdata/sf0.01"

# 26 distinct all-letter words (the tokenizer drops non a-z) so no span
# repeats by accident
W = [f"w{chr(ord('a') + i)}x" for i in range(26)]
RUN10 = " ".join(W[:10])  # a 10-token run shared by docs 1 and 2
PHRASE8 = " ".join(W[10:18])  # an 8-token phrase repeated INSIDE doc 3


def _plant(tmp_path) -> str:
    texts = {
        # docs 1 & 2: the 10-token run at the head, distinct tails
        1: RUN10 + " " + " ".join(W[18:22]),
        2: RUN10 + " " + " ".join(W[22:26]),
        # doc 3: the 8-token phrase twice with a 2-token gap between
        3: PHRASE8 + " " + " ".join(W[18:20]) + " " + PHRASE8,
        # doc 4: clean (all-distinct words, nothing repeated elsewhere)
        4: " ".join(reversed(W[:20])),
        # doc 5: too short for any L-token window
        5: " ".join(W[:L - 1]),
    }
    docs = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }
    )
    d = str(tmp_path)
    pq.write_table(docs, f"{d}/documents.parquet")
    return d


def test_planted_repeats_and_counts(spark, tmp_path):
    d = _plant(tmp_path)
    rows = {r["span"]: r for r in repeated_spans(spark, d).collect()}
    # the 10-token shared run yields exactly its 10-L+1 = 3 windows,
    # each seen once per doc
    run_words = RUN10.split()
    for i in range(10 - L + 1):
        span = " ".join(run_words[i : i + L])
        assert rows[span]["n_occurrences"] == 2, span
        assert rows[span]["n_docs"] == 2, span
    # the within-doc phrase repeat: one span, 2 occurrences, 1 doc
    assert rows[PHRASE8]["n_occurrences"] == 2
    assert rows[PHRASE8]["n_docs"] == 1
    assert len(rows) == (10 - L + 1) + 1  # nothing else repeats


def test_coverage_union_never_double_counts(spark, tmp_path):
    d = _plant(tmp_path)
    cov = {r["doc_id"]: r for r in span_dup_coverage(spark, d).collect()}
    assert set(cov) == {1, 2, 3, 4, 5}  # full doc domain
    # docs 1/2: three overlapping windows over one 10-token run ->
    # union covers exactly 10 tokens, not 3 * L
    assert cov[1]["covered_tokens"] == 10
    assert cov[2]["covered_tokens"] == 10
    assert cov[1]["total_tokens"] == 14
    assert abs(cov[1]["dup_coverage"] - round(10 / 14, 6)) < 1e-9
    # doc 3: both copies of the phrase covered, the 2-token gap not
    assert cov[3]["covered_tokens"] == 16
    assert cov[3]["total_tokens"] == 18
    # clean and too-short docs: zero coverage, still present
    assert cov[4]["covered_tokens"] == 0 and cov[4]["dup_coverage"] == 0.0
    assert cov[5]["covered_tokens"] == 0 and cov[5]["total_tokens"] == L - 1


def test_span_decontamination_planted(spark, tmp_path):
    """A test-split doc sharing one L-token span with a train-split doc
    is flagged; a clean test doc is not; val docs never appear. Split
    membership is the deterministic md5 grid (sampling.py), so the
    planted ids are chosen by their actual hash: 2-7 land in train,
    23/25/44 in test, 1 in val."""
    from cc_mapreducer_spark.operators.spans import span_decontamination

    leak = " ".join(W[:L])  # the contaminating span
    texts = {
        2: leak + " " + " ".join(W[20:24]),          # train: carries the span
        3: " ".join(W[10:22]),                        # train: unrelated
        23: " ".join(W[22:26]) + " " + leak,          # test: CONTAMINATED
        25: " ".join(reversed(W[:12])),               # test: clean
        44: " ".join(W[:L - 1]),                      # test: too short
        1: leak + " " + " ".join(W[24:26]),           # val: ignored entirely
    }
    docs = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }
    )
    d = str(tmp_path)
    pq.write_table(docs, f"{d}/documents.parquet")
    rows = {r["doc_id"]: r for r in span_decontamination(spark, d).collect()}
    assert set(rows) == {23, 25, 44}  # full test-doc domain, nothing else
    assert rows[23]["flagged"] and rows[23]["n_contaminated"] == 1
    assert not rows[25]["flagged"] and rows[25]["n_contaminated"] == 0
    assert rows[44]["n_spans"] == 0 and not rows[44]["flagged"]


def _py_repeats_and_coverage(texts: dict[int, str], length: int = L):
    """Pure-Python replica of the span family: Counter over every
    L-window, then an interval union per doc — the independent reference
    the Spark window/agg plan is checked against."""
    import re
    from collections import Counter

    tok = {
        d: [w for w in re.sub("[^a-z]+", " ", t.lower()).split() if w]
        for d, t in texts.items()
    }
    counts: Counter = Counter()
    for ws in tok.values():
        for i in range(len(ws) - length + 1):
            counts[" ".join(ws[i : i + length])] += 1
    cov = {}
    for d, ws in tok.items():
        ivs = [
            (i, i + length - 1)
            for i in range(len(ws) - length + 1)
            if counts[" ".join(ws[i : i + length])] >= 2
        ]
        covered, cur_s, cur_e = 0, None, -1
        for s, e in ivs:
            if s > cur_e:
                if cur_s is not None:
                    covered += cur_e - cur_s + 1
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_s is not None:
            covered += cur_e - cur_s + 1
        cov[d] = (covered, len(ws))
    return counts, cov


def test_randomized_corpora_match_python_replica(spark, tmp_path):
    """Random low-vocab corpora (repeats arise by chance everywhere,
    including nested/overlapping runs the planted test can't stage):
    Spark's repeated_spans and span_dup_coverage must equal the
    pure-Python Counter + interval-union replica exactly."""
    import random

    rng = random.Random(77)
    texts: dict[int, str] = {}
    doc_id = 0
    for case in range(6):
        # tiny per-case vocab forces organic span collisions; per-case
        # prefix stops spans matching across cases
        vocab = [f"c{chr(ord('a') + case)}{chr(ord('a') + i)}" for i in range(10)]
        for _ in range(8):
            n = rng.randint(0, 40)
            texts[doc_id] = " ".join(rng.choice(vocab) for _ in range(n))
            doc_id += 1
    docs = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }
    )
    d = str(tmp_path)
    pq.write_table(docs, f"{d}/documents.parquet")

    exp_counts, exp_cov = _py_repeats_and_coverage(texts)
    got = {
        r["span"]: (r["n_occurrences"], r["n_docs"])
        for r in repeated_spans(spark, d).collect()
    }
    exp_rep = {s: c for s, c in exp_counts.items() if c >= 2}
    assert {s: c for s, (c, _) in got.items()} == exp_rep
    cov = {r["doc_id"]: r for r in span_dup_coverage(spark, d).collect()}
    assert set(cov) == set(texts)
    for doc, (covered, total) in exp_cov.items():
        assert cov[doc]["covered_tokens"] == covered, doc
        assert cov[doc]["total_tokens"] == total, doc


def test_planted_corpus_matches_duckdb(spark, tmp_path):
    """The gaps-and-islands SQL and the Spark window plan agree on the
    planted corpus too, not just the driver tables (the islands logic is
    the part a refactor would silently break)."""
    import duckdb

    from cc_mapreducer_spark import registry
    from tests.oracle import compare_frames

    d = _plant(tmp_path)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    for name in ("repeated_spans", "span_dup_coverage"):
        spdf = registry.all_queries()[name](spark, d).toPandas()
        odf = con.sql(registry.all_oracles()[name]).df()
        compare_frames(spdf, odf, name)


def test_multi_resolution_separates_boilerplate_from_long_passages(
    spark, tmp_path
):
    """The planted corpus VERDICT r5 item 4 asks for: a 10-token
    boilerplate repeat that L=8 coverage counts but L=32 must NOT (the
    over-count a single short resolution suffers), and a 40-token copied
    passage both resolutions count in full."""
    import itertools
    import string

    from cc_mapreducer_spark.operators.spans import span_dup_coverage_multi

    vocab = [
        "q" + a + b + "z"
        for a, b in itertools.product(string.ascii_lowercase, repeat=2)
    ]
    boiler10 = vocab[:10]
    passage40 = vocab[10:50]
    texts = {
        1: " ".join(boiler10 + vocab[50:55]),        # boilerplate + tail
        2: " ".join(boiler10 + vocab[55:60]),        # boilerplate + tail
        3: " ".join(passage40 + vocab[60:65]),       # long passage + tail
        4: " ".join(passage40 + vocab[65:70]),       # long passage + tail
        5: " ".join(vocab[70:100]),                  # clean
    }
    docs = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }
    )
    d = str(tmp_path)
    pq.write_table(docs, f"{d}/documents.parquet")
    got = {
        r["doc_id"]: r for r in span_dup_coverage_multi(spark, d).collect()
    }
    # short boilerplate: counted at L=8, INVISIBLE at L=32
    for doc in (1, 2):
        assert got[doc]["covered_l8"] == 10, doc
        assert got[doc]["covered_l32"] == 0, doc
    # long passage: counted in full at both resolutions
    for doc in (3, 4):
        assert got[doc]["covered_l8"] == 40, doc
        assert got[doc]["covered_l32"] == 40, doc
    assert got[5]["covered_l8"] == got[5]["covered_l32"] == 0
    # and the DuckDB oracle agrees on the planted corpus
    import duckdb

    from cc_mapreducer_spark import registry
    from tests.oracle import compare_frames

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    spdf = registry.all_queries()["span_dup_coverage_multi"](
        spark, d
    ).toPandas()
    odf = con.sql(registry.all_oracles()["span_dup_coverage_multi"]).df()
    compare_frames(spdf, odf, "span_dup_coverage_multi")


def test_span_removal_keeps_one_canonical_copy(spark, tmp_path):
    """The removal stage applies the Lee et al. keep-one policy on the
    planted corpus: doc 1 (globally first) keeps the shared run, doc 2
    loses it; doc 3's within-doc phrase repeat keeps its first
    occurrence only; clean/short docs come back verbatim."""
    from cc_mapreducer_spark.operators.spans import span_removal

    d = _plant(tmp_path)
    got = {r["doc_id"]: r for r in span_removal(spark, d).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    # doc 1 holds every canonical occurrence of the shared run: untouched
    assert got[1]["removed_tokens"] == 0
    assert got[1]["cleaned_text"] == (RUN10 + " " + " ".join(W[18:22]))
    # doc 2's copy of the 10-token run is excised; its 4-word tail stays
    assert got[2]["removed_tokens"] == 10
    assert got[2]["cleaned_text"] == " ".join(W[22:26])
    # doc 3: first PHRASE8 occurrence canonical, second removed
    assert got[3]["removed_tokens"] == 8
    assert got[3]["cleaned_text"] == (
        PHRASE8 + " " + " ".join(W[18:20])
    )
    # clean and too-short docs verbatim (token-joined)
    assert got[4]["removed_tokens"] == 0
    assert got[4]["cleaned_text"] == " ".join(reversed(W[:20]))
    assert got[5]["removed_tokens"] == 0
    assert got[5]["cleaned_text"] == " ".join(W[: L - 1])
    # token accounting closes
    for r in got.values():
        assert r["kept_tokens"] + r["removed_tokens"] == r["total_tokens"]
    # and the DuckDB oracle agrees on the planted corpus
    import duckdb

    from cc_mapreducer_spark import registry
    from tests.oracle import compare_frames

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    spdf = registry.all_queries()["span_removal"](spark, d).toPandas()
    odf = con.sql(registry.all_oracles()["span_removal"]).df()
    compare_frames(spdf, odf, "span_removal")


def test_removal_grain_l32_keeps_short_quotes(spark, tmp_path):
    """The removal POLICY grain matters (VERDICT r6 item 1): a 10-token
    quotation shared by two documents is over-cut by L=8 removal but
    PRESERVED by L=32 removal, while a 40-token memorized passage is
    excised from its non-canonical doc at BOTH grains — the Lee et al.
    long-repeat regime separation, applied."""
    import itertools

    from cc_mapreducer_spark.operators.spans import (
        span_removal,
        span_removal_l32,
    )

    # plenty of distinct 3-letter words the tokenizer keeps
    V = [
        f"{a}{b}q"
        for a, b in itertools.product("abcdefghij", "abcdefghijklmnop")
    ]
    long40 = V[:40]  # the memorized passage
    quote10 = V[40:50]  # the legitimate short quotation
    texts = {
        11: " ".join(long40 + V[50:55]),
        12: " ".join(long40 + V[55:60]),
        13: " ".join(V[60:75] + quote10 + V[75:85]),
        14: " ".join(V[85:100] + quote10 + V[100:110]),
    }
    docs = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }
    )
    d = str(tmp_path)
    pq.write_table(docs, f"{d}/documents.parquet")

    l8 = {r["doc_id"]: r for r in span_removal(spark, d).collect()}
    l32 = {r["doc_id"]: r for r in span_removal_l32(spark, d).collect()}
    # the memorized passage: canonical copy (doc 11) stays, doc 12's is
    # excised at BOTH grains (islands of overlapping windows merge to
    # the full 40-token run)
    for got in (l8, l32):
        assert got[11]["removed_tokens"] == 0
        assert got[11]["cleaned_text"] == texts[11]
        assert got[12]["removed_tokens"] == 40
        assert got[12]["cleaned_text"] == " ".join(V[55:60])
    # the 10-token quote: L=8 removal over-cuts doc 14's copy...
    assert l8[14]["removed_tokens"] == 10
    assert l8[14]["cleaned_text"] == " ".join(V[85:100] + V[100:110])
    # ...but L=32 removal keeps it verbatim (no repeated 32-token run)
    assert l32[14]["removed_tokens"] == 0
    assert l32[14]["cleaned_text"] == texts[14]
    assert l32[13]["removed_tokens"] == 0
    # the DuckDB oracle agrees at the L=32 grain on the planted corpus
    import duckdb

    from cc_mapreducer_spark import registry
    from tests.oracle import compare_frames

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    spdf = registry.all_queries()["span_removal_l32"](spark, d).toPandas()
    odf = con.sql(registry.all_oracles()["span_removal_l32"]).df()
    compare_frames(spdf, odf, "span_removal_l32")


def test_span_keys_collision_free_at_test_scale(spark, tmp_path):
    """ADVICE r7: the Spark pipeline groups on xxhash64 span keys while
    the DuckDB oracles group on real span strings — a 64-bit collision
    would silently diverge them. Negligible by the math (~1e-11 at
    oracle scale), but make a collision at test scale fail LOUDLY:
    every sk produced over the randomized low-vocab corpus (organic
    repeats everywhere) must map to exactly one span string."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cc_mapreducer_spark.operators.spans import L, span_keys
    from cc_mapreducer_spark.tables import load_table

    rng = random.Random(78)
    vocab = ["wa", "wb", "wc", "wd", "we", "wf", "wg", "wh"]
    texts = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 60)))
        for d in range(60)
    }
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
            }
        ),
        f"{d}/documents.parquet",
    )
    sk = {
        (r["doc_id"], r["start"]): r["sk"]
        for r in span_keys(load_table(spark, d, "documents")).collect()
    }
    span_of: dict[int, set[str]] = {}
    import re

    for doc, t in texts.items():
        ws = [w for w in re.sub("[^a-z]+", " ", t.lower()).split() if w]
        for i in range(len(ws) - L + 1):
            key = sk[(doc, i + 1)]
            span_of.setdefault(key, set()).add(" ".join(ws[i : i + L]))
    assert span_of, "fixture produced no spans"
    collisions = {k: v for k, v in span_of.items() if len(v) > 1}
    assert not collisions, f"xxhash64 span-key collision(s): {collisions}"
