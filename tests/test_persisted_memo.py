"""Focused tests for the keyed persist memo (similarity._persisted)
variant/identity fixes (r12, ADVICE r11 + VERDICT r11 item 9):

- two DIFFERENT in-memory corpora must not collide on one memo slot
  (the r11 bug: lm_doc_scores(B) after lm_doc_scores(A) was scored
  against A's cached model because inputFiles() is [] for both);
- an in-session overwrite of a source table must MISS the memo and
  rebuild (the staleness scenario the variant exists to catch);
- two corpora in one session coexist in separate slots instead of
  thrashing a single one.
"""

from __future__ import annotations

import math
import shutil
from collections import Counter

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators import similarity
from cc_mapreducer_spark.operators.quality_lm import LAM, lm_doc_scores

SF_SMOKE = "/root/testdata/sf0.001"


def _clear_memo():
    for _, df in similarity._PERSISTED.values():
        try:
            df.unpersist()
        except Exception:
            pass
    similarity._PERSISTED.clear()


def _py_ppl(texts: dict[int, str], lam: float = LAM) -> dict[int, float]:
    """Reference interpolated-bigram ppl (same math as the operator)."""
    toks = {d: t.lower().split() for d, t in texts.items()}
    uni = Counter(w for ws in toks.values() for w in ws)
    bi = Counter(
        (ws[i - 1], ws[i]) for ws in toks.values() for i in range(1, len(ws))
    )
    n_total, n_vocab = sum(uni.values()), len(uni)
    out = {}
    for d, ws in toks.items():
        if not ws:
            continue
        lp = 0.0
        for i, w in enumerate(ws):
            pu = (uni[w] + 1) / (n_total + n_vocab + 1)
            if i == 0:
                p = pu
            else:
                cb = bi.get((ws[i - 1], w), 0)
                pb = cb / uni[ws[i - 1]] if cb else 0.0
                p = lam * pb + (1 - lam) * pu
            lp += math.log(p)
        out[d] = math.exp(-(lp / len(ws)))
    return out


def test_lm_memo_distinguishes_in_memory_corpora(spark):
    """ADVICE r11 high: corpus B scored after corpus A must be scored
    against B's OWN model, not A's cached one."""
    _clear_memo()
    a_texts = {1: "the cat sat on the mat", 2: "the dog sat on the rug"}
    b_texts = {1: "zulu yankee xray walrus", 2: "zulu zulu zulu zulu"}
    mk = lambda t: spark.createDataFrame(  # noqa: E731
        list(t.items()), "doc_id long, text string"
    )
    lm_doc_scores(mk(a_texts)).collect()  # primes the memo with A's model
    got_b = {r["doc_id"]: r["ppl"] for r in lm_doc_scores(mk(b_texts)).collect()}
    ref_b = _py_ppl(b_texts)
    for d, ppl in ref_b.items():
        assert abs(got_b[d] - ppl) < 1e-9, (
            f"doc {d}: scored {got_b[d]} vs self-trained {ppl} — "
            "B was scored against a stale cached model"
        )
    _clear_memo()


def test_two_corpora_coexist_without_thrash(spark):
    """ADVICE r11 low: alternating corpora must occupy separate memo
    slots (same persisted frame served again), not rebuild one slot."""
    _clear_memo()
    a = spark.createDataFrame([(1, "aa bb aa bb")], "doc_id long, text string")
    b = spark.createDataFrame([(1, "cc dd cc dd")], "doc_id long, text string")
    lm_doc_scores(a).collect()
    lm_doc_scores(b).collect()
    n_after_both = len(similarity._PERSISTED)
    frames = {k: v[1] for k, v in similarity._PERSISTED.items()}
    lm_doc_scores(a).collect()  # must hit, not evict B's slots
    assert len(similarity._PERSISTED) == n_after_both
    for k, df in frames.items():
        assert similarity._PERSISTED[k][1] is df, f"slot {k} was rebuilt"
    _clear_memo()


def test_memo_misses_on_source_overwrite(spark, tmp_path):
    """VERDICT r11 item 9: overwriting a source table in-session must
    miss the memo (new file listing -> rebuild), never serve the old
    rows."""
    _clear_memo()
    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copy(f"{SF_SMOKE}/documents.parquet", sf / "documents.parquet")
    src = str(sf)
    docs1 = spark.read.parquet(f"{src}/documents.parquet")
    built = []

    def build_from(df):
        def _b():
            out = df.groupBy().agg(F.count("*").alias("n"))
            built.append(out)
            return out

        return _b

    v1 = (similarity._frame_files(docs1),)
    r1 = similarity._persisted(spark, ("memo_probe", src), v1, build_from(docs1))
    r1.collect()
    assert len(built) == 1
    # same variant -> hit, no rebuild
    similarity._persisted(spark, ("memo_probe", src), v1, build_from(docs1))
    assert len(built) == 1
    # overwrite the table in-session: fewer rows, new part files
    sub = docs1.limit(3)
    sub.write.mode("overwrite").parquet(str(tmp_path / "tmp_out"))
    (sf / "documents.parquet").unlink()
    shutil.copytree(tmp_path / "tmp_out", sf / "documents.parquet")
    docs2 = spark.read.parquet(f"{src}/documents.parquet")
    v2 = (similarity._frame_files(docs2),)
    assert v2 != v1, "file listing did not change on overwrite"
    r2 = similarity._persisted(spark, ("memo_probe", src), v2, build_from(docs2))
    assert len(built) == 2, "memo served a stale frame after overwrite"
    assert r2.collect()[0]["n"] == 3
    _clear_memo()


def test_frame_identity_separates_same_file_transforms(spark):
    """Two frames over the SAME files but different plans (the other
    collision inputFiles() cannot see) must get different identities."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    assert similarity._frame_files(docs) == similarity._frame_files(half)
    assert similarity._frame_identity(docs) != similarity._frame_identity(half)
