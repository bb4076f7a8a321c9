"""BM25 search: ranking properties on planted corpora + plan shape.
Oracle parity runs in test_oracle_parity.py (bm25_search)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from cc_mapreducer_spark.operators.search import bm25_search
from cc_mapreducer_spark.plans.inspect import formatted_plan
from tests.conftest import SF_ORACLE


def _write_docs(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["t"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_tf_saturation_and_length_normalization(spark, tmp_path):
    # corpus where 'zebra' is the (only) frequent term; the short doc
    # with a high zebra density must beat the long diluted one, and a
    # doc without the term scores 0 matches
    # 'zebra' is the only repeated word, so it is the top query term;
    # fillers are DISTINCT singletons (repeating them would outvote
    # zebra in the frequency-derived term list). The top-3 terms are
    # zebra + the two alphabetically-first singletons (lion, w000), so
    # doc 2's words are chosen to sort AFTER every filler — it matches
    # no query term and must be absent from the result entirely.
    filler = " ".join(f"w{i:03d}" for i in range(120))
    sf = _write_docs(
        tmp_path,
        [
            "zebra zebra zebra lion",   # dense, short
            "zebra " + filler,          # diluted, long
            "xxx yyy zzz",              # sorts after fillers: no query terms
        ],
    )
    rows = {r["doc_id"]: r for r in bm25_search(spark, sf).collect()}
    assert rows[0]["score"] > rows[1]["score"]
    assert 2 not in rows  # zero matched terms -> not returned at all
    assert all(r["n_matched"] >= 1 for r in rows.values())


def test_rank_is_dense_and_deterministic(spark):
    a = [(r["rank"], r["doc_id"]) for r in bm25_search(spark, SF_ORACLE).collect()]
    b = [(r["rank"], r["doc_id"]) for r in bm25_search(spark, SF_ORACLE).collect()]
    assert a == b
    assert [r for r, _ in a] == list(range(1, len(a) + 1))


def test_term_and_stats_tables_broadcast(spark):
    plan = formatted_plan(bm25_search(spark, SF_ORACLE))
    # the 3-row query-term table, df and the 1-row stats must broadcast;
    # only the word-stream aggregations shuffle
    assert plan.count("BroadcastExchange") >= 2


def test_no_unpartitioned_window_over_unbounded_input(spark):
    # both global orderings (query-term top-N over the vocabulary, final
    # top-k over scored docs) must plan as TakeOrderedAndProject; the only
    # Window nodes allowed are the rank passes over the already-limited
    # (<= max(_N_TERMS, _TOPK)-row) results — i.e. every Window sits above
    # a GlobalLimit/TakeOrdered, never directly over a corpus-sized input.
    from cc_mapreducer_spark.operators.search import hybrid_search_rrf

    for q in (bm25_search, hybrid_search_rrf):
        plan = formatted_plan(q(spark, SF_ORACLE))
        assert plan.count("TakeOrderedAndProject") >= 2, q.__name__
        n_windows = sum(
            1
            for line in plan.splitlines()
            if line.strip().split(" ", 1)[-1] == "Window"
            and line.strip().startswith("(")
        )
        n_limits = plan.count("TakeOrderedAndProject") + plan.count(
            "GlobalLimit"
        )
        assert n_windows <= n_limits, (
            f"{q.__name__}: {n_windows} Window nodes vs {n_limits} "
            "limited inputs — a Window is running over an unbounded input"
        )


def test_tfidf_keywords_pick_distinctive_terms(spark, tmp_path):
    # 'whale' is unique to doc 0; 'the' appears in every doc and must be
    # down-weighted below it despite equal tf
    from cc_mapreducer_spark.operators.search import tfidf_doc_keywords

    sf = _write_docs(
        tmp_path,
        [
            "the whale the whale",
            "the cat the cat",
            "the dog the dog",
        ],
    )
    rows = tfidf_doc_keywords(spark, sf).collect()
    top = {r["doc_id"]: r["word"] for r in rows if r["rank"] == 1}
    assert top == {0: "whale", 1: "cat", 2: "dog"}
    # scores are tf * (ln((N+1)/(df+1)) + 1): for the unique words
    # tf=2, df=1, N=3 -> 2 * (ln(2) + 1)
    import math

    whale = [r for r in rows if r["word"] == "whale"][0]
    assert whale["tf"] == 2
    assert abs(whale["score"] - round(2 * (math.log(2.0) + 1), 6)) < 1e-9


def test_tfidf_topk_window_is_doc_partitioned(spark):
    # the only Window may partition by doc_id — no vocabulary- or
    # corpus-sized single-partition sorts anywhere in the plan
    from cc_mapreducer_spark.operators.search import tfidf_doc_keywords

    plan = formatted_plan(tfidf_doc_keywords(spark, SF_ORACLE))
    specs = [
        line
        for line in plan.splitlines()
        if "windowspecdefinition" in line.lower()
    ]
    assert specs, "expected a Window node in the tfidf plan"
    for line in specs:
        assert "doc_id" in line, f"Window not partitioned by doc_id: {line}"
