"""Empty-input robustness: every operator family must return an empty
result with its normal schema on empty tables — not crash. (The probe
that produced this test found two real crashes: np.stack over an empty
query block and a divide-by-zero in PageRank's uniform init.)"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cc_mapreducer_spark import registry

REPRESENTATIVES = [
    "word_profile",              # tokenizer/anagram family
    "exact_dedup",
    "near_dedup_pairs",          # MinHash + ngram
    "simhash_near_pairs",
    "shared_passages",           # winnowing
    "fuzzy_word_pairs",          # FastSS
    "bm25_search",               # lexical search (empty term table)
    "similarity_topk_bruteforce",  # empty query block
    "similarity_topk_signlsh",
    "near_dup_embeddings",
    "semantic_dedup_embeddings",
    "text_profile",
    "document_chunks",
    "cdc_snapshot",
    "scd2_history",
    "event_anomalies",
    "event_sessionize",
    "cohort_retention",
    "item_pagerank",             # zero-node graph
    "bpe_token_stats",           # nothing to train on
    "duplicate_clusters",
    "lm_perplexity",
    # round 4
    "bloom_gate_new_docs",       # empty corpus AND empty batch
    "canonical_docs",            # empty cluster + quality join
    "leakage_safe_split",
    "similarity_topk_ivfpq",     # empty query block before any training
    "ann_recall_digest",         # guard must fire before pq_train
    "heavy_hitter_words",        # empty token stream -> empty, not 0-div
    "media_codec_stats",         # nothing to encode -> empty, stable schema
    "media_thumbnails",
    # round 4, session 4
    "cms_word_counts",           # empty stream -> empty contract table
    "tfidf_doc_keywords",        # n_docs=0 guard
    "quality_classifier_scores", # frozen scorer over zero rows
    "classifier_calibration_bins",
    "contrastive_negatives",     # n_docs=0 guard
    "kmeans_cluster_sizes",      # empty embeddings -> no centroids
    "char_entropy_profile",
    # round 5
    "repeated_spans",            # empty corpus -> no windows
    "span_dup_coverage",         # empty doc domain, islands over nothing
    "jpeg_codec_stats",          # nothing to encode -> empty, stable schema
]


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
                "label": pa.array([], pa.int32()),
            }
        ),
        f"{d}/embeddings.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
                "props": pa.array([], pa.string()),
            }
        ),
        f"{d}/events.parquet",
    )
    return d


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_empty_corpus_returns_empty_not_crash(spark, empty_sf, name):
    df = registry.all_queries()[name](spark, empty_sf)
    assert df.columns  # schema intact
    assert df.count() == 0
