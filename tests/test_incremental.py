"""Incremental dedup + quantization + idempotent streaming sink."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.embeddings import dequantize, quantize_int8
from cc_mapreducer_spark.operators.incremental import (
    build_minhash_index,
    incremental_near_dups,
)
from cc_mapreducer_spark.tables import load_table
from tests.conftest import SF_ORACLE
from tests.oracle import compare_frames, duckdb_connection


def test_incremental_matches_batch_cross_pairs(spark, tmp_path):
    """Index docs < 400, ingest docs >= 400: the incremental result must
    equal the batch LSH candidates restricted to (corpus, new) pairs,
    with the same minhash-agreement estimate computed from the batch
    side's signatures."""
    from cc_mapreducer_spark.operators.dedup import _K, shingle_sets

    idx_path = str(tmp_path / "mh_index")
    build_minhash_index(spark, SF_ORACLE, idx_path, max_doc_id=400)
    got = {
        (r.corpus_doc, r.new_doc): r.est_jaccard
        for r in incremental_near_dups(spark, SF_ORACLE, idx_path, 400, threshold=0.5).collect()
    }

    # independent reference: full-corpus minhashes, banded candidates,
    # agreement estimate — restricted to corpus x new
    sets = shingle_sets(spark, SF_ORACLE).filter(F.size("ss") > 0)
    sh = sets.select("doc_id", F.explode("ss").alias("s"))
    mh = sh.groupBy("doc_id").agg(
        *[F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"m{i}") for i in range(_K)]
    )
    rows = {r.doc_id: [r[f"m{i}"] for i in range(_K)] for r in mh.collect()}
    bands = {}
    for doc, ms in rows.items():
        for bi, band_rows in enumerate([(0, 1, 2, 3), (4, 5, 6, 7)]):
            bands.setdefault((bi, "".join(ms[r] for r in band_rows)), []).append(doc)
    expected = {}
    for (_, _), docs in bands.items():
        for a in docs:
            for b in docs:
                if a < 400 <= b:
                    est = sum(1 for i in range(_K) if rows[a][i] == rows[b][i]) / _K
                    if est >= 0.5:
                        expected[(a, b)] = est
    assert got == expected
    assert expected, "fixture corpus should have cross-batch near-dups"


def test_quantize_int8_parity_and_error(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    out = quantize_int8(emb)
    con = duckdb_connection(SF_ORACLE)
    oracle = con.sql(
        """
        WITH s AS (
            SELECT vec_id, embedding,
                   CAST(list_max([abs(x) for x in embedding]) AS DOUBLE)
                     / CAST(127.0 AS DOUBLE) AS scale
            FROM embeddings
        )
        SELECT vec_id, CAST(scale AS DOUBLE) AS scale,
               CASE WHEN scale > 0
                    THEN [CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS TINYINT) for x in embedding]
                    ELSE [CAST(0 AS TINYINT) for x in embedding] END AS q
        FROM s
        """
    ).df()
    compare_frames(out.toPandas(), oracle, "quantize_int8")

    # reconstruction error bound: |x - q*scale| <= scale/2 per coordinate
    joined = (
        dequantize(out)
        .withColumnRenamed("embedding", "deq")
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .select(
            "vec_id",
            F.expr(
                "aggregate(zip_with(embedding, deq, (a, b) -> abs(cast(a as double) - b)),"
                " 0D, (acc, v) -> greatest(acc, v))"
            ).alias("max_err"),
            F.array_max(F.transform("embedding", lambda x: F.abs(x))).alias("mx"),
        )
        .collect()
    )
    for r in joined:
        bound = (r.mx / 127.0) / 2 + 1e-12
        assert r.max_err <= bound, (r.vec_id, r.max_err, bound)


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert rows[0].scale == 0.0 and rows[0].q == [0, 0, 0]
    assert rows[1].q[1] in (-127, -126)  # max-magnitude coordinate maps near ±127
    assert not math.isnan(rows[1].scale)


def test_foreach_batch_sink_idempotent(spark, tmp_path):
    from cc_mapreducer_spark.streaming.events import stream_events_to_partitioned_parquet

    out = str(tmp_path / "events_by_date")
    n_events = load_table(spark, SF_ORACLE, "events").count()
    stream_events_to_partitioned_parquet(spark, SF_ORACLE, out, str(tmp_path / "ckpt1"))
    first = spark.read.parquet(out).count()
    # replay with a FRESH checkpoint (simulates full re-processing after
    # losing sink-side progress): dynamic partition overwrite must
    # converge, not append
    stream_events_to_partitioned_parquet(spark, SF_ORACLE, out, str(tmp_path / "ckpt2"))
    second = spark.read.parquet(out).count()
    assert first == n_events
    assert second == n_events
    dupes = (
        spark.read.parquet(out)
        .groupBy("event_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0


def test_embedding_norm_outliers_parity(spark):
    from cc_mapreducer_spark.operators.embeddings import embedding_norm_outliers

    emb = load_table(spark, SF_ORACLE, "embeddings")
    out = embedding_norm_outliers(emb)
    con = duckdb_connection(SF_ORACLE)  # keep alive until .df()
    oracle = con.sql(
        """
        WITH n AS (
            SELECT vec_id,
                   sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding]))
                     AS norm
            FROM embeddings
        ), b AS (
            SELECT quantile_cont(norm, 0.01) AS lo, quantile_cont(norm, 0.99) AS hi FROM n
        )
        SELECT vec_id, norm, (norm < lo OR norm > hi) AS is_outlier FROM n CROSS JOIN b
        """
    ).df()
    compare_frames(out.toPandas(), oracle, "embedding_norm_outliers")
    flagged = out.filter("is_outlier").count()
    total = out.count()
    # quantile gate must flag ~2% of a continuous-norm corpus
    assert 0 < flagged <= int(total * 0.03)


def test_incremental_embedding_near_dups_match_batch_cross_pairs(spark):
    """The incremental ANN probe must find exactly the batch path's
    (corpus x new) near-dup pairs when the index is bucketed at the full
    corpus width — same planes, width, threshold, and cosine rounding."""
    import tempfile

    from cc_mapreducer_spark.operators.incremental import (
        build_signlsh_index,
        incremental_embedding_near_dups,
    )
    from cc_mapreducer_spark.operators.similarity import embedding_near_dup_pairs
    from cc_mapreducer_spark.tables import load_table

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    n_total = emb.count()
    split = 400  # corpus: vec_id < 400; new batch: the rest

    with tempfile.TemporaryDirectory() as d:
        idx = f"{d}/signlsh_idx"
        nbits = build_signlsh_index(spark, sf, idx, n_rows=n_total, max_vec_id=split)
        inc = {
            (r.corpus_vec, r.new_vec, r.cosine)
            for r in incremental_embedding_near_dups(spark, sf, idx, nbits, split).collect()
        }
    batch_cross = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in embedding_near_dup_pairs(emb, n_rows=n_total).collect()
        if r.vec_a < split <= r.vec_b
    }
    assert inc == batch_cross
    assert len(inc) > 0
