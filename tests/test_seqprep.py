"""Sequence prep (operators/seqprep.py): packing invariants (every
context except each STREAM's tail is exactly full; token conservation;
per-source rollup over shard streams), window chunking invariants (full
coverage, correct overlap), a hand-computed golden on a planted stream,
and the scale-shape plan assertion (the packing window partitions by
(source, shard), never source alone — the r9 verdict's named
scale-killer). Oracle parity runs in tests/test_oracle_parity.py like
every registered pair."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_mapreducer_spark.operators.seqprep import (
    CONTEXT_LEN,
    N_PACK_SHARDS,
    WINDOW_LEN,
    WINDOW_STRIDE,
    doc_window_chunks,
    sequence_pack_bins,
    sequence_pack_summary,
)

SF_ORACLE = "/root/testdata/sf0.01"


def test_every_non_tail_context_is_full(spark):
    bins = sequence_pack_bins(spark, SF_ORACLE).toPandas()
    last = bins.groupby(["source", "shard"])["bin"].transform("max")
    non_tail = bins[bins["bin"] < last]
    assert (non_tail.fill_tokens == CONTEXT_LEN).all()
    tail = bins[bins["bin"] == last]
    assert (tail.fill_tokens <= CONTEXT_LEN).all()


def test_packing_conserves_tokens(spark):
    from cc_mapreducer_spark.operators.seqprep import _SPARK_NTOK
    from cc_mapreducer_spark.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents").select(
        "source", F.expr(_SPARK_NTOK).cast("long").alias("n")
    )
    expected = {
        r.source: r.total
        for r in docs.groupBy("source")
        .agg((F.sum("n") + F.count("*")).alias("total"))  # tokens + EOS each
        .collect()
    }
    got = {
        r.source: r.total_tokens
        for r in sequence_pack_summary(spark, SF_ORACLE).collect()
    }
    assert got == expected


def test_bins_are_contiguous_from_zero_per_stream(spark):
    bins = sequence_pack_bins(spark, SF_ORACLE).toPandas()
    assert bins.shard.between(0, N_PACK_SHARDS - 1).all()
    for (src, shard), grp in bins.groupby(["source", "shard"]):
        got = sorted(grp.bin)
        assert got == list(range(len(got))), (src, shard)


def test_summary_rolls_up_shard_streams(spark):
    """Per-source summary = exact aggregate of the per-(source, shard)
    bin rows: contexts = bin count, padding = sum of per-bin slack
    (only stream tails have slack, checked above)."""
    bins = sequence_pack_bins(spark, SF_ORACLE).toPandas()
    summ = sequence_pack_summary(spark, SF_ORACLE).toPandas()
    by_src = bins.groupby("source").agg(
        n_contexts=("bin", "size"),
        total_tokens=("fill_tokens", "sum"),
        fragmented_docs=("n_crossers", "sum"),
    )
    for r in summ.itertuples():
        row = by_src.loc[r.source]
        assert r.n_contexts == row.n_contexts
        assert r.total_tokens == row.total_tokens
        assert r.fragmented_docs == row.fragmented_docs
        assert (
            r.padding_tokens == r.n_contexts * CONTEXT_LEN - r.total_tokens
        )


def test_pack_window_partitions_by_source_and_shard(spark):
    """Scale-shape assertion (r9 verdict 'What's wrong' #1): the packing
    cumsum's window partition key must include the shard — a window
    partitioned by source alone sorts each WHOLE source on one task.
    Checked in the physical plan's Window node, not the code."""
    from cc_mapreducer_spark.plans.inspect import formatted_plan

    plan = formatted_plan(sequence_pack_bins(spark, SF_ORACLE))
    window_args = [
        line
        for line in plan.splitlines()
        if "windowspecdefinition(" in line
    ]
    assert window_args, "no Window node found in the packing plan"
    for line in window_args:
        spec = line.split("windowspecdefinition(", 1)[1]
        assert "shard" in spec.split("ASC", 1)[0], (
            "packing window partitions by source alone:\n" + line
        )


def test_window_chunks_cover_and_overlap(spark):
    ch = doc_window_chunks(spark, SF_ORACLE).toPandas()
    # coverage: last chunk ends exactly at n; chunks start at i*stride
    for doc, grp in ch.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx")
        assert list(grp.start_tok) == [
            i * WINDOW_STRIDE for i in range(len(grp))
        ]
        ends = grp.start_tok + grp.chunk_len
        n = ends.iloc[-1]
        assert (ends <= n).all()
        # every token covered: next start <= previous end
        assert (grp.start_tok.iloc[1:].values <= ends.iloc[:-1].values).all()
    # interior overlaps equal WINDOW_LEN - WINDOW_STRIDE whenever the
    # previous window was full
    interior = ch[(ch.chunk_idx > 0)]
    full_prev = interior[
        interior.start_tok - WINDOW_STRIDE + WINDOW_LEN
        <= interior.start_tok + interior.chunk_len
    ]
    assert (
        full_prev[full_prev.chunk_len == WINDOW_LEN].overlap_prev
        == WINDOW_LEN - WINDOW_STRIDE
    ).all()


def test_planted_stream_golden(spark):
    """Three docs of 100/300/50 tokens at L=256, ids chosen so all
    three land in the SAME md5 shard (verified below): the stream is
    doc order, spans [0,101), [101,402) crossing the bin-0/1 boundary,
    [402,453) in bin 1; two contexts, tail fill 453-256=197. Mirrors
    _doc_spans' (source, shard) window exactly."""
    import hashlib

    import cc_mapreducer_spark.operators.seqprep as sp
    from pyspark.sql import Window

    def shard_of(doc_id: int) -> int:
        return (
            int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
            % sp.N_PACK_SHARDS
        )

    # first three ids sharing a shard, in ascending order
    ids, want = [], None
    for i in range(1000):
        s = shard_of(i)
        if want is None or s == want:
            want = s if want is None else want
            if s == want:
                ids.append(i)
        if len(ids) == 3:
            break
    assert len(ids) == 3

    df = spark.createDataFrame(
        [("s", ids[0], " ".join(["tok"] * 100)),
         ("s", ids[1], " ".join(["tok"] * 300)),
         ("s", ids[2], " ".join(["tok"] * 50))],
        "source string, doc_id long, text string",
    )
    w = (
        Window.partitionBy("source", "shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    docs = df.select(
        "source",
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                16, 10,
            ).cast("long") % sp.N_PACK_SHARDS
        ).alias("shard"),
        "doc_id",
        F.expr(sp._SPARK_NTOK).cast("long").alias("n_tokens"),
    ).select(
        "source", "shard", "doc_id", "n_tokens",
        F.coalesce(F.sum(F.col("n_tokens") + 1).over(w), F.lit(0)).alias("start"),
    ).withColumn("end", F.col("start") + F.col("n_tokens") + 1)
    rows = {r.doc_id: (r.shard, r.start, r.end) for r in docs.collect()}
    assert rows == {
        ids[0]: (want, 0, 101),
        ids[1]: (want, 101, 402),
        ids[2]: (want, 402, 453),
    }


def test_sharding_actually_splits_sources(spark):
    """The fixture must exercise multi-shard rollup: every source with
    >= N_PACK_SHARDS docs occupies all N_PACK_SHARDS streams."""
    bins = sequence_pack_bins(spark, SF_ORACLE).toPandas()
    shards_per_src = bins.groupby("source")["shard"].nunique()
    assert (shards_per_src == N_PACK_SHARDS).all()


def test_ffd_invariants_and_tradeoff(spark):
    """FFD packing: geometry (used + padding == bins * L), optimality
    bounds (ceil(tokens/L) <= bins <= docs), first-fit correctness via
    oracle parity, and the tradeoff vs concat-chunk: with no
    truncations (fixture docs all fit a context), FFD can never pad
    LESS than concat-chunk's tail-only padding."""
    import numpy as np

    from cc_mapreducer_spark.operators.seqprep import (
        packing_strategy_compare,
        sequence_pack_bestfit,
    )

    bf = sequence_pack_bestfit(spark, SF_ORACLE).toPandas()
    assert (
        bf.used_tokens + bf.padding_tokens == bf.n_bins * CONTEXT_LEN
    ).all()
    assert (bf.n_bins >= np.ceil(bf.used_tokens / CONTEXT_LEN)).all()
    assert (bf.n_bins <= bf.n_docs).all()
    assert (bf.truncated_docs == 0).all()  # fixture docs all fit

    cmp_ = packing_strategy_compare(spark, SF_ORACLE).toPandas()
    assert (cmp_.ffd_truncated_tokens == 0).all()
    assert (cmp_.ffd_padding_tokens >= cmp_.cc_padding_tokens).all()
    assert (cmp_.cc_fragmented_docs > 0).any()  # the tradeoff is real
    assert (cmp_.ffd_bins >= cmp_.cc_contexts).all()


def test_ffd_planted_golden_and_truncation(spark, tmp_path):
    """Planted stream: sizes (incl. EOS) 200/150/100/90/60 at L=256 pack
    first-fit-decreasing into [200+?, ...] = bins (200, 150+100, 90+60)
    -> 3 bins, fills 200/250/150; a 300-token doc is truncated to 256
    and accounted."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cc_mapreducer_spark.operators.seqprep import sequence_pack_bestfit

    sizes = [199, 149, 99, 89, 59, 300]  # +1 EOS each; last truncates
    t = pa.table(
        {
            "doc_id": pa.array(range(len(sizes)), pa.int64()),
            "text": pa.array([" ".join(["tok"] * n) for n in sizes]),
            "source": pa.array(["s"] * len(sizes)),
        }
    )
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    bf = sequence_pack_bestfit(spark, str(tmp_path)).toPandas()
    assert bf.truncated_docs.sum() == 1
    assert bf.truncated_tokens.sum() == 300 + 1 - CONTEXT_LEN
    # geometry still conserves post-truncation
    assert (
        bf.used_tokens + bf.padding_tokens == bf.n_bins * CONTEXT_LEN
    ).all()
    assert bf.used_tokens.sum() == sum(min(n + 1, CONTEXT_LEN) for n in sizes)
