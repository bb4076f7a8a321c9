"""Dataloader hand-off (operators/dataloader.py): mixture-plan
apportionment invariants (budget exactly consumed, temperature
weighting direction, epochs consistency) and shuffle-manifest
invariants (complete coverage of the bins table, contiguous per-reader
positions, seed determinism and seed sensitivity). Oracle parity runs
in tests/test_oracle_parity.py like every registered pair."""

from __future__ import annotations

import numpy as np

from cc_mapreducer_spark.operators.dataloader import (
    BUDGET_DEN,
    BUDGET_NUM,
    N_READERS,
    SHUFFLE_SEED,
    context_shuffle_manifest,
    corpus_mixture_plan,
)
from cc_mapreducer_spark.operators.seqprep import sequence_pack_bins

SF_ORACLE = "/root/testdata/sf0.01"


def test_mixture_consumes_budget_exactly(spark):
    mix = corpus_mixture_plan(spark, SF_ORACLE).toPandas()
    budget = mix.available_tokens.sum() * BUDGET_NUM // BUDGET_DEN
    assert mix.target_tokens.sum() == budget  # largest-remainder is exact
    # every source gets floor(quota) or floor(quota)+1
    w_tot = mix.weight.sum()
    base = budget * mix.weight // w_tot
    assert ((mix.target_tokens - base).isin([0, 1])).all()
    assert (mix.epochs == mix.target_tokens / mix.available_tokens).all()


def test_mixture_temperature_flattens(spark):
    """alpha=0.5 upweights small sources: the consumed FRACTION
    (epochs) trends down with available tokens. isqrt's integer steps
    (weight jumps 34->35->36 at thresholds) break LOCAL monotonicity by
    up to ~1/weight, so the invariant is aggregate: the smaller half of
    sources is consumed at a strictly higher rate than the larger half,
    and the extremes order strictly."""
    mix = (
        corpus_mixture_plan(spark, SF_ORACLE)
        .toPandas()
        .sort_values("available_tokens")
        .reset_index(drop=True)
    )
    half = len(mix) // 2
    assert mix.epochs.iloc[:half].mean() > mix.epochs.iloc[half:].mean()
    assert mix.epochs.iloc[0] > mix.epochs.iloc[-1]
    # and the direction never inverts by more than one isqrt step
    eps = 1.0 / mix.weight.min()
    assert (np.diff(mix.epochs.values) <= eps).all()


def test_manifest_covers_every_context_once(spark):
    bins = sequence_pack_bins(spark, SF_ORACLE).toPandas()
    man = context_shuffle_manifest(spark, SF_ORACLE).toPandas()
    assert len(man) == len(bins)
    key = ["source", "shard", "bin"]
    assert (
        man[key].sort_values(key).reset_index(drop=True)
        == bins[key].sort_values(key).reset_index(drop=True)
    ).all().all()
    assert man.reader.between(0, N_READERS - 1).all()
    # per-reader positions are 1..n contiguous
    for r, grp in man.groupby("reader"):
        assert sorted(grp.pos) == list(range(1, len(grp) + 1)), r


def test_manifest_deterministic_and_seed_sensitive(spark):
    a = context_shuffle_manifest(spark, SF_ORACLE).toPandas()
    b = context_shuffle_manifest(spark, SF_ORACLE).toPandas()
    key = ["source", "shard", "bin"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert (a == b).all().all()  # same seed -> identical manifest
    # a different seed must reshuffle: recompute reader with seed 'r11'
    import hashlib

    def reader_of(seed, row):
        h = hashlib.md5(
            f"{seed}|{row.source}|{row.shard}|{row.bin}".encode()
        ).hexdigest()
        return int(h[:8], 16) % N_READERS

    moved = sum(
        reader_of(SHUFFLE_SEED + "x", row) != row.reader
        for row in a.itertuples()
    )
    assert moved > 0
    # and the python md5 derivation reproduces the engine's assignment
    # (the ACTUAL seed constant, not a literal — bumping the epoch seed
    # must not break this half, only the sensitivity half above)
    assert all(
        reader_of(SHUFFLE_SEED, row) == row.reader for row in a.itertuples()
    )


def test_sample_apportions_target_over_shards(spark):
    from cc_mapreducer_spark.operators.dataloader import (
        mixture_context_sample,
    )
    from cc_mapreducer_spark.operators.seqprep import (
        CONTEXT_LEN,
        N_PACK_SHARDS,
    )

    mix = corpus_mixture_plan(spark, SF_ORACLE).toPandas()
    samp = mixture_context_sample(spark, SF_ORACLE).toPandas()
    assert (samp.picked_contexts <= samp.available_contexts).all()
    assert (samp.sampled_tokens <= samp.picked_contexts * CONTEXT_LEN).all()
    assert ((samp.sampled_tokens > 0) == (samp.picked_contexts > 0)).all()
    per_src = samp.groupby("source").agg(
        picked=("picked_contexts", "sum"),
        avail=("available_contexts", "sum"),
    )
    tgt = mix.set_index("source").target_contexts
    for src, row in per_src.iterrows():
        want = min(tgt[src], row.avail)
        # largest-remainder + per-shard least() can undershoot by at
        # most the number of saturated shards
        assert want >= row.picked >= want - N_PACK_SHARDS, src
