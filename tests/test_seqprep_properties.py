"""Property tests (hypothesis) for the packing family's pure
arithmetic: the closed-form concat-chunk span math and the greedy FFD
fold are re-implemented here as plain-python reference recipes and
checked against the operators on randomized corpora written to parquet.
Properties, not goldens: conservation, bin geometry, FFD's classical
guarantees (never beats the LP lower bound, never worse than
2x optimal + 1 bin — the loose-but-always-true bound), and
shard-rollup consistency. One Spark round-trip per example is slow, so
examples are few and sizes small; the arithmetic itself is also
property-tested pure-python with many examples."""

from __future__ import annotations

import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover - baked into the container
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from cc_mapreducer_spark.operators.seqprep import (
    CONTEXT_LEN,
    N_PACK_SHARDS,
)


def _shard_of(doc_id: int) -> int:
    return (
        int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
        % N_PACK_SHARDS
    )


def _ffd_reference(sizes: list[int], cap: int) -> list[int]:
    """Plain first-fit-decreasing over pre-truncated sizes."""
    fills: list[int] = []
    for s in sorted(sizes, reverse=True):
        for i, f in enumerate(fills):
            if f + s <= cap:
                fills[i] = f + s
                break
        else:
            fills.append(s)
    return fills


def _concat_bins(sizes: list[int], cap: int) -> list[int]:
    """Concat-then-chunk fills for one stream (sizes include EOS)."""
    total = sum(sizes)
    n = math.ceil(total / cap) if total else 0
    return [cap] * (n - 1) + [total - (n - 1) * cap] if n else []


# -- pure-arithmetic properties: many examples, no Spark ------------------


@given(st.lists(st.integers(min_value=1, max_value=CONTEXT_LEN), max_size=60))
@settings(max_examples=300, deadline=None)
def test_ffd_reference_bounds(sizes):
    fills = _ffd_reference(sizes, CONTEXT_LEN)
    total = sum(sizes)
    lower = math.ceil(total / CONTEXT_LEN)
    assert sum(fills) == total  # conservation
    assert all(0 < f <= CONTEXT_LEN for f in fills)
    assert len(fills) >= lower
    # FFD <= 2*OPT + 1 via OPT >= lower (loose classical bound)
    assert len(fills) <= 2 * lower + 1 if total else fills == []
    # first-fit never leaves two bins that could merge... not true for
    # first-fit in general, but NO TWO bins can both be <= cap/2 except
    # the last-opened one (any later item fitting a half-empty bin would
    # have been placed there)
    small = [f for f in fills[:-1] if f <= CONTEXT_LEN // 2]
    assert len(small) <= 1


@given(st.lists(st.integers(min_value=0, max_value=400), max_size=60))
@settings(max_examples=300, deadline=None)
def test_concat_chunk_reference_geometry(ns):
    sizes = [n + 1 for n in ns]  # +EOS, the stream arithmetic's input
    fills = _concat_bins(sizes, CONTEXT_LEN)
    assert sum(fills) == sum(sizes)
    assert all(f == CONTEXT_LEN for f in fills[:-1])
    if fills:
        assert 0 < fills[-1] <= CONTEXT_LEN
    # concat-chunk is padding-optimal: bin count equals the LP bound
    assert len(fills) == math.ceil(sum(sizes) / CONTEXT_LEN)


# -- one randomized corpus through the real operators ---------------------


@given(
    st.lists(
        st.integers(min_value=0, max_value=350),
        min_size=1,
        max_size=40,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_operators_match_reference_recipes(spark, tmp_path_factory, ns):
    from cc_mapreducer_spark.operators.seqprep import (
        sequence_pack_bestfit,
        sequence_pack_summary,
    )

    d = tmp_path_factory.mktemp("prop")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(ns)), pa.int64()),
            "text": pa.array([" ".join(["tok"] * n) for n in ns]),
            "source": pa.array(["s"] * len(ns)),
        }
    )
    pq.write_table(t, f"{d}/documents.parquet")

    # concat-chunk: per-shard streams in doc_id order
    streams: dict[int, list[int]] = {}
    for i, n in enumerate(ns):
        streams.setdefault(_shard_of(i), []).append(n + 1)
    want_contexts = sum(
        len(_concat_bins(sz, CONTEXT_LEN)) for sz in streams.values()
    )
    summ = sequence_pack_summary(spark, str(d)).toPandas()
    assert summ.n_contexts.sum() == want_contexts
    assert summ.total_tokens.sum() == sum(n + 1 for n in ns)

    # FFD: per-shard truncated sizes through the reference fold
    bf = sequence_pack_bestfit(spark, str(d)).toPandas()
    for shard, sz in streams.items():
        fills = _ffd_reference(
            [min(s, CONTEXT_LEN) for s in sz], CONTEXT_LEN
        )
        row = bf[bf.shard == shard]
        assert int(row.n_bins.iloc[0]) == len(fills), (shard, sz)
        assert int(row.used_tokens.iloc[0]) == sum(fills)
