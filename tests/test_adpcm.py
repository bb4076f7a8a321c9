"""IMA ADPCM codec (functions/adpcm_codec.py): known-vector pins against
the IMA reference step walk, integer-exact determinism, block-boundary
state restart, container rejection, and the Spark round-trip query."""

from __future__ import annotations

import numpy as np
import pytest

from cc_mapreducer_spark.functions.adpcm_codec import (
    INDEX_TABLE,
    STEP_TABLE,
    _decode_nibble,
    _encode_sample,
    decode_ima_adpcm,
    encode_ima_adpcm,
)

SF_ORACLE = "/root/testdata/sf0.01"


def test_tables_are_the_ima_constants():
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[88] == 32767
    # the table is the fixed exponential-ish walk: strictly increasing
    assert all(a < b for a, b in zip(STEP_TABLE, STEP_TABLE[1:]))
    assert INDEX_TABLE == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_encode_decode_nibble_lockstep():
    """The encoder's on-the-fly reconstruction must equal the decoder's
    — the property that keeps both predictors in sync — across the
    whole (code, index) space."""
    for index in (0, 5, 44, 88):
        for sample in (-32768, -1000, -3, 0, 3, 1000, 32767):
            code, pred_e, idx_e = _encode_sample(sample, 0, index)
            pred_d, idx_d = _decode_nibble(code, 0, index)
            assert (pred_e, idx_e) == (pred_d, idx_d), (sample, index)


def test_known_vector_pin():
    """A hand-checkable start: pred=0, index=0 (step 7). Sample 100 is
    far above step*2, so the code saturates at |7|: diffq =
    7>>3 + 7 + 7>>1 + 7>>2 = 0+7+3+1 = 11, index -> 8."""
    code, pred, idx = _encode_sample(100, 0, 0)
    assert code == 7 and pred == 11 and idx == 8
    # negative mirror
    code, pred, idx = _encode_sample(-100, 0, 0)
    assert code == 15 and pred == -11 and idx == 8
    # zero diff -> code 0, diffq = step>>3 = 0, index walks down (clamped)
    code, pred, idx = _encode_sample(0, 0, 0)
    assert code == 0 and pred == 0 and idx == 0


def test_round_trip_smooth_signal_bounded():
    t = np.arange(2000)
    sig = (3000 * np.sin(t / 20.0)).astype(np.int16)
    b = encode_ima_adpcm(sig)
    dec = decode_ima_adpcm(b)
    assert len(dec) == len(sig)
    err = np.abs(dec.astype(int) - sig.astype(int))
    # transient onset error while the step adapts; tight steady-state
    assert err.max() < 600
    assert err.mean() < 20
    # ~4:1 vs 16-bit PCM (container headers cost a little)
    assert 3.2 < len(sig) * 2 / len(b) <= 4.0
    # byte determinism
    assert encode_ima_adpcm(sig) == b


def test_block_boundary_state():
    # >505 samples forces a second block with a fresh header; the
    # decoder must restart from the block predictor, not drift
    sig = (1000 * np.sin(np.arange(1200) / 7.0)).astype(np.int16)
    dec = decode_ima_adpcm(encode_ima_adpcm(sig))
    assert len(dec) == 1200
    # the first sample of each block is stored verbatim
    assert dec[0] == sig[0]
    assert dec[505] == sig[505]
    assert np.abs(dec.astype(int) - sig.astype(int)).max() < 600


def test_rejects_pcm_and_garbage():
    from cc_mapreducer_spark.functions.media_codec import make_wav

    pcm = make_wav(64, 8000, 1, b"seed")
    with pytest.raises(ValueError):
        decode_ima_adpcm(pcm)  # fmt tag 1, not 0x0011
    with pytest.raises(ValueError):
        decode_ima_adpcm(b"not a wav")
    with pytest.raises(ValueError):
        encode_ima_adpcm(np.array([], dtype=np.int16))


def test_spark_adpcm_stats_deterministic(spark):
    from cc_mapreducer_spark.operators.multimodal import adpcm_codec_stats

    a = {r["doc_id"]: r for r in adpcm_codec_stats(spark, SF_ORACLE).collect()}
    b = {r["doc_id"]: r for r in adpcm_codec_stats(spark, SF_ORACLE).collect()}
    assert len(a) == 500
    for doc_id, r in a.items():
        assert r["decoded_sha"] == b[doc_id]["decoded_sha"]
        assert 600 <= r["n_samples"] < 1300
        # fixed 256-byte block align pads the tail block, so short
        # signals sit between 2x and 4x vs 16-bit PCM
        assert r["adpcm_bytes"] < r["n_samples"]
        assert r["max_abs_err"] < 3000  # step adapts within each period


def test_fact_absent_trims_pad_nibbles():
    """`fact` is optional: without it the decoder derives the sample
    count from data length + block geometry, so a full-block signal
    decodes to exactly block-geometry samples and a truncated chunk
    length raises instead of decoding partially (ADVICE r6)."""
    import struct

    rng = np.random.RandomState(7)
    spb = (256 - 4) * 2 + 1  # 505 samples/block at the fixed 256 align
    s = (rng.randint(-2000, 2000, spb * 2)).astype(np.int16)
    wav = encode_ima_adpcm(s)
    # strip the fact chunk (8 header bytes + 4 payload) out of the RIFF
    i = wav.index(b"fact")
    stripped = wav[:i] + wav[i + 12 :]
    stripped = (
        stripped[:4]
        + struct.pack("<I", len(stripped) - 8)
        + stripped[8:]
    )
    dec = decode_ima_adpcm(stripped)
    assert len(dec) == spb * 2  # full blocks -> exact geometry count
    np.testing.assert_array_equal(dec, decode_ima_adpcm(wav))
    # truncated data chunk: declared length runs past the buffer
    with pytest.raises(ValueError):
        decode_ima_adpcm(wav[: len(wav) - 10])


def test_batch_codec_bit_identical_to_sequential():
    """The lockstep-vectorized batch encode/decode must be byte- and
    sample-identical to the sequential reference on varied lengths
    (odd/even, sub-block, exact-block, multi-block)."""
    import numpy as np

    from cc_mapreducer_spark.functions.adpcm_codec import (
        decode_ima_adpcm,
        decode_ima_adpcm_batch,
        encode_ima_adpcm,
        encode_ima_adpcm_batch,
    )

    rng = np.random.RandomState(11)
    sigs = [
        rng.randint(-32768, 32768, n).astype(np.int16)
        for n in (1, 2, 3, 504, 505, 506, 1009, 1010, 1011, 700, 1299)
    ]
    seq = [encode_ima_adpcm(s) for s in sigs]
    bat = encode_ima_adpcm_batch(sigs)
    assert all(a == b for a, b in zip(seq, bat))
    seq_d = [decode_ima_adpcm(p) for p in seq]
    bat_d = decode_ima_adpcm_batch(bat)
    assert all(np.array_equal(a, b) for a, b in zip(seq_d, bat_d))
