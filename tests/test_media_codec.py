"""Real container-level media decode (functions/media_codec.py) and its
Spark wiring (operators/multimodal.py: media_table_encoded ->
decode_media_headers).

The decode claim is proven two independent ways:
1. round-trip — encoders' parameters come back exactly from the parser;
2. golden bytes — files produced OUTSIDE this codebase (a canonical 1x1
   RGBA PNG, hand-packed spec layouts with extra chunks) parse correctly,
   so the parser reads the format, not just our encoder's output.
"""

from __future__ import annotations

import base64
import struct
import zlib

import pytest

from cc_mapreducer_spark.functions import media_codec as mc
from tests.conftest import SF_SMOKE


# --------------------------------------------------------------------------
# pure-python round trips
# --------------------------------------------------------------------------


@pytest.mark.parametrize("w,h", [(1, 1), (32, 24), (257, 3)])
def test_png_roundtrip(w, h):
    meta = mc.parse_png(mc.make_png(w, h, b"seed bytes"))
    assert meta == {"kind": "image", "width": w, "height": h, "channels": 1, "bit_depth": 8}


def test_png_is_decodable_by_independent_inflater():
    # the IDAT stream must be real zlib data whose raster has the spec's
    # (1 filter byte + width) * height layout
    w, h = 5, 4
    b = mc.make_png(w, h, b"xyz")
    length, typ = struct.unpack(">I4s", b[33:41])
    assert typ == b"IDAT"
    raster = zlib.decompress(b[41 : 41 + length])
    assert len(raster) == (w + 1) * h


@pytest.mark.parametrize("n,rate,ch", [(64, 8000, 1), (128, 44100, 2)])
def test_wav_roundtrip(n, rate, ch):
    meta = mc.parse_wav(mc.make_wav(n, rate, ch, b"pcm"))
    assert meta == {
        "kind": "audio",
        "channels": ch,
        "sample_rate": rate,
        "n_samples": n,
        "bit_depth": 16,
    }


@pytest.mark.parametrize("ms", [1, 7350, 86_400_000])
def test_mp4_roundtrip(ms):
    meta = mc.parse_mp4(mc.make_mp4(ms, b"mdat"))
    assert meta["duration_ms"] == ms and meta["timescale"] == 1000


def test_sniff_dispatch_and_rejection():
    assert mc.sniff_and_parse(mc.make_png(2, 2, b"x"))["kind"] == "image"
    assert mc.sniff_and_parse(mc.make_wav(8, 8000, 1, b"x"))["kind"] == "audio"
    assert mc.sniff_and_parse(mc.make_mp4(99, b"x"))["kind"] == "video"
    assert mc.sniff_and_parse(b"plain text, not media") is None
    assert mc.sniff_and_parse(b"") is None


def test_png_crc_corruption_detected():
    b = bytearray(mc.make_png(4, 4, b"x"))
    b[20] ^= 0xFF  # flip a bit inside IHDR without fixing the CRC
    assert mc.parse_png(bytes(b)) is None


# --------------------------------------------------------------------------
# property-based round trips (hypothesis)
# --------------------------------------------------------------------------

try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 64),
        h=st.integers(1, 32),
        seed=st.binary(min_size=0, max_size=32),
    )
    def test_png_roundtrip_property(w, h, seed):
        meta = mc.parse_png(mc.make_png(w, h, seed))
        assert (meta["width"], meta["height"]) == (w, h)

    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(1, 512),
        rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
        ch=st.integers(1, 8),
        seed=st.binary(min_size=0, max_size=32),
    )
    def test_wav_roundtrip_property(n, rate, ch, seed):
        meta = mc.parse_wav(mc.make_wav(n, rate, ch, seed))
        assert (meta["n_samples"], meta["sample_rate"], meta["channels"]) == (n, rate, ch)

    @settings(max_examples=30, deadline=None)
    @given(ms=st.integers(0, 2**31 - 1), seed=st.binary(min_size=0, max_size=80))
    def test_mp4_roundtrip_property(ms, seed):
        assert mc.parse_mp4(mc.make_mp4(ms, seed))["duration_ms"] == ms

    @settings(max_examples=50, deadline=None)
    @given(junk=st.binary(min_size=0, max_size=200))
    def test_sniff_never_crashes_on_junk(junk):
        # arbitrary bytes must parse to a dict or None, never raise —
        # a 100 TB corpus WILL contain truncated/corrupt payloads
        out = mc.sniff_and_parse(junk)
        assert out is None or isinstance(out, dict)

except ImportError:  # pragma: no cover - hypothesis is baked into this env
    pass


# --------------------------------------------------------------------------
# golden bytes produced outside this codebase
# --------------------------------------------------------------------------

# The canonical 1x1 RGBA PNG (ubiquitous public test vector, produced by
# libpng-based tooling — NOT by make_png, which only emits grayscale).
_GOLDEN_1X1_PNG = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
)


def test_golden_png_from_external_encoder():
    meta = mc.parse_png(_GOLDEN_1X1_PNG)
    assert meta == {"kind": "image", "width": 1, "height": 1, "channels": 4, "bit_depth": 8}


def test_wav_with_extra_chunk_between_fmt_and_data():
    # hand-packed spec layout with a LIST chunk the encoder never emits —
    # the RIFF walk must skip it (and honor word alignment: 5-byte chunk)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    data = b"\x01\x02" * 10
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", 5) + b"INFOX" + b"\x00"  # padded to even
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    meta = mc.parse_wav(wav)
    assert meta["sample_rate"] == 16000 and meta["n_samples"] == 10


def test_mp4_v1_mvhd_parses():
    # hand-packed version-1 mvhd (64-bit duration) — encoder only emits v0
    mvhd = (
        struct.pack(">I", 0x01000000)  # version 1
        + struct.pack(">QQ", 0, 0)  # 64-bit times
        + struct.pack(">I", 90000)  # timescale
        + struct.pack(">Q", 90000 * 12)  # duration: 12s
    )
    b = (
        struct.pack(">I", 16) + b"ftyp" + b"isom\x00\x00\x02\x00"
        + struct.pack(">I", 8 + 8 + len(mvhd)) + b"moov"
        + struct.pack(">I", 8 + len(mvhd)) + b"mvhd" + mvhd
    )
    assert mc.parse_mp4(b) == {"kind": "video", "duration_ms": 12000, "timescale": 90000}


# --------------------------------------------------------------------------
# spark wiring: encode -> decode matches the generation formulas
# --------------------------------------------------------------------------


def test_spark_real_decode_matches_formulas(spark):
    from cc_mapreducer_spark.operators.multimodal import multimodal_decode_real
    from cc_mapreducer_spark.tables import load_table

    decoded = {r["doc_id"]: r for r in multimodal_decode_real(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars").collect()
    assert len(decoded) == len(docs) and len(docs) > 0
    for d in docs:
        row, n = decoded[d["doc_id"]], d["n_chars"]
        if d["doc_id"] % 3 == 0:
            assert row["media_type"] == "image/png"
            assert (row["width"], row["height"]) == (1 + n % 32, 1 + d["doc_id"] % 24)
            assert row["channels"] == 1 and row["sample_rate"] is None
        elif d["doc_id"] % 3 == 1:
            assert row["media_type"] == "audio/wav"
            assert row["n_samples"] == 64 + n % 128
            assert row["sample_rate"] == 8000 and row["width"] is None
        else:
            assert row["media_type"] == "video/mp4"
            assert row["duration_ms"] == 500 + (n * 7) % 10000
            assert row["width"] is None and row["n_samples"] is None


def test_multimodal_derived_has_decoded_and_frame_legs(spark):
    from cc_mapreducer_spark.operators.multimodal import multimodal_derived

    rows = multimodal_derived(spark, SF_SMOKE).collect()
    kinds = {r["kind"] for r in rows}
    assert kinds == {"decoded", "frame"}
    decoded = [r for r in rows if r["kind"] == "decoded"]
    # every payload decoded — no unparseable containers, no fake fallback
    assert all(
        r["width"] is not None or r["n_samples"] is not None or r["duration_ms"] is not None
        for r in decoded
    )


def test_container_byte_size_formulas_match_oracle_constants():
    """The multimodal_derived oracle re-derives frame byte counts from
    closed-form container sizes (WAV: 44 + samples*block; MP4: 152 +
    min(seed, 64), empty seed -> 1). Pin those formulas against the real
    encoders so a codec layout change cannot silently diverge from the
    SQL between driver runs."""
    from cc_mapreducer_spark.functions import media_codec as mc
    from cc_mapreducer_spark.operators.multimodal import _MP4_HEADER_BYTES, _frame_chunks

    for ns, ch in [(64, 1), (100, 2), (191, 1), (1, 1)]:
        assert len(mc.make_wav(ns, 8000, ch, b"s")) == 44 + ns * ch * 2
    for seed in [b"x", b"y" * 10, b"z" * 64, b"w" * 200]:
        assert len(mc.make_mp4(777, seed)) == _MP4_HEADER_BYTES + min(len(seed), 64)
    assert len(mc.make_mp4(777, b"")) == _MP4_HEADER_BYTES + 1  # empty-seed fallback
    assert _MP4_HEADER_BYTES == 152
    # frame chunks: 4 equal slices of len//4 (payloads are always >= 4B)
    p = mc.make_mp4(1234, b"q" * 30)
    chunks = _frame_chunks(p, 4)
    assert [len(c) for c in chunks] == [len(p) // 4] * 4


def test_parsers_return_none_on_truncated_headers():
    """Corrupt/truncated containers must yield None (the sniff contract),
    never raise — a struct.error would kill the Spark task mid-batch."""
    import struct

    from cc_mapreducer_spark.functions import media_codec as mc

    # WAV declaring a 16-byte fmt chunk the buffer can't back
    wav = b"RIFF" + struct.pack("<I", 20) + b"WAVE" + b"fmt " + struct.pack("<I", 16) + b"\x01\x02"
    assert mc.parse_wav(wav) is None
    assert mc.sniff_and_parse(wav) is None
    # MP4 v1 mvhd with only a v0-sized (24-byte) payload
    mvhd = b"\x01" + b"\x00" * 23
    moov = struct.pack(">I", 8 + 8 + len(mvhd)) + b"moov" + struct.pack(">I", 8 + len(mvhd)) + b"mvhd" + mvhd
    mp4 = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4 + moov
    assert mc.parse_mp4(mp4) is None
    assert mc.sniff_and_parse(mp4) is None


# ---------------------------------------------------------------------------
# round 4: codec-level decode (pixels/samples) — pure stdlib + numpy
# ---------------------------------------------------------------------------


def test_png_pixel_roundtrip_various_shapes():
    import numpy as np
    from cc_mapreducer_spark.functions.media_codec import (
        decode_png_pixels,
        make_png,
    )

    for w, h, seed in [(1, 1, b"x"), (13, 7, b"hello seed"), (32, 24, bytes(range(200)))]:
        px = decode_png_pixels(make_png(w, h, seed))
        exp = np.array(
            [[seed[(x + y) % len(seed)] for x in range(w)] for y in range(h)],
            dtype=np.uint8,
        )
        assert px.shape == (h, w) and (px == exp).all()


def _png_with_filters(pixels, ftypes):
    """Hand-build a grayscale PNG whose scanlines use the GIVEN filter
    types — our own encoder only emits type 0, so this is what proves
    the decoder implements the spec, not the generator."""
    import struct
    import zlib

    import numpy as np
    from cc_mapreducer_spark.functions.media_codec import _paeth, _png_chunk

    h, w = pixels.shape
    raster = bytearray()
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        cur = pixels[y].astype(np.int64)
        ft = ftypes[y % len(ftypes)]
        raster.append(ft)
        for x in range(w):
            left = int(cur[x - 1]) if x else 0
            ul = int(prev[x - 1]) if x else 0
            if ft == 0:
                v = cur[x]
            elif ft == 1:
                v = cur[x] - left
            elif ft == 2:
                v = cur[x] - prev[x]
            elif ft == 3:
                v = cur[x] - (left + int(prev[x])) // 2
            else:
                v = cur[x] - _paeth(left, int(prev[x]), ul)
            raster.append(int(v) % 256)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raster)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_decoder_handles_all_five_spec_filters():
    import numpy as np
    from cc_mapreducer_spark.functions.media_codec import decode_png_pixels

    rngs = np.random.RandomState(7)
    pixels = rngs.randint(0, 256, size=(10, 17)).astype(np.uint8)
    # every scanline a different filter type, cycling through all five
    png = _png_with_filters(pixels, ftypes=[0, 1, 2, 3, 4])
    out = decode_png_pixels(png)
    assert out is not None and (out == pixels).all()
    # and each filter alone
    for ft in range(5):
        out = decode_png_pixels(_png_with_filters(pixels, ftypes=[ft]))
        assert (out == pixels).all(), f"filter {ft}"


def test_png_decoder_rejects_out_of_scope_and_corrupt():
    from cc_mapreducer_spark.functions.media_codec import (
        decode_png_pixels,
        make_png,
    )

    good = make_png(8, 8, b"seed")
    assert decode_png_pixels(b"not a png") is None
    assert decode_png_pixels(good[:40]) is None  # truncated stream
    # corrupt the zlib stream inside IDAT (skip 8-byte sig + 25-byte IHDR
    # chunk + 8-byte IDAT header, then flip a byte)
    bad = bytearray(good)
    bad[8 + 25 + 8 + 2] ^= 0xFF
    assert decode_png_pixels(bytes(bad)) is None


def test_wav_sample_roundtrip_and_reject():
    import numpy as np
    from cc_mapreducer_spark.functions.media_codec import (
        decode_wav_samples,
        make_wav,
    )

    seed = bytes(range(64, 128))
    for ch in (1, 2):
        s = decode_wav_samples(make_wav(50, 8000, ch, seed))
        data = bytes(seed[i % len(seed)] for i in range(50 * ch * 2))
        exp = np.frombuffer(data, dtype="<i2").reshape(-1, ch)
        assert (s == exp).all()
    assert decode_wav_samples(b"RIFFxxxx") is None


def test_block_average_exact_with_partial_edge_blocks():
    import numpy as np
    from cc_mapreducer_spark.operators.multimodal import block_average

    px = np.arange(35, dtype=np.uint8).reshape(5, 7)  # odd dims both ways
    t = block_average(px, 2)
    assert t.shape == (3, 4)
    # full block: floor mean of its 4 pixels
    assert t[0, 0] == (0 + 1 + 7 + 8) // 4
    # right edge: 1-wide block
    assert t[0, 3] == (6 + 13) // 2
    # bottom-right corner: single pixel
    assert t[2, 3] == 34
