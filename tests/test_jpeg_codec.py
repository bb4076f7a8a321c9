"""Baseline grayscale JPEG codec (functions/jpeg_codec.py): real
interchange-format bytes in and out of pure numpy — exact on constant
blocks, error-bounded on smooth content, byte-deterministic, and honest
about lossiness (bounded error, never source equality). Plus the Spark
round-trip query (jpeg_codec_stats) over the driver corpus."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from cc_mapreducer_spark.functions.jpeg_codec import (
    AC_BITS,
    AC_VALS,
    DC_BITS,
    _BitWriter,
    decode_gray_jpeg,
    encode_gray_jpeg,
)

SF_ORACLE = "/root/testdata/sf0.01"


def test_constant_image_round_trips_exactly():
    # constant blocks quantize to a lone DC coefficient; v=128 maps to
    # DC=0 so reconstruction is bit-exact — any drift means the
    # DCT/quant/Huffman plumbing is broken, not "JPEG being lossy"
    for v in (0, 64, 128, 200, 255):
        img = np.full((16, 24), v, dtype=np.uint8)
        dec = decode_gray_jpeg(encode_gray_jpeg(img))
        assert dec.shape == img.shape
        assert int(np.abs(dec.astype(int) - int(v)).max()) <= 1, v


def test_smooth_gradient_error_is_small():
    y, x = np.mgrid[0:33, 0:47]
    img = np.clip(64 + 0.5 * x + 0.8 * y, 0, 255).astype(np.uint8)
    dec = decode_gray_jpeg(encode_gray_jpeg(img))
    assert dec.shape == img.shape  # non-multiple-of-8 dims crop back
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 4


def test_noise_round_trip_deterministic_and_bounded():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (19, 21)).astype(np.uint8)
    b = encode_gray_jpeg(img)
    d1, d2 = decode_gray_jpeg(b), decode_gray_jpeg(b)
    assert (d1 == d2).all()
    # worst-case content for the K.1 table; the bound is generous but
    # still catches a broken dequant/IDCT (which produces errors ~128)
    assert int(np.abs(d1.astype(int) - img.astype(int)).max()) < 100
    # recompression converges (decode of re-encode stays close to d1)
    d3 = decode_gray_jpeg(encode_gray_jpeg(d1))
    assert int(np.abs(d3.astype(int) - d1.astype(int)).max()) < 60


def test_byte_stuffing_emits_ff00_and_survives_round_trip():
    bw = _BitWriter()
    bw.put(0xFF, 8)  # a raw 0xFF byte in the entropy stream
    out = bw.flush()
    assert out[:2] == b"\xff\x00"
    # end-to-end: many random images WILL hit stuffed bytes; each must
    # decode (the reader must consume the 0x00)
    rng = np.random.RandomState(11)
    saw_stuffed = False
    for _ in range(20):
        img = rng.randint(0, 256, (8, 8)).astype(np.uint8)
        b = encode_gray_jpeg(img)
        body = b[b.rindex(b"\x3f\x00") :]  # after SOS header
        saw_stuffed = saw_stuffed or b"\xff\x00" in body
        decode_gray_jpeg(b)  # must not raise
    assert saw_stuffed


def test_restart_intervals_round_trip():
    """DRI + RST0-7: the restart-interval stream must decode to exactly
    the same pixels as the plain stream (the entropy content is the same
    coefficients; only the framing differs), across interval sizes that
    exercise RSTn wrap-around (>8 restarts)."""
    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, (40, 48)).astype(np.uint8)  # 5x6 = 30 MCUs
    plain = decode_gray_jpeg(encode_gray_jpeg(img))
    for interval in (1, 2, 7):  # interval=1 emits 29 RSTn -> wraps 0-7 thrice
        b = encode_gray_jpeg(img, restart_interval=interval)
        assert b"\xff\xdd" in b  # DRI segment present
        assert (decode_gray_jpeg(b) == plain).all(), interval


def test_fill_bytes_before_restart_marker_are_skipped():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker;
    inject one before each RSTn and the stream must still decode."""
    rng = np.random.RandomState(29)
    img = rng.randint(0, 256, (16, 16)).astype(np.uint8)  # 4 MCUs
    b = encode_gray_jpeg(img, restart_interval=1)
    plain = decode_gray_jpeg(b)
    padded = bytearray()
    i = 0
    sos = b.index(b"\xff\xda")
    while i < len(b):
        if (
            i > sos
            and b[i] == 0xFF
            and i + 1 < len(b)
            and 0xD0 <= b[i + 1] <= 0xD7
        ):
            padded += b"\xff"  # fill byte
        padded.append(b[i])
        i += 1
    assert (decode_gray_jpeg(bytes(padded)) == plain).all()


def test_rejects_non_baseline_and_color():
    img = np.full((8, 8), 100, dtype=np.uint8)
    b = bytearray(encode_gray_jpeg(img))
    sof = b.index(b"\xff\xc0")
    # claim 3 components -> grayscale-only decoder must refuse cleanly
    color = bytearray(b)
    color[sof + 9] = 3
    with pytest.raises(ValueError):
        decode_gray_jpeg(bytes(color))
    # progressive marker (SOF2) -> refuse as non-baseline
    prog = bytearray(b)
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_gray_jpeg(bytes(prog))
    with pytest.raises(ValueError):
        decode_gray_jpeg(b"\x00\x00not a jpeg")


def test_huffman_tables_are_wellformed():
    # canonical-code invariants of the Annex K tables as transcribed:
    # counts sum to the symbol counts and no code overflows its length
    assert sum(DC_BITS) == 12
    assert sum(AC_BITS) == len(AC_VALS) == 162
    from cc_mapreducer_spark.functions.jpeg_codec import _AC_CODES, _DC_CODES

    for table in (_DC_CODES, _AC_CODES):
        seen = set()
        for sym, (code, length) in table.items():
            assert code < (1 << length)
            assert (length, code) not in seen
            seen.add((length, code))
        # prefix-freeness: no code is a prefix of a longer one
        codes = sorted(((ln, c) for ln, c in seen))
        for i, (l1, c1) in enumerate(codes):
            for l2, c2 in codes[i + 1 :]:
                if l2 > l1 and (c2 >> (l2 - l1)) == c1:
                    raise AssertionError("prefix violation")


def test_spark_jpeg_stats_deterministic_and_bounded(spark):
    from cc_mapreducer_spark.operators.multimodal import jpeg_codec_stats

    a = {r["doc_id"]: r for r in jpeg_codec_stats(spark, SF_ORACLE).collect()}
    b = {r["doc_id"]: r for r in jpeg_codec_stats(spark, SF_ORACLE).collect()}
    assert len(a) == 500
    for doc_id, r in a.items():
        assert r["decoded_sha"] == b[doc_id]["decoded_sha"]  # run-to-run
        assert r["max_abs_err"] < 100
        assert r["jpeg_bytes"] > 0
        assert r["prog_matches"]  # progressive framing == baseline pixels
        assert r["hier_exact"]  # hierarchical decode == predicted recon
        assert 8 <= r["width"] <= 32 and 8 <= r["height"] <= 24


# sha256 of the decoded doc_id=7 pixels at sf0.01 — a hard pin on the
# Annex K tables, the float64 DCT, and the Huffman bitstream: any codec
# change that alters one reconstructed pixel flips this literal
_DOC7_DECODED_SHA = (
    "9e980c37fe8888847528b82b0199857d88c6688b03c486a52b662416f5433714"
)


def test_local_replica_matches_spark_row(spark):
    """One doc computed outside Spark must equal the Spark row bit-for-
    bit (guards against Arrow/pandas dtype drift in the batch path)."""
    import duckdb

    from cc_mapreducer_spark.operators.multimodal import (
        jpeg_codec_stats,
        jpeg_test_image,
    )

    row = duckdb.sql(
        f"SELECT doc_id, text, n_chars FROM '{SF_ORACLE}/documents.parquet' "
        "WHERE doc_id = 7"
    ).fetchone()
    px = jpeg_test_image(*row)
    dec = decode_gray_jpeg(encode_gray_jpeg(px))
    expected_sha = hashlib.sha256(dec.tobytes()).hexdigest()
    assert expected_sha == _DOC7_DECODED_SHA
    assert (np.abs(dec.astype(int) - px.astype(int)) < 100).all()
    spark_row = (
        jpeg_codec_stats(spark, SF_ORACLE).filter("doc_id = 7").collect()
    )
    assert len(spark_row) == 1
    assert spark_row[0]["decoded_sha"] == expected_sha


# --------------------------------------------------------------------------
# color (YCbCr, 4:2:0 and 4:4:4)
# --------------------------------------------------------------------------

from cc_mapreducer_spark.functions.jpeg_codec import (  # noqa: E402
    AC_C_BITS,
    AC_C_VALS,
    DC_C_BITS,
    decode_color_jpeg,
    encode_color_jpeg,
    rgb_to_ycbcr,
)


def test_color_constant_round_trips_tightly():
    for rgb_val in ((0, 0, 0), (255, 255, 255), (200, 60, 30), (10, 200, 90)):
        img = np.zeros((16, 24, 3), np.uint8)
        img[...] = rgb_val
        for sub in ("420", "444"):
            dec = decode_color_jpeg(encode_color_jpeg(img, subsampling=sub))
            assert dec.shape == img.shape
            err = int(np.abs(dec.astype(int) - img.astype(int)).max())
            assert err <= 2, (rgb_val, sub, err)


def test_color_gradient_bounded_and_cropped():
    y, x = np.mgrid[0:33, 0:47]
    img = np.stack(
        [
            np.clip(60 + 0.5 * x, 0, 255),
            np.clip(50 + 0.8 * y, 0, 255),
            np.clip(100 + 0.3 * (x + y), 0, 255),
        ],
        -1,
    ).astype(np.uint8)
    for sub, bound in (("420", 12), ("444", 12)):
        dec = decode_color_jpeg(encode_color_jpeg(img, subsampling=sub))
        assert dec.shape == img.shape  # non-multiple-of-MCU dims crop back
        assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= bound


def test_color_noise_deterministic_and_luma_bounded():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
    for sub in ("420", "444"):
        b = encode_color_jpeg(img, subsampling=sub)
        d1, d2 = decode_color_jpeg(b), decode_color_jpeg(b)
        assert (d1 == d2).all()
        # chroma error on noise is subsampling/K.2-table loss by design;
        # the LUMA plane must stay inside the grayscale codec's bound
        ys, _, _ = rgb_to_ycbcr(img)
        yd, _, _ = rgb_to_ycbcr(d1)
        assert int(np.abs(ys - yd).max()) < 100, sub


def test_color_restart_intervals_and_fill_bytes():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)  # 6 MCUs at 4:2:0
    plain = decode_color_jpeg(encode_color_jpeg(img))
    for interval in (1, 2):
        b = encode_color_jpeg(img, restart_interval=interval)
        assert b"\xff\xdd" in b
        assert (decode_color_jpeg(b) == plain).all(), interval
    # fill byte before each RSTn must be skipped
    b = encode_color_jpeg(img, restart_interval=1)
    sos = b.index(b"\xff\xda")
    padded = bytearray()
    i = 0
    while i < len(b):
        if i > sos and b[i] == 0xFF and i + 1 < len(b) and 0xD0 <= b[i + 1] <= 0xD7:
            padded += b"\xff"
        padded.append(b[i])
        i += 1
    assert (decode_color_jpeg(bytes(padded)) == plain).all()


def test_color_rejects_unsupported():
    img = np.zeros((16, 16, 3), np.uint8)
    b = bytearray(encode_color_jpeg(img))
    sof = b.index(b"\xff\xc0")
    # progressive -> refuse
    prog = bytearray(b)
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_color_jpeg(bytes(prog))
    # 4:2:2 (Y sampling 2x1) -> refuse cleanly (not a supported layout)
    odd = bytearray(b)
    odd[sof + 11] = 0x21  # comp 1 sampling byte (id at +10, samp at +11)
    with pytest.raises(ValueError):
        decode_color_jpeg(bytes(odd))
    # grayscale payload -> wrong entry point
    gray = encode_gray_jpeg(np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError):
        decode_color_jpeg(gray)
    # color payload into the grayscale decoder -> refuse
    with pytest.raises(ValueError):
        decode_gray_jpeg(bytes(b))
    with pytest.raises(ValueError):
        encode_color_jpeg(img, subsampling="422")


def test_chroma_huffman_tables_wellformed():
    from cc_mapreducer_spark.functions.jpeg_codec import _AC_C_CODES, _DC_C_CODES

    assert sum(DC_C_BITS) == 12
    assert sum(AC_C_BITS) == len(AC_C_VALS) == 162
    for table in (_DC_C_CODES, _AC_C_CODES):
        seen = set()
        for sym, (code, length) in table.items():
            assert code < (1 << length)
            assert (length, code) not in seen
            seen.add((length, code))
        codes = sorted(((ln, c) for ln, c in seen))
        for i, (l1, c1) in enumerate(codes):
            for l2, c2 in codes[i + 1 :]:
                if l2 > l1 and (c2 >> (l2 - l1)) == c1:
                    raise AssertionError("prefix violation")


def test_spark_color_jpeg_stats(spark):
    from cc_mapreducer_spark.operators.multimodal import jpeg_color_codec_stats

    a = {r["doc_id"]: r for r in jpeg_color_codec_stats(spark, SF_ORACLE).collect()}
    b = {r["doc_id"]: r for r in jpeg_color_codec_stats(spark, SF_ORACLE).collect()}
    assert len(a) == 500
    for doc_id, r in a.items():
        assert r["decoded_sha"] == b[doc_id]["decoded_sha"]  # run-to-run
        assert r["max_luma_err"] < 100
        assert r["jpeg_bytes"] > 0


# sha256 of the decoded doc_id=7 COLOR pixels at sf0.01 — pins the K.2
# chroma table, the YCbCr transform, the 2x2 downsample, and the
# interleaved MCU framing
_DOC7_COLOR_DECODED_SHA = (
    "5b08b3a85dac0e704d1df34b67c2d2178c6862a0576808115551ae3711486e2a"
)


def test_color_local_replica_matches_spark_row(spark):
    import duckdb

    from cc_mapreducer_spark.operators.multimodal import (
        jpeg_color_codec_stats,
        jpeg_color_test_image,
    )

    row = duckdb.sql(
        f"SELECT doc_id, text, n_chars FROM '{SF_ORACLE}/documents.parquet' "
        "WHERE doc_id = 7"
    ).fetchone()
    px = jpeg_color_test_image(*row)
    dec = decode_color_jpeg(encode_color_jpeg(px))
    expected_sha = hashlib.sha256(dec.tobytes()).hexdigest()
    assert expected_sha == _DOC7_COLOR_DECODED_SHA
    spark_row = (
        jpeg_color_codec_stats(spark, SF_ORACLE).filter("doc_id = 7").collect()
    )
    assert len(spark_row) == 1
    assert spark_row[0]["decoded_sha"] == expected_sha


# --------------------------------------------------------------------------
# progressive mode (SOF2)
# --------------------------------------------------------------------------

from cc_mapreducer_spark.functions.jpeg_codec import (  # noqa: E402
    PROG_AC_BITS,
    PROG_AC_VALS,
    PROGRESSIVE_SCRIPT_GRAY,
    _gen_huffman_table,
    decode_progressive_jpeg,
    encode_gray_jpeg_progressive,
)


def test_progressive_decodes_identical_to_baseline():
    """The invariant that pins the whole Annex G implementation: both
    framings carry the SAME quantized coefficients, so decoded pixels
    must be bit-identical — over EOBRUN-heavy (constant), sparse-AC
    (gradient), dense (noise), and mixed content, at odd shapes."""
    rng = np.random.RandomState(7)
    y, x = np.mgrid[0:57, 0:95]
    cases = [
        np.full((64, 64), 200, np.uint8),
        np.clip(30 + 0.7 * x + 1.1 * y, 0, 255).astype(np.uint8),
        rng.randint(0, 256, (19, 21)).astype(np.uint8),
        rng.randint(0, 256, (120, 136)).astype(np.uint8),
    ]
    half = np.zeros((48, 96), np.uint8)
    half[:, 48:] = rng.randint(0, 256, (48, 48))
    cases.append(half)
    for img in cases:
        base = decode_gray_jpeg(encode_gray_jpeg(img))
        prog = decode_progressive_jpeg(encode_gray_jpeg_progressive(img))
        assert (prog == base).all(), img.shape


def test_progressive_alternative_scan_scripts():
    """Deep successive approximation (Al=3 down to 0), narrow spectral
    bands with no approximation, and a minimal 3-scan script must all
    reconstruct the exact coefficients."""
    rng = np.random.RandomState(11)
    scripts = [
        [(0, 0, 0, 3), (1, 63, 0, 3), (0, 0, 3, 2), (1, 63, 3, 2),
         (0, 0, 2, 1), (1, 63, 2, 1), (0, 0, 1, 0), (1, 63, 1, 0)],
        [(0, 0, 0, 0), (1, 2, 0, 0), (3, 8, 0, 0), (9, 20, 0, 0),
         (21, 40, 0, 0), (41, 63, 0, 0)],
        [(0, 0, 0, 0), (1, 63, 0, 1), (1, 63, 1, 0)],
    ]
    for script in scripts:
        for _ in range(3):
            img = rng.randint(
                0, 256, (rng.randint(1, 41), rng.randint(1, 41))
            ).astype(np.uint8)
            prog = decode_progressive_jpeg(
                encode_gray_jpeg_progressive(img, script=script)
            )
            base = decode_gray_jpeg(encode_gray_jpeg(img))
            assert (prog == base).all(), script


def test_progressive_stream_structure_and_rejections():
    img = np.full((16, 16), 90, np.uint8)
    b = encode_gray_jpeg_progressive(img)
    assert b"\xff\xc2" in b  # SOF2
    assert b.count(b"\xff\xda") == len(PROGRESSIVE_SCRIPT_GRAY)  # one SOS/scan
    # baseline decoder refuses progressive; progressive refuses baseline
    with pytest.raises(ValueError):
        decode_gray_jpeg(b)
    with pytest.raises(ValueError):
        decode_progressive_jpeg(encode_gray_jpeg(img))
    with pytest.raises(ValueError):
        decode_progressive_jpeg(b"junk")


def test_progressive_huffman_table_generated_valid():
    """The K.2-constructed AC table: covers every symbol the progressive
    encoder can emit (EOBn included — the reason the baseline Annex K
    table cannot be reused), Kraft-valid, prefix-free, all-ones unused."""
    from fractions import Fraction

    need = {0x00, 0xF0}
    need |= {r << 4 for r in range(1, 15)}
    need |= {(r << 4) | s for r in range(16) for s in range(1, 15)}
    assert need <= set(PROG_AC_VALS)
    kraft = sum(Fraction(n, 2 ** (i + 1)) for i, n in enumerate(PROG_AC_BITS))
    assert kraft <= 1
    assert max(i + 1 for i, n in enumerate(PROG_AC_BITS) if n) <= 16
    # the construction itself: a known tiny frequency set produces a
    # prefix-free code with the all-ones codeword unused
    bits, vals = _gen_huffman_table({1: 100, 2: 50, 3: 10, 4: 1})
    assert sorted(vals) == [1, 2, 3, 4]
    from cc_mapreducer_spark.functions.jpeg_codec import _canonical_codes

    codes = _canonical_codes(bits, vals)
    for sym, (code, length) in codes.items():
        assert not (code == (1 << length) - 1 and length == max(
            l for _, l in codes.values()
        )), "all-ones codeword must stay reserved"


def test_progressive_randomized_vs_baseline():
    rng = np.random.RandomState(99)
    for trial in range(40):
        h, w = rng.randint(1, 50), rng.randint(1, 50)
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
        prog = decode_progressive_jpeg(encode_gray_jpeg_progressive(img))
        base = decode_gray_jpeg(encode_gray_jpeg(img))
        assert (prog == base).all(), (trial, h, w)


# --------------------------------------------------------------------------
# hierarchical mode (Annex J)
# --------------------------------------------------------------------------


def _hier_expected_recon(px, levels):
    """Replicate the decoder's reconstruction with the module's own
    primitives — the exactness pin: decode must equal this EXACTLY."""
    import numpy as np

    from cc_mapreducer_spark.functions.jpeg_codec import (
        _hier_frame,
        downsample2,
        upsample2x,
    )

    pyr = [px.astype(np.int64)]
    for _ in range(levels - 1):
        pyr.append(downsample2(pyr[-1]))
    recon = None
    for k in reversed(range(levels)):
        img = pyr[k]
        if recon is None:
            _, srec = _hier_frame(img, shift=128.0)
            recon = np.clip(srec, 0, 255)
        else:
            ref = upsample2x(recon)[: img.shape[0], : img.shape[1]]
            _, drec = _hier_frame(img - ref, shift=0.0)
            recon = np.clip(ref + drec, 0, 255)
    return recon.astype(np.uint8)


def test_hierarchical_decode_matches_predicted_recon_exactly():
    import numpy as np

    from cc_mapreducer_spark.functions.jpeg_codec import (
        decode_gray_jpeg_hierarchical,
        encode_gray_jpeg_hierarchical,
    )

    rng = np.random.RandomState(11)
    for shape, levels in [((64, 48), 2), ((37, 53), 3), ((80, 80), 4), ((9, 11), 2)]:
        px = (
            rng.randint(0, 80, shape)
            + np.linspace(0, 175, shape[1])[None, :].astype(int)
        ).astype(np.uint8)
        data = encode_gray_jpeg_hierarchical(px, levels=levels)
        dec = decode_gray_jpeg_hierarchical(data)
        np.testing.assert_array_equal(dec, _hier_expected_recon(px, levels))


def test_hierarchical_error_bounds_and_stage_property():
    import numpy as np

    from cc_mapreducer_spark.functions.jpeg_codec import (
        decode_gray_jpeg_hierarchical,
        downsample2,
        encode_gray_jpeg_hierarchical,
    )

    # constant image: every stage codes a (near-)zero field -> error <= 1
    const = np.full((48, 40), 77, dtype=np.uint8)
    dec = decode_gray_jpeg_hierarchical(encode_gray_jpeg_hierarchical(const, 3))
    assert np.abs(dec.astype(int) - 77).max() <= 1
    # smooth gradient (no mod-256 wrap — a wrap is a sharp edge, and
    # quantized DCT ringing at an edge is baseline behavior, not a
    # hierarchical defect): the differential stage corrects the
    # upsampling blur, final error stays small
    y, x = np.mgrid[0:64, 0:56]
    grad = (x * 2 + y).astype(np.uint8)  # max 173, monotone
    dec = decode_gray_jpeg_hierarchical(encode_gray_jpeg_hierarchical(grad, 2))
    assert np.abs(dec.astype(int) - grad.astype(int)).max() <= 16
    # progressive-transmission property: stage 1 alone is a valid image
    # at pyramid scale, close to the encoder's own downsampled level
    data = encode_gray_jpeg_hierarchical(grad, 2)
    s0 = decode_gray_jpeg_hierarchical(data, max_stages=1)
    lv1 = downsample2(grad)
    assert s0.shape == lv1.shape == (32, 28)
    assert np.abs(s0.astype(int) - lv1.astype(int)).max() <= 16
    # and each later stage only sharpens: full decode beats upsampled
    # stage-1 on mean error
    from cc_mapreducer_spark.functions.jpeg_codec import upsample2x

    full = decode_gray_jpeg_hierarchical(data)
    up0 = upsample2x(s0.astype(np.int64))[:64, :56]
    assert (
        np.abs(full.astype(int) - grad.astype(int)).mean()
        < np.abs(up0 - grad.astype(int)).mean()
    )


def test_hierarchical_structure_and_mode_guards():
    import hashlib

    import numpy as np
    import pytest

    from cc_mapreducer_spark.functions.jpeg_codec import (
        decode_gray_jpeg,
        decode_gray_jpeg_hierarchical,
        decode_progressive_jpeg,
        encode_gray_jpeg,
        encode_gray_jpeg_hierarchical,
    )

    rng = np.random.RandomState(13)
    px = rng.randint(0, 256, (40, 40)).astype(np.uint8)
    data = encode_gray_jpeg_hierarchical(px, levels=3)
    # container structure: DHP once, EXP and SOF5 once per differential
    # stage, exactly one non-differential SOF0
    assert data.count(b"\xff\xde") == 1
    assert data.count(b"\xff\xdf") == 2
    assert data.count(b"\xff\xc5") == 2
    assert data.count(b"\xff\xc0") == 1
    # the other decoders refuse a hierarchical stream loudly (silently
    # returning the low-res stage 1 would be the dangerous failure)
    with pytest.raises(ValueError, match="hierarchical"):
        decode_gray_jpeg(data)
    with pytest.raises(ValueError, match="hierarchical"):
        decode_progressive_jpeg(data)
    # and the hierarchical decoder refuses a baseline stream
    with pytest.raises(ValueError):
        decode_gray_jpeg_hierarchical(encode_gray_jpeg(px))
    # byte + decode determinism
    assert hashlib.sha256(data).hexdigest() == hashlib.sha256(
        encode_gray_jpeg_hierarchical(px, levels=3)
    ).hexdigest()
    with pytest.raises(ValueError):
        encode_gray_jpeg_hierarchical(px, levels=1)
