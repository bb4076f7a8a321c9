"""Baseline JPEG (ITU-T T.81) encoder/decoder, pure numpy + stdlib —
the entropy-coded codec leg that was previously behind the
`decode_with_library` environment seam (operators/multimodal.py).

Scope: baseline sequential DCT, grayscale (1 component) AND color
(YCbCr 3-component interleaved scans, 4:2:0 chroma subsampling — the
libjpeg default for color — or 4:4:4), the Annex K.1/K.2 quantization
tables and all four Annex K "typical" Huffman tables, DRI/RST0-7
restart intervals in both directions, AND progressive mode (SOF2,
Annex G: spectral selection + successive approximation with EOBn
end-of-band runs and refinement correction bits, grayscale, arbitrary
scan scripts) with the spec's own K.2 Huffman-table construction for
the EOBn symbols the baseline tables lack. The standard's remaining
modes (arithmetic coding, 12-bit, hierarchical, other subsampling
ratios) stay behind the library seam; this module exists to prove the
entropy-coded path itself — Huffman bitstream with byte stuffing,
zigzag RLE, dequantize, IDCT, chroma resampling, the YCbCr transform,
multi-scan coefficient accumulation — needs no external dependency.

Determinism: integer Huffman/RLE plus float64 matrix IDCT evaluated in a
fixed order — byte-identical output for identical input bytes on any
platform (pytest pins round-trip hashes). The encoder exists primarily
so the decoder has real entropy-coded input to prove itself on inside
this container; both directions implement the actual interchange format
— including DRI/RST0-7 restart intervals (DC-predictor reset, byte
alignment, 0xFF fill bytes before markers) — so payloads from any
standard encoder (baseline grayscale) decode too.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K)
# --------------------------------------------------------------------------

# K.1 luminance quantization (quality ~50, the spec's example table)
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# K.3.3.1 / K.3.3.2: (BITS counts per code length 1..16, HUFFVAL symbols)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# K.2 chrominance quantization (the spec's example chroma table)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# K.3.3.1 (Table K.4) / K.3.3.2 (Table K.6): chrominance DC / AC tables
DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_C_VALS = list(range(12))
AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _zigzag_order() -> list[tuple[int, int]]:
    """(row, col) visit order of the 8x8 zigzag, generated (not typed)
    so a transcription typo is impossible."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        order.extend(diag if s % 2 == 1 else diag[::-1])
    return order


ZIGZAG = _zigzag_order()
ZIG_ROWS = np.array([r for r, _ in ZIGZAG])
ZIG_COLS = np.array([c for _, c in ZIGZAG])


def _dct_matrix() -> np.ndarray:
    c = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
        for x in range(8):
            c[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16)
    return c


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(DC_BITS, DC_VALS)
_AC_CODES = _canonical_codes(AC_BITS, AC_VALS)
_DC_C_CODES = _canonical_codes(DC_C_BITS, DC_C_VALS)
_AC_C_CODES = _canonical_codes(AC_C_BITS, AC_C_VALS)


# JFIF (ITU-T T.871) RGB <-> YCbCr, full range, float64 fixed order
def rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# bit I/O with byte stuffing
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def raw(self, b: bytes) -> None:
        """Append marker bytes verbatim (caller must be byte-aligned);
        markers are never byte-stuffed."""
        assert self.n == 0
        self.out += b

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("marker inside entropy stream")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RST0-7 marker. The spec (T.81
        B.1.1.2) allows any number of 0xFF fill bytes before a marker;
        skip them, then require a restart marker."""
        self.n = 0  # discard the pad bits of the finished interval
        while (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xFF
        ):
            self.pos += 1  # fill byte
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


def _size_of(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _bits_of(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    prev_dc: int,
) -> int:
    """FDCT + quantize + zigzag + Huffman one 8x8 block (level-shifted
    input, i.e. centered on 0); returns the new DC predictor."""
    coef = _DCT @ block @ _DCT.T
    qc = np.rint(coef / q).astype(np.int64)
    zz = qc[ZIG_ROWS, ZIG_COLS]
    diff = int(zz[0]) - prev_dc
    new_dc = int(zz[0])
    s = _size_of(diff)
    code, length = dc_codes[s]
    bw.put(code, length)
    if s:
        bw.put(_bits_of(diff, s), s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            bw.put(code, length)
            run -= 16
        s = _size_of(v)
        code, length = ac_codes[(run << 4) | s]
        bw.put(code, length)
        bw.put(_bits_of(v, s), s)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.put(code, length)
    return new_dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_gray_jpeg(pixels: np.ndarray, restart_interval: int = 0) -> bytes:
    """8-bit grayscale array (h, w) -> baseline JFIF bytes.

    ``restart_interval`` > 0 emits a DRI segment and an RST0-7 marker
    every that-many MCUs (DC predictor reset, byte-aligned) — the layout
    hardware encoders use for error resilience; the decoder handles both
    forms."""
    px = np.asarray(pixels)
    if px.ndim != 2:
        raise ValueError("expected a 2-D grayscale array")
    h, w = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    px = px.astype(np.float64)
    # pad to multiples of 8 by edge replication (the spec's recommended fill)
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        px = np.pad(px, ((0, ph), (0, pw)), mode="edge")

    bw = _BitWriter()
    q = QUANT_LUMA.astype(np.float64)
    prev_dc = 0
    mcu_idx = 0
    rst_n = 0
    for by in range(0, px.shape[0], 8):
        for bx in range(0, px.shape[1], 8):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                bw.align()
                bw.raw(bytes((0xFF, 0xD0 + rst_n)))
                rst_n = (rst_n + 1) % 8
                prev_dc = 0
            mcu_idx += 1
            prev_dc = _encode_block(
                bw,
                px[by : by + 8, bx : bx + 8] - 128.0,
                q,
                _DC_CODES,
                _AC_CODES,
                prev_dc,
            )
    entropy = bw.flush()

    seg = _seg
    zz_quant = bytes(int(QUANT_LUMA[r, c]) for r, c in ZIGZAG)
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + zz_quant)  # DQT: Pq=0 Tq=0
    out += seg(0xC0, struct.pack(">BHHB", 8, px.shape[0], px.shape[1], 1) + b"\x01\x11\x00")
    out += seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    out += seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"  # EOI
    # SOF records the PADDED dims; the true crop rides in a COM segment so
    # decode round-trips exactly. (A standard decoder shows the padding —
    # harmless edge replication.)
    if ph or pw:
        com = seg(0xFE, b"crop=%dx%d" % (h, w))
        out = out[:2] + com + out[2:]
    return bytes(out)


def encode_color_jpeg(
    rgb: np.ndarray, restart_interval: int = 0, subsampling: str = "420"
) -> bytes:
    """8-bit RGB array (h, w, 3) -> baseline JFIF bytes: JFIF YCbCr
    transform, interleaved MCUs, K.1/K.2 quant tables and the four
    Annex K Huffman tables. ``subsampling="420"`` (the libjpeg default
    for color: 2x2-mean chroma downsampling, Y Y Y Y Cb Cr 16x16 MCUs)
    or ``"444"`` (full chroma, Y Cb Cr 8x8 MCUs). ``restart_interval``
    counts MCUs as in the grayscale encoder."""
    px = np.asarray(rgb)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected an (h, w, 3) RGB array")
    if subsampling not in ("420", "444"):
        raise ValueError("subsampling must be '420' or '444'")
    sub = subsampling == "420"
    mcu = 16 if sub else 8
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    # pad to the MCU grid by edge replication
    ph, pw = -h % mcu, -w % mcu
    if ph or pw:
        px = np.pad(px, ((0, ph), (0, pw), (0, 0)), mode="edge")
    hp, wp = px.shape[:2]
    y, cb, cr = rgb_to_ycbcr(px)
    if sub:  # 2x2 mean downsample the chroma planes
        cb = cb.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))

    bw = _BitWriter()
    ql = QUANT_LUMA.astype(np.float64)
    qc = QUANT_CHROMA.astype(np.float64)
    dc_y = dc_cb = dc_cr = 0
    mcu_idx = 0
    rst_n = 0
    y_offsets = ((0, 0), (0, 8), (8, 0), (8, 8)) if sub else ((0, 0),)
    for my in range(0, hp, mcu):
        for mx in range(0, wp, mcu):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                bw.align()
                bw.raw(bytes((0xFF, 0xD0 + rst_n)))
                rst_n = (rst_n + 1) % 8
                dc_y = dc_cb = dc_cr = 0
            mcu_idx += 1
            # Y blocks left-to-right then top-to-bottom (B.2.3)
            for dy, dx in y_offsets:
                dc_y = _encode_block(
                    bw,
                    y[my + dy : my + dy + 8, mx + dx : mx + dx + 8] - 128.0,
                    ql,
                    _DC_CODES,
                    _AC_CODES,
                    dc_y,
                )
            cy, cx = (my // 2, mx // 2) if sub else (my, mx)
            dc_cb = _encode_block(
                bw,
                cb[cy : cy + 8, cx : cx + 8] - 128.0,
                qc,
                _DC_C_CODES,
                _AC_C_CODES,
                dc_cb,
            )
            dc_cr = _encode_block(
                bw,
                cr[cy : cy + 8, cx : cx + 8] - 128.0,
                qc,
                _DC_C_CODES,
                _AC_C_CODES,
                dc_cr,
            )
    entropy = bw.flush()

    zz_ql = bytes(int(QUANT_LUMA[r, c]) for r, c in ZIGZAG)
    zz_qc = bytes(int(QUANT_CHROMA[r, c]) for r, c in ZIGZAG)
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + zz_ql)  # DQT Tq=0 (luma)
    out += _seg(0xDB, b"\x01" + zz_qc)  # DQT Tq=1 (chroma)
    # SOF0: 3 components — Y table 0 (2x2 sampling iff 4:2:0),
    # Cb & Cr 1x1 / table 1
    y_samp = b"\x22" if sub else b"\x11"
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, hp, wp, 3)
        + b"\x01" + y_samp + b"\x00"
        + b"\x02\x11\x01"
        + b"\x03\x11\x01",
    )
    out += _seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += _seg(0xC4, b"\x01" + bytes(DC_C_BITS) + bytes(DC_C_VALS))
    out += _seg(0xC4, b"\x11" + bytes(AC_C_BITS) + bytes(AC_C_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    out += _seg(0xDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"  # EOI
    if ph or pw:
        out = out[:2] + _seg(0xFE, b"crop=%dx%d" % (h, w)) + out[2:]
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_block(
    br: _BitReader,
    dc_tbl: dict[tuple[int, int], int],
    ac_tbl: dict[tuple[int, int], int],
    q: np.ndarray,
    prev_dc: int,
) -> tuple[np.ndarray, int]:
    """Huffman-decode + dequantize + IDCT one 8x8 block; returns the
    level-shifted (centered-on-0) block and the new DC predictor."""
    zz = np.zeros(64, dtype=np.int64)
    s = _read_symbol(br, dc_tbl)
    diff = _extend(br.bits(s), s) if s else 0
    prev_dc += diff
    zz[0] = prev_dc
    k = 1
    while k < 64:
        sym = _read_symbol(br, ac_tbl)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0xF
        if size == 0:
            if run != 15:
                raise ValueError("bad AC symbol")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("AC run overflow")
        zz[k] = _extend(br.bits(size), size)
        k += 1
    coef = np.zeros((8, 8), dtype=np.float64)
    coef[ZIG_ROWS, ZIG_COLS] = zz
    return _DCT.T @ (coef * q) @ _DCT, prev_dc


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def decode_color_jpeg(data: bytes) -> np.ndarray:
    """Baseline YCbCr JFIF bytes -> uint8 RGB array (h, w, 3). Supports
    the two interleaved-scan layouts real encoders emit for color:
    4:2:0 (Y 2x2, chroma 1x1) and 4:4:4 (all 1x1); honors DRI/RST0-7
    (all three DC predictors reset) and the crop COM segment. Raises
    ValueError on progressive/arithmetic modes, grayscale input (use
    decode_gray_jpeg), and other subsampling ratios."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    crop: tuple[int, int] | None = None
    restart_interval = 0
    comps: list[dict] = []  # SOF order: {cid, hs, vs, tq}
    scan: list[tuple[int, int, int]] = []  # SOS order: (cid, dc_id, ac_id)
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker in (0x01, *range(0xD0, 0xD8)):
            continue
        ln = struct.unpack(">H", data[pos : pos + 2])[0]
        body = data[pos + 2 : pos + ln]
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros((8, 8), dtype=np.int32)
                vals = body[p + 1 : p + 65]
                for i, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = vals[i]
                quant[tq] = tbl
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            _, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 3:
                raise ValueError("decode_color_jpeg wants 3 components")
            for i in range(3):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"cid": cid, "hs": samp >> 4, "vs": samp & 0xF, "tq": tq}
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG mode")
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xFE and body.startswith(b"crop="):
            ch, cw = body[5:].split(b"x")
            crop = (int(ch), int(cw))
        elif marker == 0xDA:
            ns = body[0]
            if ns != 3:
                raise ValueError("only one interleaved 3-component scan")
            for i in range(3):
                cid, ids = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cid, ids >> 4, ids & 0xF))
            pos += ln
            break
        pos += ln
    if not h or not w or len(comps) != 3:
        raise ValueError("missing SOF0")
    samplings = [(c["hs"], c["vs"]) for c in comps]
    if samplings not in ([(2, 2), (1, 1), (1, 1)], [(1, 1), (1, 1), (1, 1)]):
        raise ValueError("only 4:2:0 and 4:4:4 subsampling are decoded here")
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_cid = {c["cid"]: c for c in comps}
    order = []  # scan-order component descriptors
    for cid, dc_id, ac_id in scan:
        if cid not in by_cid:
            raise ValueError("scan references a component SOF0 did not declare")
        c = by_cid[cid]
        order.append(
            {
                "hs": c["hs"],
                "vs": c["vs"],
                "q": quant[c["tq"]].astype(np.float64),
                "dc": huff[(0, dc_id)],
                "ac": huff[(1, ac_id)],
                "plane": np.zeros(
                    (mcuy * 8 * c["vs"], mcux * 8 * c["hs"]), dtype=np.float64
                ),
            }
        )
    br = _BitReader(data, pos)
    pred = [0, 0, 0]
    mcu_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                br.restart()
                pred = [0, 0, 0]
            mcu_idx += 1
            for ci, c in enumerate(order):
                for dy in range(c["vs"]):
                    for dx in range(c["hs"]):
                        block, pred[ci] = _decode_block(
                            br, c["dc"], c["ac"], c["q"], pred[ci]
                        )
                        py = (my * c["vs"] + dy) * 8
                        px_ = (mx * c["hs"] + dx) * 8
                        c["plane"][py : py + 8, px_ : px_ + 8] = block + 128.0
    # upsample chroma to luma resolution by sample replication
    yh, yw = order[0]["plane"].shape
    planes = []
    for c in order:
        p = c["plane"]
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:yh, :yw])
    rgb = ycbcr_to_rgb(planes[0], planes[1], planes[2])
    if crop:
        return rgb[: crop[0], : crop[1]]
    return rgb[:h, :w]


def decode_gray_jpeg(data: bytes) -> np.ndarray:
    """Baseline grayscale JFIF bytes -> uint8 array (h, w). Raises
    ValueError on non-baseline / multi-component streams (those stay
    behind the library seam)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    crop: tuple[int, int] | None = None
    dc_id = ac_id = 0
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        ln = struct.unpack(">H", data[pos : pos + 2])[0]
        body = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros((8, 8), dtype=np.int32)
                vals = body[p + 1 : p + 65]
                for i, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = vals[i]
                quant[tq] = tbl
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            _, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 1:
                raise ValueError("only grayscale is decoded here")
        elif marker == 0xDE:  # DHP: would otherwise decode only stage 1
            raise ValueError(
                "hierarchical stream: use decode_gray_jpeg_hierarchical"
            )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG mode")
        elif marker == 0xC4:  # DHT (possibly several)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xFE and body.startswith(b"crop="):
            ch, cw = body[5:].split(b"x")
            crop = (int(ch), int(cw))
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != 1:
                raise ValueError("only single-scan grayscale is decoded here")
            dc_id, ac_id = body[2] >> 4, body[2] & 0xF
            pos += ln
            break
        pos += ln
    if not h or not w:
        raise ValueError("missing SOF0")
    q = quant[0].astype(np.float64)
    dc_tbl, ac_tbl = huff[(0, dc_id)], huff[(1, ac_id)]
    br = _BitReader(data, pos)
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    out = np.zeros((bh * 8, bw_ * 8), dtype=np.float64)
    prev_dc = 0
    mcu_idx = 0
    for by in range(bh):
        for bx in range(bw_):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                br.restart()
                prev_dc = 0
            mcu_idx += 1
            block, prev_dc = _decode_block(br, dc_tbl, ac_tbl, q, prev_dc)
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block + 128.0
    px = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    if crop:
        px = px[: crop[0], : crop[1]]
    else:
        px = px[:h, :w]
    return px


# --------------------------------------------------------------------------
# progressive mode (SOF2): spectral selection + successive approximation
# --------------------------------------------------------------------------

# The scan protocol is T.81 Annex G (Huffman progressive): DC-first
# scans carry point-transformed (>> Al) DC differences; DC-refinement
# scans carry one raw bit per block; AC-first scans carry per-band
# run/size symbols with EOBn end-of-band run codes; AC-refinement scans
# carry newly-significant coefficients interleaved with one correction
# bit per already-nonzero coefficient passed. Negative values refine
# through two's-complement OR exactly as integer hardware does it, so a
# progressive stream reconstructs the SAME quantized coefficients the
# baseline framing carries — the tests pin progressive decode ==
# baseline decode bit-for-bit.

# libjpeg's default grayscale scan script (jcparam.c): DC at Al=1, the
# 1..5 / 6..63 bands at Al=2, then successive refinements to full
# precision.
PROGRESSIVE_SCRIPT_GRAY = [
    (0, 0, 0, 1),
    (1, 5, 0, 2),
    (6, 63, 0, 2),
    (1, 63, 2, 1),
    (0, 0, 1, 0),
    (1, 63, 1, 0),
]


def _quantized_blocks(px: np.ndarray) -> list[np.ndarray]:
    """Level-shifted padded grayscale image -> per-block zigzag-order
    quantized coefficient vectors (row-major block order)."""
    q = QUANT_LUMA.astype(np.float64)
    out = []
    for by in range(0, px.shape[0], 8):
        for bx in range(0, px.shape[1], 8):
            block = px[by : by + 8, bx : bx + 8] - 128.0
            coef = _DCT @ block @ _DCT.T
            qc = np.rint(coef / q).astype(np.int64)
            out.append(qc[ZIG_ROWS, ZIG_COLS])
    return out


class _EobState:
    """EOBRUN accumulator + the refinement scans' buffered correction
    bits (T.81 G.1.2.3 / libjpeg's BE/BR buffers)."""

    def __init__(self, bw: _BitWriter) -> None:
        self.bw = bw
        self.eobrun = 0
        self.bits: list[int] = []

    def flush(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, length = _PROG_AC_CODES[nbits << 4]
            self.bw.put(code, length)
            if nbits:
                self.bw.put(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
        self.flush_bits()

    def flush_bits(self) -> None:
        for b in self.bits:
            self.bw.put(b, 1)
        self.bits = []


def _enc_ac_first(bw, blocks, ss, se, al, state) -> None:
    for zz in blocks:
        r = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            m = (-v if v < 0 else v) >> al
            if m == 0:
                r += 1
                continue
            state.flush()
            while r > 15:
                code, length = _PROG_AC_CODES[0xF0]
                bw.put(code, length)
                r -= 16
            s = m.bit_length()
            code, length = _PROG_AC_CODES[(r << 4) | s]
            bw.put(code, length)
            bw.put(_bits_of(m if v > 0 else -m, s), s)
            r = 0
        if r > 0:
            state.eobrun += 1
            if state.eobrun == 0x7FFF:
                state.flush()


def _enc_ac_refine(bw, blocks, ss, se, al, state) -> None:
    # mirror of the T.81 G.1.2.3 / libjpeg jcphuff protocol: the run
    # counts ONLY zero-history positions; already-significant positions
    # are transparent (one buffered correction bit each); ZRLs are
    # emitted at ANY nonzero position once the run exceeds 15 (unless
    # the run can fold into the end-of-band), with the buffered bits
    # flushed after each emitted symbol — the order the decoder's
    # inline advance consumes them in.
    for zz in blocks:
        vals = [int(v) for v in zz[ss : se + 1]]
        absv = [(-v if v < 0 else v) >> al for v in vals]
        eob = -1  # index of the LAST newly-significant coefficient
        for i, m in enumerate(absv):
            if m == 1:
                eob = i
        r = 0
        pending: list[int] = []
        for i, m in enumerate(absv):
            if m == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                state.flush()
                code, length = _PROG_AC_CODES[0xF0]
                bw.put(code, length)
                r -= 16
                for b in pending:
                    bw.put(b, 1)
                pending = []
            if m > 1:  # already significant: one correction bit
                pending.append(m & 1)
                continue
            # newly significant
            state.flush()
            code, length = _PROG_AC_CODES[(r << 4) | 1]
            bw.put(code, length)
            bw.put(1 if vals[i] >= 0 else 0, 1)
            for b in pending:
                bw.put(b, 1)
            pending = []
            r = 0
        if r > 0 or pending:
            state.eobrun += 1
            state.bits.extend(pending)
            if state.eobrun == 0x7FFF or len(state.bits) > 900:
                state.flush()


def encode_gray_jpeg_progressive(
    pixels: np.ndarray, script: list[tuple[int, int, int, int]] | None = None
) -> bytes:
    """8-bit grayscale array -> progressive (SOF2) JFIF bytes carrying
    the same quantized coefficients as encode_gray_jpeg, framed by the
    given (Ss, Se, Ah, Al) scan script (default: libjpeg's grayscale
    script)."""
    if script is None:
        script = PROGRESSIVE_SCRIPT_GRAY
    px = np.asarray(pixels)
    if px.ndim != 2:
        raise ValueError("expected a 2-D grayscale array")
    h, w = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    px = px.astype(np.float64)
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        px = np.pad(px, ((0, ph), (0, pw)), mode="edge")
    blocks = _quantized_blocks(px)

    zz_quant = bytes(int(QUANT_LUMA[r, c]) for r, c in ZIGZAG)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + zz_quant)
    out += _seg(
        0xC2, struct.pack(">BHHB", 8, px.shape[0], px.shape[1], 1) + b"\x01\x11\x00"
    )
    out += _seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xC4, b"\x10" + bytes(PROG_AC_BITS) + bytes(PROG_AC_VALS))
    for ss, se, ah, al in script:
        out += _seg(
            0xDA, b"\x01\x01\x00" + bytes((ss, se, (ah << 4) | al))
        )
        bw = _BitWriter()
        if ss == 0:  # DC scan
            if ah == 0:
                prev = 0
                for zz in blocks:
                    t = int(zz[0]) >> al  # arithmetic shift
                    diff = t - prev
                    prev = t
                    s = _size_of(diff)
                    code, length = _DC_CODES[s]
                    bw.put(code, length)
                    if s:
                        bw.put(_bits_of(diff, s), s)
            else:  # DC refinement: one raw bit per block
                for zz in blocks:
                    bw.put((int(zz[0]) >> al) & 1, 1)
        else:  # AC scan
            state = _EobState(bw)
            if ah == 0:
                _enc_ac_first(bw, blocks, ss, se, al, state)
            else:
                _enc_ac_refine(bw, blocks, ss, se, al, state)
            state.flush()
        out += bw.flush()
    out += b"\xff\xd9"
    if ph or pw:
        out = out[:2] + _seg(0xFE, b"crop=%dx%d" % (h, w)) + out[2:]
    return bytes(out)


def _dec_ac_first(br, zz, ss, se, al, ac_tbl, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_symbol(br, ac_tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run overflow")
        zz[k] = _extend(br.bits(s), s) << al
        k += 1
    return eobrun


def _dec_ac_refine(br, zz, ss, se, al, ac_tbl, eobrun) -> int:
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_symbol(br, ac_tbl)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r < 15:  # EOBn: refine the rest of this band below
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("bad refinement magnitude")
                val = p1 if br.bit() else m1
            # advance past r zero-history positions, emitting one
            # correction bit for every nonzero-history one passed
            while k <= se:
                if zz[k] != 0:
                    if br.bit() and (int(zz[k]) & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                if br.bit() and (int(zz[k]) & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def decode_progressive_jpeg(data: bytes) -> np.ndarray:
    """Progressive (SOF2) grayscale JFIF bytes -> uint8 array: folds
    every scan's spectral band / approximation bits into one coefficient
    array per block, then dequantizes + IDCTs once at the end. Raises
    ValueError on baseline input (use decode_gray_jpeg), color
    progressive, or restart intervals (not emitted for progressive
    here)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    crop: tuple[int, int] | None = None
    blocks: list[np.ndarray] | None = None
    tq = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker in (0x01, *range(0xD0, 0xD8)):
            continue
        ln = struct.unpack(">H", data[pos : pos + 2])[0]
        body = data[pos + 2 : pos + ln]
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq_ = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros((8, 8), dtype=np.int32)
                vals = body[p + 1 : p + 65]
                for i, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = vals[i]
                quant[tq_] = tbl
                p += 65
        elif marker == 0xC2:  # SOF2 progressive
            _, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 1:
                raise ValueError("only grayscale progressive is decoded here")
            tq = body[8]
            bh, bw_ = (h + 7) // 8, (w + 7) // 8
            blocks = [np.zeros(64, dtype=np.int64) for _ in range(bh * bw_)]
        elif marker == 0xC0:
            raise ValueError("baseline stream: use decode_gray_jpeg")
        elif marker == 0xDE:
            raise ValueError(
                "hierarchical stream: use decode_gray_jpeg_hierarchical"
            )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG mode")
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                huff[(tc, th)] = _build_decode_table(
                    bits, list(body[p + 17 : p + 17 + n])
                )
                p += 17 + n
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported in progressive")
        elif marker == 0xFE and body.startswith(b"crop="):
            ch, cw = body[5:].split(b"x")
            crop = (int(ch), int(cw))
        elif marker == 0xDA:
            if blocks is None:
                raise ValueError("SOS before SOF2")
            if body[0] != 1:
                raise ValueError("only single-component scans")
            dc_id, ac_id = body[2] >> 4, body[2] & 0xF
            ss, se, ahal = body[3], body[4], body[5]
            ah, al = ahal >> 4, ahal & 0xF
            br = _BitReader(data, pos + ln)
            if ss == 0:
                if se != 0:
                    raise ValueError("DC scan must have Se=0")
                if ah == 0:
                    prev = 0
                    dc_tbl = huff[(0, dc_id)]
                    for zz in blocks:
                        s = _read_symbol(br, dc_tbl)
                        diff = _extend(br.bits(s), s) if s else 0
                        prev += diff
                        zz[0] = prev << al
                else:
                    p1 = 1 << al
                    for zz in blocks:
                        if br.bit():
                            zz[0] |= p1
            else:
                ac_tbl = huff[(1, ac_id)]
                eobrun = 0
                for zz in blocks:
                    if ah == 0:
                        eobrun = _dec_ac_first(br, zz, ss, se, al, ac_tbl, eobrun)
                    else:
                        eobrun = _dec_ac_refine(br, zz, ss, se, al, ac_tbl, eobrun)
            # resume header parsing at the next marker after this scan's
            # entropy bytes (skip stuffed FF00s and fill FFs)
            pos = br.pos
            while pos + 1 < len(data) and not (
                data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF)
            ):
                pos += 1
            continue
        pos += ln
    if blocks is None or not h or not w:
        raise ValueError("missing SOF2")
    q = quant[tq].astype(np.float64)
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    out = np.zeros((bh * 8, bw_ * 8), dtype=np.float64)
    i = 0
    for by in range(bh):
        for bx in range(bw_):
            coef = np.zeros((8, 8), dtype=np.float64)
            coef[ZIG_ROWS, ZIG_COLS] = blocks[i]
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _DCT.T @ (coef * q) @ _DCT + 128.0
            )
            i += 1
    px = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    if crop:
        return px[: crop[0], : crop[1]]
    return px[:h, :w]


# --------------------------------------------------------------------------
# Huffman table construction (T.81 Annex K.2, Figures K.9-K.12)
# --------------------------------------------------------------------------

# Progressive AC scans emit EOBn symbols (0x10..0xE0) that the Annex K
# baseline tables do not define (the K.3 AC table's Kraft slack is one
# 2^-16 slot — no room to extend it), which is why libjpeg always
# custom-builds Huffman tables for progressive output. This is the
# spec's own construction: pair-merge by frequency with the reserved
# 257th symbol (keeps the all-ones code unused, T.81 K.2), the BITS
# 16-bit-cap adjustment, and symbols ordered by (code length, value).


def _gen_huffman_table(freq_map: dict[int, int]) -> tuple[list[int], list[int]]:
    """frequencies -> (BITS[16], HUFFVAL) per the K.2 procedure."""
    freq = [0] * 257
    for sym, f in freq_map.items():
        freq[sym] = f
    freq[256] = 1  # reserved: guarantees the all-ones code stays unused
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        c1, v = -1, None
        for i in range(257):
            if freq[i] > 0 and (v is None or freq[i] <= v):
                v, c1 = freq[i], i
        c2, v = -1, None
        for i in range(257):
            if freq[i] > 0 and i != c1 and (v is None or freq[i] <= v):
                v, c2 = freq[i], i
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    # cap code lengths at 16 (Figure K.12's adjustment)
    for i in range(32, 16, -1):
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # remove the reserved symbol's slot
    huffval = [
        s
        for size in range(1, 17)
        for s in sorted(k for k in range(256) if codesize[k] == size)
    ]
    return bits[1:17], huffval


def _progressive_ac_freqs() -> dict[int, int]:
    """Static synthetic frequencies shaping the fixed progressive AC
    table: EOB0 and small run/size symbols short, EOBn and deep-run
    symbols present but longer. Deterministic — one fixed table, always
    transmitted in the stream's DHT."""
    freqs = {0x00: 2000, 0xF0: 60}
    for r in range(1, 15):
        freqs[r << 4] = max(2, 400 >> r)  # EOBn
    for r in range(16):
        for s in range(1, 15):
            freqs[(r << 4) | s] = max(1, 1200 >> (s + max(0, r - 1)))
    return freqs


PROG_AC_BITS, PROG_AC_VALS = _gen_huffman_table(_progressive_ac_freqs())
_PROG_AC_CODES = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)


# --------------------------------------------------------------------------
# hierarchical mode (Annex J): DHP pyramid, EXP expansion, differential
# frames (SOF5)
# --------------------------------------------------------------------------

# T.81's third and least-implemented Huffman mode: the image is coded as
# a resolution pyramid — one ordinary (non-differential) frame at the
# smallest scale, then per stage an EXP marker doubles the reference
# resolution (the J.1.1.3 bilinear filter) and a DIFFERENTIAL frame
# (SOF5) codes `source − upsampled reference` with the ordinary DCT
# machinery, two changes only: no level shift (the signal is already
# centered on 0) and no DC prediction across blocks (the difference
# field has no DC continuity to exploit — each block's quantized DC is
# coded against a zero predictor). Stream state (DQT/DHT) persists
# across frames per B.2/B.3, so the tables are emitted once before the
# first frame. The DHP segment (B.3.2) carries the full-resolution
# frame header up front.
#
# Rounding parity: the encoder tracks its own reconstruction with the
# exact float expressions the decoder evaluates (same matmuls, same
# order, same rint), so `decode == encoder-predicted recon` is pinned
# EXACTLY in tests, not within a tolerance — the same policy as the
# progressive mode's bit-parity pin.


def downsample2(px: np.ndarray) -> np.ndarray:
    """Encoder-side pyramid step: 2x2 integer mean (round-half-up),
    odd edges replicated. The downsampling filter is explicitly the
    encoder's choice in Annex J (only the UPSAMPLING filter is
    normative); a plain mean keeps it integer-exact."""
    p = np.asarray(px).astype(np.int64)
    if p.shape[0] % 2:
        p = np.vstack([p, p[-1:]])
    if p.shape[1] % 2:
        p = np.hstack([p, p[:, -1:]])
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2] + 2) >> 2


def upsample2x(ref: np.ndarray) -> np.ndarray:
    """The NORMATIVE Annex J.1.1.3 expansion filter, both directions:
    even output samples copy the input, odd ones are the rounded mean
    of their neighbors, the final odd sample replicates the edge.
    Separable (horizontal then vertical), all-integer."""
    r = np.asarray(ref).astype(np.int64)
    h, w = r.shape
    hx = np.zeros((h, 2 * w), dtype=np.int64)
    hx[:, 0::2] = r
    if w > 1:
        hx[:, 1:-1:2] = (r[:, :-1] + r[:, 1:] + 1) >> 1
    hx[:, -1] = r[:, -1]
    out = np.zeros((2 * h, 2 * w), dtype=np.int64)
    out[0::2] = hx
    if h > 1:
        out[1:-1:2] = (hx[:-1] + hx[1:] + 1) >> 1
    out[-1] = hx[-1]
    return out


def _emit_zz(
    bw: _BitWriter,
    zz: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    prev_dc: int,
) -> int:
    """Huffman-emit one pre-quantized zigzag vector (the tail of
    _encode_block, split out because hierarchical frames quantize and
    reconstruct in one pass)."""
    diff = int(zz[0]) - prev_dc
    s = _size_of(diff)
    code, length = dc_codes[s]
    bw.put(code, length)
    if s:
        bw.put(_bits_of(diff, s), s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]
            bw.put(code, length)
            run -= 16
        s = _size_of(v)
        code, length = ac_codes[(run << 4) | s]
        bw.put(code, length)
        bw.put(_bits_of(v, s), s)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]
        bw.put(code, length)
    return int(zz[0])


def _hier_frame(img: np.ndarray, shift: float) -> tuple[list[np.ndarray], np.ndarray]:
    """Quantize one frame's blocks and predict the decoder's spatial
    reconstruction with the decoder's own float expressions. Returns
    (zigzag vectors in block order, rint'ed reconstruction cropped to
    the frame dims — NOT clipped; the caller applies the stage rule)."""
    h, w = img.shape
    px = img.astype(np.float64)
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        px = np.pad(px, ((0, ph), (0, pw)), mode="edge")
    q = QUANT_LUMA.astype(np.float64)
    zzs: list[np.ndarray] = []
    recon = np.zeros_like(px)
    for by in range(0, px.shape[0], 8):
        for bx in range(0, px.shape[1], 8):
            block = px[by : by + 8, bx : bx + 8] - shift
            coef = _DCT @ block @ _DCT.T
            qc = np.rint(coef / q).astype(np.int64)
            zzs.append(qc[ZIG_ROWS, ZIG_COLS])
            # decoder expression order, exactly: IDCT of (int coeffs * q),
            # plus the shift, rint'ed by the caller's stage rule
            coef2 = np.zeros((8, 8), dtype=np.float64)
            coef2[ZIG_ROWS, ZIG_COLS] = zzs[-1]
            recon[by : by + 8, bx : bx + 8] = _DCT.T @ (coef2 * q) @ _DCT + shift
    return zzs, np.rint(recon[:h, :w]).astype(np.int64)


def encode_gray_jpeg_hierarchical(pixels: np.ndarray, levels: int = 2) -> bytes:
    """8-bit grayscale array -> hierarchical (Annex J) JFIF bytes:
    SOI, DHP (full dims), tables once, then the pyramid — one SOF0
    frame at 1/2^(levels-1) scale and `levels-1` EXP+SOF5 differential
    stages back up to full resolution."""
    px = np.asarray(pixels)
    if px.ndim != 2:
        raise ValueError("expected a 2-D grayscale array")
    if px.shape[0] == 0 or px.shape[1] == 0:
        raise ValueError("empty image")
    if levels < 2:
        raise ValueError("hierarchical mode needs >= 2 levels")
    pyr = [px.astype(np.int64)]
    for _ in range(levels - 1):
        pyr.append(downsample2(pyr[-1]))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(
        0xDE,  # DHP: frame-header layout, full resolution (B.3.2)
        struct.pack(">BHHB", 8, px.shape[0], px.shape[1], 1) + b"\x01\x11\x00",
    )
    zz_quant = bytes(int(QUANT_LUMA[r, c]) for r, c in ZIGZAG)
    out += _seg(0xDB, b"\x00" + zz_quant)
    out += _seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))

    recon: np.ndarray | None = None
    for k in reversed(range(levels)):
        img = pyr[k]
        differential = recon is not None
        if differential:
            ref = upsample2x(recon)[: img.shape[0], : img.shape[1]]
            zzs, drec = _hier_frame(img - ref, shift=0.0)
            recon = np.clip(ref + drec, 0, 255)
            out += _seg(0xDF, b"\x11")  # EXP: expand reference 2x both ways
            sof = 0xC5  # differential sequential DCT, Huffman
        else:
            zzs, srec = _hier_frame(img, shift=128.0)
            recon = np.clip(srec, 0, 255)
            sof = 0xC0
        out += _seg(
            sof,
            struct.pack(">BHHB", 8, img.shape[0], img.shape[1], 1)
            + b"\x01\x11\x00",
        )
        out += _seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
        bw = _BitWriter()
        prev = 0
        for zz in zzs:
            new_dc = _emit_zz(bw, zz, _DC_CODES, _AC_CODES, prev)
            # differential frames: zero DC predictor per block (Annex J)
            prev = 0 if differential else new_dc
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def decode_gray_jpeg_hierarchical(
    data: bytes, max_stages: int | None = None
) -> np.ndarray:
    """Hierarchical (Annex J) grayscale bytes -> uint8 array. With
    ``max_stages=n`` decoding stops after n frames and returns that
    stage's reconstruction — the progressive-transmission property the
    mode exists for (stage 1 alone is a valid low-resolution image)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    full: tuple[int, int] | None = None
    frame: tuple[int, int, bool] | None = None  # (h, w, differential)
    pending_exp = False
    recon: np.ndarray | None = None
    stages = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker in (0x01, *range(0xD0, 0xD8)):
            continue
        ln = struct.unpack(">H", data[pos : pos + 2])[0]
        body = data[pos + 2 : pos + ln]
        if marker == 0xDE:  # DHP
            _, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 1:
                raise ValueError("only grayscale hierarchical is decoded here")
            full = (fh, fw)
        elif marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for i, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = body[p + 1 + i]
                quant[tq] = tbl
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                huff[(tc, th)] = _build_decode_table(
                    bits, list(body[p + 17 : p + 17 + n])
                )
                p += 17 + n
        elif marker == 0xDF:  # EXP
            if body[0] != 0x11:
                raise ValueError("only 2x/2x reference expansion supported")
            pending_exp = True
        elif marker in (0xC0, 0xC5):
            _, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 1:
                raise ValueError("only grayscale hierarchical is decoded here")
            frame = (fh, fw, marker == 0xC5)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported frame type in hierarchical stream")
        elif marker == 0xDA:
            if frame is None or full is None:
                raise ValueError("SOS before DHP/SOF")
            fh, fw, differential = frame
            dc_tbl = huff[(0, body[2] >> 4)]
            ac_tbl = huff[(1, body[2] & 0xF)]
            q = quant[0].astype(np.float64)
            br = _BitReader(data, pos + ln)
            bh, bw_ = (fh + 7) // 8, (fw + 7) // 8
            out = np.zeros((bh * 8, bw_ * 8), dtype=np.float64)
            prev = 0
            for by in range(bh):
                for bx in range(bw_):
                    block, prev = _decode_block(br, dc_tbl, ac_tbl, q, prev)
                    if differential:
                        prev = 0  # zero DC predictor per block (Annex J)
                    else:
                        block = block + 128.0
                    out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
            fpx = np.rint(out[:fh, :fw]).astype(np.int64)
            if differential:
                if recon is None:
                    raise ValueError("differential frame before first stage")
                ref = upsample2x(recon) if pending_exp else recon
                recon = np.clip(ref[:fh, :fw] + fpx, 0, 255)
                pending_exp = False
            else:
                recon = np.clip(fpx, 0, 255)
            stages += 1
            if max_stages is not None and stages >= max_stages:
                return recon.astype(np.uint8)
            # resync to the next marker past this frame's entropy bytes
            pos = br.pos
            while pos + 1 < len(data) and not (
                data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF)
            ):
                pos += 1
            continue
        pos += ln
    if recon is None:
        raise ValueError("no frame decoded")
    return recon.astype(np.uint8)
