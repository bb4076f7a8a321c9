"""IMA ADPCM (DVI4) audio codec, pure stdlib + numpy — a real
compressed-audio leg next to the PCM-WAV path (media_codec.py) and the
JPEG family (jpeg_codec.py).

IMA ADPCM is the standard 4-bits-per-sample adaptive-differential codec
(IMA Digital Audio Focus Group recommendation, 1992; RIFF WAVE format
tag 0x0011): each sample is coded as a sign + 3-bit quantized delta
against a running predictor, with the quantizer step walked up/down a
fixed 89-entry table by a fixed index table. 4:1 compression vs 16-bit
PCM. Everything is INTEGER arithmetic — unlike the float-DCT JPEG leg,
encode and decode are bit-exact by construction on every platform, so
tests pin absolute values, not bounds, and the decoder here decodes any
conformant mono fmt-0x0011 WAV (blocks of any align).

Container: standard RIFF/WAVE with wFormatTag=0x0011, the 2-byte
cbSize extension carrying wSamplesPerBlock, a `fact` chunk with the true
sample count, and the per-block 4-byte state header (predictor int16,
step index uint8, reserved) followed by low-nibble-first codes — the
exact layout Microsoft's ADPCM-in-WAV spec fixes.
"""

from __future__ import annotations

import struct

import numpy as np

# the 89-entry step-size table and the 8-entry index-adjust table fixed
# by the IMA recommendation (identical in every implementation)
STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]

_BLOCK_ALIGN = 256  # bytes per block -> (256 - 4) * 2 + 1 = 505 samples


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _encode_sample(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """One sample -> (4-bit code, new predictor, new index). The
    magnitude bits are chosen by the standard successive comparison,
    which reconstructs the quantized diff on the fly so encoder and
    decoder predictors stay in lockstep."""
    step = STEP_TABLE[index]
    diff = sample - pred
    code = 8 if diff < 0 else 0
    if code:
        diff = -diff
    delta = 0
    diffq = step >> 3
    if diff >= step:
        delta = 4
        diff -= step
        diffq += step
    if diff >= step >> 1:
        delta |= 2
        diff -= step >> 1
        diffq += step >> 1
    if diff >= step >> 2:
        delta |= 1
        diffq += step >> 2
    pred = _clamp16(pred - diffq if code else pred + diffq)
    index = min(88, max(0, index + INDEX_TABLE[delta]))
    return code | delta, pred, index


def _decode_nibble(code: int, pred: int, index: int) -> tuple[int, int]:
    step = STEP_TABLE[index]
    diffq = step >> 3
    if code & 4:
        diffq += step
    if code & 2:
        diffq += step >> 1
    if code & 1:
        diffq += step >> 2
    pred = _clamp16(pred - diffq if code & 8 else pred + diffq)
    index = min(88, max(0, index + INDEX_TABLE[code & 7]))
    return pred, index


def encode_ima_adpcm(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples -> fmt-0x0011 RIFF/WAVE bytes (4:1)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim != 1:
        raise ValueError("expected mono int16 samples")
    n = len(s)
    if n == 0:
        raise ValueError("empty signal")
    spb = (_BLOCK_ALIGN - 4) * 2 + 1  # samples per block
    blocks = bytearray()
    index = 0
    for b0 in range(0, n, spb):
        chunk = s[b0 : b0 + spb]
        pred = int(chunk[0])
        blocks += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for v in chunk[1:]:
            code, pred, index = _encode_sample(int(v), pred, index)
            nibbles.append(code)
        if len(nibbles) % 2:
            nibbles.append(0)  # pad nibble (beyond the true sample count)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            blocks.append(lo | (hi << 4))
        # pad the final block to the fixed align (decoders use `fact`)
        blocks += b"\x00" * (_BLOCK_ALIGN - 4 - len(nibbles) // 2)
    data = bytes(blocks)
    byte_rate = sample_rate * _BLOCK_ALIGN // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, 1, sample_rate, byte_rate, _BLOCK_ALIGN, 4, 2, spb
    )
    out = bytearray(b"RIFF")
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    out += struct.pack("<I", len(body)) + body
    return bytes(out)


def decode_ima_adpcm(wav: bytes) -> np.ndarray:
    """fmt-0x0011 mono RIFF/WAVE bytes -> int16 samples (honors the
    `fact` sample count; when `fact` is absent — it is optional for
    conformant third-party files — the count derives from the data
    length and block geometry so final-block pad nibbles never leak
    into the output; raises ValueError on PCM/stereo/other tags and on
    chunk lengths running past the buffer)."""
    if wav[:4] != b"RIFF" or wav[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    n_samples = None
    data = None
    while pos + 8 <= len(wav):
        cid = wav[pos : pos + 4]
        ln = struct.unpack("<I", wav[pos + 4 : pos + 8])[0]
        if pos + 8 + ln > len(wav):
            raise ValueError(
                f"truncated {cid!r} chunk: declares {ln} bytes, "
                f"{len(wav) - pos - 8} remain"
            )
        body = wav[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact":
            n_samples = struct.unpack("<I", body[:4])[0]
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, _, _, block_align = struct.unpack("<HHIIH", fmt[:14])
    if tag != 0x0011:
        raise ValueError("not IMA ADPCM (fmt tag 0x0011)")
    if channels != 1:
        raise ValueError("only mono is decoded here")
    spb = struct.unpack("<H", fmt[18:20])[0] if len(fmt) >= 20 else (
        (block_align - 4) * 2 + 1
    )
    out: list[int] = []
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        if len(block) < 4:
            break
        pred, index, _ = struct.unpack("<hBB", block[:4])
        index = min(88, max(0, index))
        out.append(pred)
        produced = 1
        for byte in block[4:]:
            for code in (byte & 0xF, byte >> 4):
                if produced >= spb:
                    break
                pred, index = _decode_nibble(code, pred, index)
                out.append(pred)
                produced += 1
    arr = np.array(out, dtype=np.int16)
    if n_samples is None:
        # fact is optional: derive the count from block geometry. Full
        # blocks carry exactly spb samples; a short final block carries
        # 1 (header predictor) + 2 nibbles per data byte. The trailing
        # pad nibble of an even-length signal is indistinguishable
        # without fact — that ambiguity is inherent to the container.
        full, rem = divmod(len(data), block_align)
        n_samples = full * spb + (min(spb, 1 + (rem - 4) * 2) if rem >= 4 else 0)
    return arr[:n_samples]
