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


# --------------------------------------------------------------------------
# batch (lockstep-vectorized) encode/decode — bit-identical to the
# sequential reference implementations above
# --------------------------------------------------------------------------
#
# The per-sample recurrences above are inherently sequential WITHIN one
# signal (encode: the step index walks sample to sample) or one block
# (decode: the predictor chases the nibbles), but they are independent
# ACROSS signals (encode: every signal starts at index 0) and ACROSS
# blocks (decode: each block header carries its own predictor + index).
# The hot path (adpcm_codec_stats over an Arrow batch of documents) was
# paying ~10 python ops per sample; these run the same recurrence in
# lockstep over the whole batch — one numpy step per sample POSITION,
# vector width = all signals (or all blocks) at once. Same arithmetic,
# same clamps, same tables: outputs are byte-identical (pinned in
# tests/test_adpcm_codec.py against the sequential path).

_STEPS_NP = np.array(STEP_TABLE, dtype=np.int32)
_IDXADJ_NP = np.array(INDEX_TABLE, dtype=np.int32)


def encode_ima_adpcm_batch(
    signals: list[np.ndarray], sample_rate: int = 8000
) -> list[bytes]:
    """Encode many int16 mono signals at once; returns one fmt-0x0011
    RIFF/WAVE payload per signal, byte-identical to encode_ima_adpcm."""
    sigs = [np.asarray(s, dtype=np.int16) for s in signals]
    if not sigs:
        return []
    for s in sigs:
        if s.ndim != 1:
            raise ValueError("expected mono int16 samples")
        if len(s) == 0:
            raise ValueError("empty signal")
    ns = np.array([len(s) for s in sigs])
    width, horizon = len(sigs), int(ns.max())
    spb = (_BLOCK_ALIGN - 4) * 2 + 1
    sm = np.zeros((width, horizon), dtype=np.int32)
    for k, s in enumerate(sigs):
        sm[k, : len(s)] = s
    pred = np.zeros(width, dtype=np.int32)
    index = np.zeros(width, dtype=np.int32)
    codes = np.zeros((width, horizon), dtype=np.uint8)
    hdr_pred: list[np.ndarray] = []
    hdr_index: list[np.ndarray] = []
    for t in range(horizon):
        if t % spb == 0:
            # block start: predictor seeds from the sample, index carries
            pred = sm[:, t].copy()
            hdr_pred.append(pred.copy())
            hdr_index.append(index.copy())
            continue
        step = _STEPS_NP[index]
        diff = sm[:, t] - pred
        sign = diff < 0
        adiff = np.abs(diff)
        diffq = step >> 3
        ge4 = adiff >= step
        adiff -= step * ge4
        diffq += step * ge4
        half = step >> 1
        ge2 = adiff >= half
        adiff -= half * ge2
        diffq += half * ge2
        quarter = step >> 2
        ge1 = adiff >= quarter
        diffq += quarter * ge1
        pred = np.clip(
            np.where(sign, pred - diffq, pred + diffq), -32768, 32767
        )
        delta = 4 * ge4 + 2 * ge2 + 1 * ge1
        index = np.clip(index + _IDXADJ_NP[delta], 0, 88)
        codes[:, t] = (delta + 8 * sign).astype(np.uint8)
    # assembly (cheap: a few blocks per signal)
    out: list[bytes] = []
    for k, s in enumerate(sigs):
        n = len(s)
        blocks = bytearray()
        for b, b0 in enumerate(range(0, n, spb)):
            blocks += struct.pack(
                "<hBB", int(hdr_pred[b][k]), int(hdr_index[b][k]), 0
            )
            nib = codes[k, b0 + 1 : min(b0 + spb, n)]
            if len(nib) % 2:
                nib = np.concatenate([nib, np.zeros(1, dtype=np.uint8)])
            packed = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8)
            blocks += packed.tobytes()
            blocks += b"\x00" * (_BLOCK_ALIGN - 4 - len(packed))
        data = bytes(blocks)
        byte_rate = sample_rate * _BLOCK_ALIGN // spb
        fmt = struct.pack(
            "<HHIIHHHH", 0x0011, 1, sample_rate, byte_rate, _BLOCK_ALIGN, 4, 2, spb
        )
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, n)
            + b"data" + struct.pack("<I", len(data)) + data
        )
        out.append(b"RIFF" + struct.pack("<I", len(body)) + body)
    return out


def decode_ima_adpcm_batch(payloads: list[bytes]) -> list[np.ndarray]:
    """Decode many fmt-0x0011 payloads at once, lockstep across ALL
    blocks of all payloads; sample-identical to decode_ima_adpcm.
    Requires a uniform block align across the batch (ours is fixed);
    falls back to the sequential decoder on mixed-align input."""
    if not payloads:
        return []
    parsed = []  # (n_samples, spb, block_align, [block bytes])
    aligns = set()
    for wav in payloads:
        if wav[:4] != b"RIFF" or wav[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE stream")
        pos, fmt, n_samples, data = 12, None, None, None
        while pos + 8 <= len(wav):
            cid = wav[pos : pos + 4]
            ln = struct.unpack("<I", wav[pos + 4 : pos + 8])[0]
            if pos + 8 + ln > len(wav):
                raise ValueError("truncated chunk")
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
        if tag != 0x0011 or channels != 1:
            raise ValueError("not mono IMA ADPCM")
        spb = struct.unpack("<H", fmt[18:20])[0] if len(fmt) >= 20 else (
            (block_align - 4) * 2 + 1
        )
        parsed.append((n_samples, spb, block_align, data))
        aligns.add((block_align, spb))
    if len(aligns) != 1:
        return [decode_ima_adpcm(w) for w in payloads]
    block_align, spb = aligns.pop()
    # gather every FULL block of every payload into one matrix; short
    # final blocks (possible in third-party files) go to the sequential
    # path per payload — our encoder always pads to the full align
    rows: list[bytes] = []
    owners: list[int] = []  # payload index per block, in payload order
    seq_fallback: set[int] = set()
    for p, (_, pspb, _, data) in enumerate(parsed):
        if len(data) % block_align and len(data) % block_align < 4:
            seq_fallback.add(p)
            continue
        for b0 in range(0, len(data), block_align):
            block = data[b0 : b0 + block_align]
            if len(block) < block_align:
                seq_fallback.add(p)
                rows = [r for r, o in zip(rows, owners) if o != p]
                owners = [o for o in owners if o != p]
                break
            rows.append(block)
            owners.append(p)
    outs: dict[int, np.ndarray] = {}
    if rows:
        mat = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(
            len(rows), block_align
        )
        hdr = mat[:, :4]
        pred = (
            hdr[:, 0].astype(np.int32) | (hdr[:, 1].astype(np.int32) << 8)
        )
        pred = np.where(pred >= 32768, pred - 65536, pred)
        index = np.clip(hdr[:, 2].astype(np.int32), 0, 88)
        nbytes = block_align - 4
        body = mat[:, 4:]
        nib = np.empty((len(rows), nbytes * 2), dtype=np.uint8)
        nib[:, 0::2] = body & 0xF
        nib[:, 1::2] = body >> 4
        n_positions = min(spb - 1, nbytes * 2)
        samples = np.empty((len(rows), 1 + n_positions), dtype=np.int32)
        samples[:, 0] = pred
        for t in range(n_positions):
            code = nib[:, t].astype(np.int32)
            step = _STEPS_NP[index]
            diffq = (
                (step >> 3)
                + np.where(code & 4, step, 0)
                + np.where(code & 2, step >> 1, 0)
                + np.where(code & 1, step >> 2, 0)
            )
            pred = np.clip(
                np.where(code & 8, pred - diffq, pred + diffq),
                -32768,
                32767,
            )
            index = np.clip(index + _IDXADJ_NP[code & 7], 0, 88)
            samples[:, t + 1] = pred
        owners_arr = np.array(owners)
        for p in set(owners):
            n_samples = parsed[p][0]
            flat = samples[owners_arr == p].ravel()
            if n_samples is None:
                full, rem = divmod(len(parsed[p][3]), block_align)
                n_samples = full * spb + (
                    min(spb, 1 + (rem - 4) * 2) if rem >= 4 else 0
                )
            outs[p] = flat[:n_samples].astype(np.int16)
    for p in range(len(payloads)):
        if p in seq_fallback or p not in outs:
            outs[p] = decode_ima_adpcm(payloads[p])
    return [outs[p] for p in range(len(payloads))]
