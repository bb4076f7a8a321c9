"""Content-defined chunking (Buzhash CDC), pure stdlib — byte-grain
dedup for binary payloads.

Text dedup (MinHash/SimHash/spans) and image dedup (dHash) find
SEMANTIC duplicates; storage-grain pipelines additionally dedup the
BYTES of large binary artifacts (media files, shards, model
checkpoints) where a single insertion shifts every downstream offset.
Fixed-size blocking loses all alignment after one inserted byte;
content-defined chunking cuts where a rolling hash of the last W bytes
hits a boundary pattern, so chunk boundaries RE-SYNC right after any
local edit and the unchanged remainder deduplicates — the rsync /
LBFS (Muthitacharoen et al., SOSP 2001) / restic/borg design.

Rolling hash: Buzhash (cyclic polynomial): with rotl1 the 1-bit left
rotation and T a fixed byte->64-bit table,

    H(b_1..b_w)       = rotl_{w-1}(T[b_1]) ^ ... ^ rotl_1(T[b_{w-1}]) ^ T[b_w]
    H(next window)    = rotl1(H) ^ rotl_w(T[b_out]) ^ T[b_in]

O(1) per byte, integer-exact everywhere. T derives from md5(i) per byte
value — fixed, no runtime randomness (the repo rule).

A boundary falls after byte i when (H & mask) == 0, subject to
min_size/max_size clamps (min suppresses tiny chunks from dense
boundary patterns; max forces progress through boundary-free regions —
both standard). Expected chunk size ~ 2^mask_bits + min_size.
"""

from __future__ import annotations

import hashlib

_W = 48  # rolling window bytes


def _table() -> list[int]:
    t = []
    for i in range(256):
        t.append(int.from_bytes(hashlib.md5(b"buz-v1:%d" % i).digest()[:8], "big"))
    return t


_T = _table()
_MASK64 = (1 << 64) - 1


def _rotl(v: int, k: int) -> int:
    k &= 63
    return ((v << k) | (v >> (64 - k))) & _MASK64


def chunk_boundaries(
    data: bytes,
    mask_bits: int = 11,
    min_size: int = 256,
    max_size: int = 8192,
) -> list[int]:
    """End offsets (exclusive) of every chunk of ``data``; the last
    offset is always len(data). Deterministic in the bytes alone —
    the CONTENT decides the cuts, which is the whole point."""
    n = len(data)
    if n == 0:
        return []
    mask = (1 << mask_bits) - 1
    out: list[int] = []
    start = 0
    h = 0
    rot_w = _W & 63
    for i in range(n):
        b = data[i]
        if i - start < _W:
            # growing window: fold the new byte in
            h = (_rotl(h, 1) ^ _T[b]) & _MASK64
        else:
            h = (_rotl(h, 1) ^ _rotl(_T[data[i - _W]], rot_w) ^ _T[b]) & _MASK64
        size = i - start + 1
        if (size >= min_size and (h & mask) == 0) or size >= max_size:
            out.append(i + 1)
            start = i + 1
            h = 0
    if start < n:
        out.append(n)
    return out


def chunk_payload(
    data: bytes,
    mask_bits: int = 11,
    min_size: int = 256,
    max_size: int = 8192,
) -> list[tuple[int, int, str]]:
    """(offset, length, sha256) per chunk."""
    ends = chunk_boundaries(data, mask_bits, min_size, max_size)
    out = []
    start = 0
    for e in ends:
        out.append((start, e - start, hashlib.sha256(data[start:e]).hexdigest()))
        start = e
    return out
