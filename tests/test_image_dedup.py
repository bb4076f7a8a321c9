"""Perceptual image near-dup (operators/image_dedup.py): every Spark
fingerprint matches a pure-python replica of decode+resample+dhash, the
recompressed re-crawl variants hash IDENTICALLY to their base (the case
payload-sha dedup misses), the blocked pair search equals brute force,
and the planted variants pair with their bases."""

from __future__ import annotations

import zlib

import numpy as np

from cc_mapreducer_spark.operators.image_dedup import (
    HAMMING_MAX,
    base_image,
    dhash64,
    image_dhash_fingerprint,
    image_near_dup_pairs,
    image_table,
)

SF_ORACLE = "/root/testdata/sf0.001"


def _replica_decode(png: bytes) -> list[list[int]]:
    """Independent minimal PNG reader for the fixture's own layout
    (8-bit gray, filter None per scanline) — stdlib only, no numpy, no
    reuse of media_codec."""
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, w, h = 8, b"", None, None
    while pos + 8 <= len(png):
        ln = int.from_bytes(png[pos : pos + 4], "big")
        typ = png[pos + 4 : pos + 8]
        body = png[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
        elif typ == b"IDAT":
            idat += body
        pos += 12 + ln
    raster = zlib.decompress(idat)
    out = []
    for y in range(h):
        row = raster[y * (w + 1) : (y + 1) * (w + 1)]
        assert row[0] == 0  # fixture uses filter None
        out.append(list(row[1:]))
    return out


def _replica_dhash(px: list[list[int]]) -> int:
    """Pure-python dHash replica (independent of the numpy operator)."""
    h, w = len(px), len(px[0])
    if h < 8:
        px = [row for row in px for _ in range(-(-8 // h))]
        h = len(px)
    if w < 9:
        px = [[v for v in row for _ in range(-(-9 // w))] for row in px]
        w = len(px[0])
    ys = [j * h // 8 for j in range(9)]
    xs = [i * w // 9 for i in range(10)]
    bits = 0
    for j in range(8):
        cells = []
        for i in range(9):
            s = n = 0
            for y in range(ys[j], ys[j + 1]):
                for x in range(xs[i], xs[i + 1]):
                    s += px[y][x]
                    n += 1
            cells.append(s // n)
        for i in range(8):
            if cells[i] < cells[i + 1]:
                bits |= 1 << (j * 8 + i)
    return bits


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= 1 << 63 else u


def test_fingerprints_match_pure_python_replica(spark):
    imgs = {r["img_id"]: r for r in image_table(spark, SF_ORACLE).collect()}
    fps = {
        r["img_id"]: r
        for r in image_dhash_fingerprint(spark, SF_ORACLE).collect()
    }
    assert set(fps) == set(imgs) and len(fps) >= 50
    for img_id, r in fps.items():
        px = _replica_decode(bytes(imgs[img_id]["payload"]))
        assert (r["height"], r["width"]) == (len(px), len(px[0]))
        assert r["dhash"] == _signed(_replica_dhash(px))


def test_recompressed_variant_hashes_identically(spark):
    fps = image_dhash_fingerprint(spark, SF_ORACLE).collect()
    by_doc: dict = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], {})[r["variant"]] = r
    n_rc = n_ed = 0
    for doc_id, d in by_doc.items():
        if "recompress" in d:
            # different payload bytes, same pixels -> EXACT same dhash
            assert d["recompress"]["dhash"] == d["base"]["dhash"]
            n_rc += 1
        if "edited" in d:
            # one bumped pixel moves at most a few gradient bits
            ham = bin(
                (d["edited"]["dhash"] ^ d["base"]["dhash"]) & ((1 << 64) - 1)
            ).count("1")
            assert ham <= HAMMING_MAX
            n_ed += 1
    assert n_rc >= 3 and n_ed >= 3  # the plants actually exist


def test_blocked_pairs_equal_brute_force(spark):
    fps = image_dhash_fingerprint(spark, SF_ORACLE).collect()
    u64 = {r["img_id"]: r["dhash"] & ((1 << 64) - 1) for r in fps}
    ids = sorted(u64)
    expect = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(u64[a] ^ u64[b]).count("1") <= HAMMING_MAX:
                expect.add((a, b))
    got = {
        (r["img_a"], r["img_b"]): r["hamming"]
        for r in image_near_dup_pairs(spark, SF_ORACLE).collect()
    }
    assert set(got) == expect
    for (a, b), ham in got.items():
        assert ham == bin(u64[a] ^ u64[b]).count("1")
    # every planted recompression pairs with its base at distance 0
    for r in fps:
        if r["variant"] == "recompress":
            base_id = r["doc_id"] * 10
            assert got.get((base_id, r["img_id"])) == 0


def test_dhash_locality_on_synthetic_edits():
    """Unit-level: dHash is invariant to re-encoding and local under a
    single-pixel edit, but far apart for unrelated images."""
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (20, 30)).astype(np.uint8)
    assert dhash64(px) == dhash64(px.copy())
    px2 = px.copy()
    px2[7, 11] = min(255, int(px2[7, 11]) + 16)
    assert bin(dhash64(px) ^ dhash64(px2)).count("1") <= 4
    other = rng.randint(0, 256, (20, 30)).astype(np.uint8)
    assert bin(dhash64(px) ^ dhash64(other)).count("1") > HAMMING_MAX


def test_base_image_requires_text():
    assert base_image(1, "", 0) is None


def test_clusters_match_union_find_replica(spark):
    """image_dup_clusters equals a python union-find over the replica
    pair set: same components, min-id cluster ids, keeper = cluster
    min; every recompressed/edited re-crawl that paired with its base
    is a drop, never a keeper."""
    from cc_mapreducer_spark.operators.image_dedup import image_dup_clusters

    fps = image_dhash_fingerprint(spark, SF_ORACLE).collect()
    u64 = {r["img_id"]: r["dhash"] & ((1 << 64) - 1) for r in fps}
    parent = {i: i for i in u64}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(u64)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(u64[a] ^ u64[b]).count("1") <= HAMMING_MAX:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    expect = {i: find(i) for i in u64}
    got = {r["img_id"]: r for r in image_dup_clusters(spark, SF_ORACLE).collect()}
    assert set(got) == set(expect)
    for img_id, r in got.items():
        assert r["cluster_id"] == expect[img_id], img_id
        assert r["is_keeper"] == (expect[img_id] == img_id)
    # the keep-one story: a paired re-crawl is never the keeper
    for r in fps:
        if r["variant"] == "recompress":  # hamming 0 -> always paired
            assert not got[r["img_id"]]["is_keeper"]
            assert got[r["img_id"]]["cluster_id"] <= r["doc_id"] * 10
