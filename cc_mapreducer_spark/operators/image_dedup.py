"""Perceptual image near-duplicate detection: dHash fingerprints over
decoded PNG pixels + the repo's pigeonhole block-pair search.

The multimodal family (operators/multimodal.py) decodes, measures, and
re-encodes media but never DEDUPES it — yet image dedup is a standard
training-data-pipeline stage: the same picture is crawled thousands of
times behind different bytes (re-compression, metadata chrome, a pixel
of watermark), so sha256-of-payload misses almost every real duplicate.
The standard cheap answer is a difference hash (dHash — Krawetz 2013,
public algorithm; the gradient sibling of average-hash): box-resample
the image to a 9x8 grid of integer means and emit one bit per
horizontally-adjacent cell comparison — 64 bits that survive
re-compression and small local edits.

Pipeline (Spark-first, mirrors the SimHash text path at
operators/dedup.py:457):

  image_table      every document -> a real grayscale PNG (the
                   multimodal fixture derivation), PLUS planted
                   re-crawl variants: every 10th doc re-compressed at a
                   different zlib level (byte-different, PIXEL-
                   IDENTICAL — the case payload-sha dedup misses), and
                   every (10k+5)th doc with one pixel bumped (small
                   local edit).
  dhash            mapInPandas: own-codec PNG decode
                   (functions/media_codec.decode_png_pixels) -> integer
                   box-resample -> 64-bit gradient fingerprint. All
                   integer ops — platform-exact, pytest pins a pure-
                   python replica.
  pair search      the dedup.py block-pair probe verbatim: 8 8-bit
                   blocks, C(8,2)=28 16-bit pair keys, hash self-join,
                   Hamming verify <= 6. Pigeonhole-complete for the
                   radius (<= 6 flipped bits leave >= 2 intact blocks,
                   so some pair key matches exactly); pytest proves
                   equality with a brute-force all-pairs replica.

Scale shape: decode+hash ride the scan (Arrow batches, no shuffle); the
fingerprint table is n_images x ~16 bytes (the standing artifact a real
pipeline checkpoints); the probe is one 28x explode + one hash self-join
on near-uniform 16-bit-pair keys + distinct + an O(candidates) verify.
No all-pairs anywhere; a flood of identical images lands in one bucket
whose size equals the TRUE duplicate class (output-bound, not
quadratic-candidate-bound).

Determinism: zlib with fixed level is deterministic; decode, resample,
and comparisons are integer-exact — fingerprints and pair sets are
bit-stable across platforms (unlike the float-DCT JPEG witnesses).

Reference parity note: the reference engine (/root/reference/src/
index.js) has no media surface; this extends SURVEY §2.8's
training-data-pipeline family like the rest of the multimodal stack.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cc_mapreducer_spark.functions.media_codec import (
    _png_chunk,
    decode_png_pixels,
)
from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table, spread

HAMMING_MAX = 6  # same advertised radius as the SimHash text path
_BLOCK_PAIRS = [(i, j) for i in range(8) for j in range(i + 1, 8)]


# --------------------------------------------------------------------------
# fixture: a crawled-image table with planted re-crawl variants
# --------------------------------------------------------------------------


def _gray_png(px, level: int = 6) -> bytes:
    """8-bit grayscale PNG from an (h, w) uint8 array (filter None per
    scanline — the same layout media_codec.make_png emits)."""
    h, w = px.shape
    raster = bytearray()
    for y in range(h):
        raster.append(0)
        raster.extend(px[y].tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raster), level))
        + _png_chunk(b"IEND", b"")
    )


def base_image(doc_id: int, text: str, n_chars: int):
    """Deterministic grayscale image for a document: text bytes cycled
    over a (16..24) x (16..32) raster — the multimodal derivation at a
    dedup-meaningful minimum size (a 1x1 thumbnail hashes flat and
    would pair with everything)."""
    import numpy as np

    b = str(text).encode("utf-8")
    if not b:
        return None
    w = 16 + int(n_chars) % 17
    h = 16 + int(doc_id) % 9
    arr = np.frombuffer(b, dtype=np.uint8)
    y, x = np.mgrid[0:h, 0:w]
    return arr[(x + y) % len(arr)].astype(np.uint8)


IMAGE_SCHEMA = StructType(
    [
        StructField("img_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("variant", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def _image_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        if not len(pdf):
            continue
        rows = {k.name: [] for k in IMAGE_SCHEMA.fields}

        def emit(img_id, doc_id, variant, payload):
            rows["img_id"].append(img_id)
            rows["doc_id"].append(doc_id)
            rows["variant"].append(variant)
            rows["payload"].append(payload)

        for doc_id, text, n_chars in zip(
            pdf["doc_id"], pdf["text"], pdf["n_chars"]
        ):
            px = base_image(doc_id, text, n_chars)
            if px is None:
                continue
            emit(doc_id * 10, doc_id, "base", _gray_png(px, 6))
            if doc_id % 10 == 0:
                # re-crawl, recompressed: different bytes, SAME pixels
                emit(doc_id * 10 + 1, doc_id, "recompress", _gray_png(px, 9))
            elif doc_id % 10 == 5:
                # re-crawl with one bumped pixel (local edit/watermark)
                px2 = px.copy()
                h, w = px2.shape
                yx = (int(doc_id) % h, int(doc_id) % w)
                px2[yx] = np.minimum(255, int(px2[yx]) + 16)
                emit(doc_id * 10 + 2, doc_id, "edited", _gray_png(px2, 6))
        yield pd.DataFrame(rows)


def image_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(img_id, doc_id, variant, payload): one valid grayscale PNG per
    document plus the planted re-crawl variants."""
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", "n_chars"
    )
    return docs.mapInPandas(_image_rows, IMAGE_SCHEMA)


# --------------------------------------------------------------------------
# dHash
# --------------------------------------------------------------------------


def dhash64(px) -> int:
    """64-bit difference hash of an (h, w) uint8 image: integer
    box-resample to 8 rows x 9 cols of means, bit (j*8+i) set iff
    cell[j][i] < cell[j][i+1]. Images smaller than the grid are
    integer-upscaled by repetition first. All-integer -> platform-exact."""
    import numpy as np

    h, w = px.shape
    if h < 8:
        px = np.repeat(px, -(-8 // h), axis=0)
    if w < 9:
        px = np.repeat(px, -(-9 // w), axis=1)
    h, w = px.shape
    ys = [j * h // 8 for j in range(9)]
    xs = [i * w // 9 for i in range(10)]
    cells = [
        [
            int(px[ys[j] : ys[j + 1], xs[i] : xs[i + 1]].sum())
            // ((ys[j + 1] - ys[j]) * (xs[i + 1] - xs[i]))
            for i in range(9)
        ]
        for j in range(8)
    ]
    bits = 0
    for j in range(8):
        for i in range(8):
            if cells[j][i] < cells[j][i + 1]:
                bits |= 1 << (j * 8 + i)
    return bits


FP_SCHEMA = StructType(
    [
        StructField("img_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("variant", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("dhash", LongType()),
    ]
)


def _dhash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if not len(pdf):
            continue
        rows = {k.name: [] for k in FP_SCHEMA.fields}
        for img_id, doc_id, variant, payload in zip(
            pdf["img_id"], pdf["doc_id"], pdf["variant"], pdf["payload"]
        ):
            px = decode_png_pixels(bytes(payload))
            if px is None:
                continue
            rows["img_id"].append(img_id)
            rows["doc_id"].append(doc_id)
            rows["variant"].append(variant)
            rows["width"].append(px.shape[1])
            rows["height"].append(px.shape[0])
            # uint64 bit pattern carried as signed int64 (Spark LongType)
            h = dhash64(px)
            rows["dhash"].append(h - (1 << 64) if h >= 1 << 63 else h)
        yield pd.DataFrame(rows)


_IMAGE_CTE = """
WITH RECURSIVE imgs AS (
    SELECT doc_id, text, length(text) AS L,
           16 + (n_chars % 17) AS w, 16 + (doc_id % 9) AS h
    FROM documents WHERE length(text) > 0
), variants AS (
    SELECT doc_id * 10 AS img_id, doc_id, 'base' AS variant,
           w, h, text, L, false AS edited FROM imgs
    UNION ALL
    SELECT doc_id * 10 + 1, doc_id, 'recompress', w, h, text, L, false
    FROM imgs WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id * 10 + 2, doc_id, 'edited', w, h, text, L, true
    FROM imgs WHERE doc_id % 10 = 5
), px AS (
    SELECT img_id, doc_id, variant, w, h,
           (8 * y.k + 7) // h AS j,
           (9 * x.k + 8) // w AS i,
           CASE WHEN edited AND y.k = doc_id % h AND x.k = doc_id % w
                THEN least(255, ord(substr(text, CAST((x.k + y.k) % L AS INTEGER) + 1, 1)) + 16)
                ELSE ord(substr(text, CAST((x.k + y.k) % L AS INTEGER) + 1, 1)) END AS p
    FROM variants, range(0, 32) x(k), range(0, 24) y(k)
    WHERE x.k < w AND y.k < h
), cells AS (
    SELECT img_id, doc_id, variant, w, h, j, i,
           CAST(sum(p) AS BIGINT)
             // ( (((j + 1) * h // 8) - (j * h // 8))
                * (((i + 1) * w // 9) - (i * w // 9)) ) AS cell
    FROM px GROUP BY img_id, doc_id, variant, w, h, j, i
), bits AS (
    SELECT img_id, doc_id, variant, j, i, cell,
           lead(cell) OVER (PARTITION BY img_id, j ORDER BY i) AS nxt
    FROM cells
), dh AS (
    SELECT img_id, doc_id, variant,
           sum(CASE WHEN i < 8 AND cell < nxt
                    THEN CAST(power(2, j * 8 + i) AS HUGEINT)
                    ELSE CAST(0 AS HUGEINT) END) AS u
    FROM bits GROUP BY img_id, doc_id, variant
), fp AS (
    SELECT img_id, doc_id, variant,
           CAST(CASE WHEN u >= CAST(power(2, 63) AS HUGEINT)
                     THEN u - CAST(power(2, 64) AS HUGEINT)
                     ELSE u END AS BIGINT) AS dhash
    FROM dh
), prs AS (
    SELECT a.img_id AS img_a, b.img_id AS img_b,
           bit_count(xor(a.dhash, b.dhash)) AS hamming
    FROM fp a JOIN fp b ON a.img_id < b.img_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
), bi AS (
    SELECT img_a AS a, img_b AS b FROM prs UNION SELECT img_b, img_a FROM prs
), reach(n, m) AS (
    SELECT a, a FROM (SELECT a FROM bi UNION SELECT b FROM bi)
    UNION
    SELECT bi.b, reach.m FROM reach JOIN bi ON bi.a = reach.n
), comp AS (
    SELECT n AS node, min(m) AS component FROM reach GROUP BY n
), clusters AS (
    SELECT f.img_id, f.doc_id,
           COALESCE(c.component, f.img_id) AS cluster_id,
           f.img_id = COALESCE(c.component, f.img_id) AS is_keeper
    FROM fp f LEFT JOIN comp c ON f.img_id = c.node
)
"""

# the family singles reuse the SAME derivation (round 9): the suite
# oracle's CTE chain is the fixture's closed form, so each single's
# oracle is one SELECT over it — no more rows-only rows in the family
_FP_SQL = _IMAGE_CTE + """
SELECT f.img_id, f.doc_id, f.variant,
       CAST(v.w AS INT) AS width, CAST(v.h AS INT) AS height, f.dhash
FROM fp f JOIN variants v ON v.img_id = f.img_id
"""

_PAIRS_SQL = _IMAGE_CTE + """
SELECT img_a, img_b, CAST(hamming AS INT) AS hamming FROM prs
"""

_CLUSTERS_SQL = _IMAGE_CTE + """
SELECT img_id, doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
       is_keeper
FROM clusters
"""

_IMAGE_SUITE_SQL = _IMAGE_CTE + """SELECT 'fp' AS component,
       CAST(img_id AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR) || '|'
         || variant || '|' || CAST(dhash AS VARCHAR) AS entity,
       1.0 AS value
FROM fp
UNION ALL
SELECT 'pair', CAST(img_a AS VARCHAR) || '|' || CAST(img_b AS VARCHAR),
       CAST(hamming AS DOUBLE)
FROM prs
UNION ALL
SELECT 'cluster', CAST(img_id AS VARCHAR) || '|' || CAST(cluster_id AS VARCHAR),
       CAST(CAST(is_keeper AS INT) AS DOUBLE)
FROM clusters
"""


@register("image_dhash_fingerprint", oracle=_FP_SQL, driver=False)
def image_dhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image 64-bit dHash over codec-level-decoded PNG pixels, with
    provenance (doc_id, variant) and decoded dimensions. Cross-engine
    hashed inside image_dedup_suite (the oracle re-derives every bit
    from the closed-form fixture pixels); pytest additionally pins every
    fingerprint against a pure-python replica of decode + resample +
    hash, and pins the recompressed variant to its base's EXACT hash.

    The frame is session-persisted per corpus (the similarity._persisted
    discipline): the fingerprint table is the family's standing
    artifact, and the pair probe, the cluster resolution, and the
    digest suite all consume it — without the memo the PNG encode +
    decode pass re-ran once per consumer (measured: the cluster leg
    alone paid it twice)."""
    from cc_mapreducer_spark.operators.similarity import _persisted

    source = load_table(spark, sf_dir, "documents")
    return _persisted(
        spark,
        ("image_dhash", sf_dir),
        (tuple(sorted(source.inputFiles())),),
        lambda: image_table(spark, sf_dir).mapInPandas(_dhash_batch, FP_SCHEMA),
    )


@register("image_near_dup_pairs", oracle=_PAIRS_SQL, driver=False)
def image_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All image pairs within Hamming distance {HAMMING_MAX} on the
    dHash — perceptual near-duplicates that payload-sha dedup misses
    (re-compressions match at distance 0, single-pixel edits at <= ~4).
    Found by the SimHash block-pair probe (operators/dedup.py:457): 8
    8-bit blocks, 28 16-bit pair keys, hash self-join, Hamming verify.
    Pigeonhole-complete for the radius; pytest proves set-equality with
    a brute-force all-pairs replica. Scale shape identical to
    simhash_near_pairs: 28x explode of tiny fingerprint rows, one hash
    self-join on near-uniform keys, never the n^2 space."""
    fp = image_dhash_fingerprint(spark, sf_dir).select("img_id", "dhash")
    blocks = [
        F.shiftrightunsigned(F.col("dhash"), 8 * i).bitwiseAND(F.lit(255))
        for i in range(8)
    ]
    probes = fp.select(
        "img_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("pair_id"),
                        (blocks[i] * 256 + blocks[j]).alias("key"),
                    )
                    for p, (i, j) in enumerate(_BLOCK_PAIRS)
                ]
            )
        ).alias("pr"),
    ).select("img_id", "dhash", "pr.pair_id", "pr.key")
    a, b = probes.alias("a"), probes.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.pair_id") == F.col("b.pair_id"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.img_id") < F.col("b.img_id")),
        )
        .select(
            F.col("a.img_id").alias("img_a"),
            F.col("b.img_id").alias("img_b"),
            F.col("a.dhash").alias("ha"),
            F.col("b.dhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.select(
            "img_a",
            "img_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select("img_a", "img_b", F.col("hamming").cast("int"))
    )


@register("image_dup_clusters", oracle=_CLUSTERS_SQL, driver=False)
def image_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs resolved to clusters with canonical keepers —
    the dedup family's large-star/small-star connected components
    (operators/clustering.py:78) applied to the image modality: cluster
    id is the minimum img_id of the component (so the ORIGINAL crawl of
    a re-crawled image is the keeper, its recompressions/edits are
    drops), full image domain restored by a left join. All-integer,
    pytest pins it against a union-find replica over the replica pairs."""
    from cc_mapreducer_spark.operators.clustering import connected_components

    pairs = image_near_dup_pairs(spark, sf_dir)
    comp = connected_components(pairs, src="img_a", dst="img_b")
    imgs = image_dhash_fingerprint(spark, sf_dir).select("img_id", "doc_id")
    return imgs.join(
        comp, imgs["img_id"] == comp["node"], "left"
    ).select(
        "img_id",
        "doc_id",
        F.coalesce("component", F.col("img_id")).cast("long").alias("cluster_id"),
        (
            F.coalesce("component", F.col("img_id")) == F.col("img_id")
        ).alias("is_keeper"),
    )


# --------------------------------------------------------------------------
# driver digest: the whole family, hash-checked cross-engine (round 8)
# --------------------------------------------------------------------------

# The r7 keys above were rows-only for the driver until round 8
# ("no SQL engine can inflate zlib"). That undersold the fixture: the
# PIXELS are closed-form (base_image: p(y,x) = text_byte[(x+y) mod L] on
# a (16+doc_id%9) x (16+n_chars%17) raster; the edited variant bumps one
# known pixel), and dHash is pure integer arithmetic on those pixels —
# so DuckDB can re-derive every fingerprint bit from `documents` alone,
# brute-force the pair set (the semantic spec: blocking must equal
# all-pairs), and resolve components with the recursive-CTE pattern of
# duplicate_clusters' oracle. Spark reads pixels out of REAL encoded
# PNG bytes; a green hash therefore proves encode -> decode -> resample
# -> hash -> block-probe -> cluster, end to end, per value. Dims bound
# the constant-range scan: w <= 32, h <= 24 by the generation formulas
# (same trick as multimodal's _CODEC_STATS_SQL). Since round 9 the
# singles reuse the same CTE chain as their own oracles (_FP_SQL /
# _PAIRS_SQL / _CLUSTERS_SQL above), so the whole family is
# value-checked, not just the digest.


@register("image_dedup_suite", oracle=_IMAGE_SUITE_SQL)
def image_dedup_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver digest of the image near-dup family: every image's 64-bit
    dHash (in the entity, so all bits land in the hash) with its
    provenance, every near-dup pair with its exact Hamming distance
    (oracle = brute-force all-pairs — blocking must drop nothing), and
    the resolved clusters with canonical keepers. See _IMAGE_SUITE_SQL
    for why the whole pipeline is cross-engine checkable despite the
    zlib container: the fixture pixels are closed-form."""

    def leg(df: DataFrame, component: str, entity, value) -> DataFrame:
        return df.select(
            F.lit(component).alias("component"),
            entity.cast("string").alias("entity"),
            value.cast("double").alias("value"),
        )

    fp = image_dhash_fingerprint(spark, sf_dir)
    pairs = image_near_dup_pairs(spark, sf_dir)
    cl = image_dup_clusters(spark, sf_dir)
    return (
        leg(
            fp,
            "fp",
            F.concat_ws("|", "img_id", "doc_id", "variant", "dhash"),
            F.lit(1.0),
        )
        .unionByName(
            leg(pairs, "pair", F.concat_ws("|", "img_a", "img_b"), F.col("hamming"))
        )
        .unionByName(
            leg(
                cl,
                "cluster",
                F.concat_ws("|", "img_id", "cluster_id"),
                F.col("is_keeper").cast("int"),
            )
        )
    )
