"""Multimodal (binary) column plumbing (SURVEY.md §2.8; driver north-star).

Images/audio/video are opaque `binary` payloads with typed metadata; the
Spark-side machinery that matters at 100 TB is real here — schemas,
Arrow-batched Pandas UDFs over `mapInPandas`, per-batch shaping — and so
is CONTAINER-LEVEL decode: `functions/media_codec.py` builds genuinely
valid PNG / WAV / MP4 files with stdlib struct+zlib and
`decode_media_headers` parses their real byte layouts (magic sniff, CRC
check, RIFF chunk walk, ISO-BMFF box walk) — no media library needed.
What still requires external libraries is CODEC work (JPEG entropy
decode, audio resampling, video frame extraction); that stays behind the
`decode_with_library` seam (`decode_stub_features` is the
plumbing-verified fake for those stages).

The driver tables carry no binary columns, so payloads are materialized
from `documents.text` — utf-8 bytes for the metadata-path queries
(`media_table`), real encoded containers for the decode path
(`media_table_encoded`); the plumbing is identical for external media
bytes.

Scale notes: binary payloads ride the scan, never the driver; mapInPandas
streams Arrow batches so peak memory is one batch per task, and feature
extraction parallelizes per input split. Keep payloads out of shuffle keys;
aggregate on the extracted metadata instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cc_mapreducer_spark.functions import media_codec
from cc_mapreducer_spark.registry import register
from cc_mapreducer_spark.tables import load_table, spread

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("byte_len", LongType()),
        StructField("content_sha", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("fake_channels", IntegerType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text -> opaque binary payload + typed metadata, the schema
    a real multimodal table would have (payload column stays lazy/columnar
    in parquet; metadata is queryable without touching bytes)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("bigint").alias("byte_len"),
        F.sha2(payload, 256).alias("content_sha"),
    )


ENCODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def _encode_one(doc_id: int, text: str, n_chars: int) -> tuple[str, bytes]:
    """One document -> (media_type, spec-valid container bytes). Every
    parameter is a deterministic function of (doc_id, n_chars), so decode
    stages can be independently checked against these formulas."""
    seed = str(text).encode("utf-8")
    if doc_id % 3 == 0:
        return "image/png", media_codec.make_png(1 + n_chars % 32, 1 + doc_id % 24, seed)
    if doc_id % 3 == 1:
        return "audio/wav", media_codec.make_wav(64 + n_chars % 128, 8000, 1 + doc_id % 2, seed)
    return "video/mp4", media_codec.make_mp4(500 + (n_chars * 7) % 10000, seed)


def _encode_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas producer of REAL container files (media_codec); see
    _encode_one for the deterministic parameter formulas."""
    for pdf in batches:
        if not len(pdf):
            continue
        payloads, types = [], []
        for doc_id, text, n_chars in zip(pdf["doc_id"], pdf["text"], pdf["n_chars"]):
            mt, payload = _encode_one(doc_id, text, n_chars)
            types.append(mt)
            payloads.append(payload)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "media_type": types, "payload": payloads}
        )


def media_table_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Like media_table, but the payloads are genuinely valid media
    container files (see functions/media_codec.py) — the table a real
    ingest job would hold after fetching image/audio/video bytes."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text", "n_chars")
    return docs.mapInPandas(_encode_media, ENCODED_SCHEMA)


def decode_media_headers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL media decode (container level): sniff each payload's magic
    bytes and parse its actual structure — PNG IHDR (CRC-verified), WAV
    RIFF chunk walk, MP4 box tree. Fields that don't apply to a format
    (or payloads that are no known format) come back NULL — no fake
    features."""
    for pdf in batches:
        if not len(pdf):
            continue
        rows = {k.name: [] for k in DECODED_SCHEMA.fields}
        for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
            meta = media_codec.sniff_and_parse(payload) or {}
            rows["doc_id"].append(doc_id)
            rows["media_type"].append(mt)
            rows["byte_len"].append(len(payload))
            rows["width"].append(meta.get("width"))
            rows["height"].append(meta.get("height"))
            rows["channels"].append(meta.get("channels"))
            rows["sample_rate"].append(meta.get("sample_rate"))
            rows["n_samples"].append(meta.get("n_samples"))
            rows["duration_ms"].append(meta.get("duration_ms"))
        yield pd.DataFrame(rows).astype(
            {
                c: "Int32"
                for c in ("width", "height", "channels", "sample_rate", "n_samples", "duration_ms")
            }
        )


def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end real decode: encode valid containers, then parse their
    headers back. Dimensions/rates/durations are provably read from the
    file bytes (tests cross-check against the generation formulas AND
    against golden externally-produced files)."""
    return media_table_encoded(spark, sf_dir).mapInPandas(
        decode_media_headers, DECODED_SCHEMA
    )


def decode_stub_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stub for the media decode stage: deterministic fake
    dimensions derived from payload bytes (REAL decode would call
    Pillow/librosa here — see decode_with_library)."""
    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        byte_len = pdf["payload"].map(len).astype("int64")
        first = pdf["payload"].map(lambda b: b[0] if len(b) else 0).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "byte_len": byte_len,
                "fake_width": (1 + (first * 7 + byte_len) % 1024).astype("int32"),
                "fake_height": (1 + (first * 13 + byte_len) % 768).astype("int32"),
                "fake_channels": (1 + first % 4).astype("int32"),
            }
        )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("target_w", IntegerType()),
        StructField("target_h", IntegerType()),
        StructField("resized_sha", StringType()),
    ]
)


def resize_stub(target_w: int, target_h: int):
    """mapInPandas stub for the image-resize stage: deterministic fake
    (sha of payload + target dims). A real deployment replaces the body
    with Pillow's Image.resize; the Spark-side contract — closure over
    resize params, Arrow batches, output schema — is the real one."""
    import hashlib

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            sha = pdf["payload"].map(
                lambda b: hashlib.sha256(bytes(b) + f"{target_w}x{target_h}".encode()).hexdigest()
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "resized_sha": sha,
                }
            )

    return _resize


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_len", IntegerType()),
        StructField("frame_sha", StringType()),
    ]
)


def _frame_chunks(payload: bytes, n_frames: int) -> list[bytes]:
    """THE frame-sampling chunk formula, shared by the pytest-pinned
    sha surface (frame_sample_stub) and the hash-checked oracle surface
    (_derive_media) so the two can never drift: n_frames equal slices of
    step = max(1, len//n_frames) bytes; the tail remainder is dropped."""
    step = max(1, len(payload) // n_frames)
    return [payload[i * step : (i + 1) * step] for i in range(n_frames)]


def frame_sample_stub(n_frames: int = 4):
    """mapInPandas stub for video frame sampling: emits n_frames rows per
    video payload (1:N explode through Arrow — the batch-shape contract a
    real pyav sampler has), frame bytes faked as slices of the payload.
    frame_len is the sampled chunk's true byte count (oracle-checkable
    against the container-size formula); frame_sha pins the bytes in
    tests."""
    import hashlib

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video/mp4"]
            if not len(vids):
                continue
            out = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_sha": []}
            for _, row in vids.iterrows():
                for i, chunk in enumerate(_frame_chunks(bytes(row["payload"]), n_frames)):
                    out["doc_id"].append(row["doc_id"])
                    out["frame_idx"].append(i)
                    out["frame_len"].append(len(chunk))
                    out["frame_sha"].append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(out).astype({"frame_idx": "int32", "frame_len": "int32"})

    return _sample


def decode_with_library(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The CODEC-decoder seam (pixel/sample-level work that genuinely
    needs external libraries: JPEG entropy decode, audio resampling,
    video frame extraction). Signature and schema match
    decode_stub_features; a deployment with media libs installed swaps
    this in (Pillow for image/*, librosa/soundfile for audio/*, pyav for
    video/*). CONTAINER-level decode (dimensions, sample counts,
    durations) does NOT need this seam — decode_media_headers does it
    for real with stdlib parsing.

    Probe result (round 2, 2026-08-13): ``import PIL`` raises
    ModuleNotFoundError in this container — no media decode library is
    available, so this seam stays a stub by environment constraint, not by
    omission. The probe is repeated at runtime below so the stub
    self-activates if a library ever appears.

    Round 4 narrowed this seam's scope: grayscale-PNG pixels and PCM-WAV
    samples are now decoded FOR REAL with stdlib zlib/struct + numpy
    (media_codec.decode_png_pixels / decode_wav_samples, hash-checked
    end-to-end by the media_codec_stats query). Round 5 narrowed it
    again: baseline grayscale JPEG — a real entropy-coded codec — is
    encoded AND decoded in pure numpy (functions/jpeg_codec.py, proven
    end-to-end by jpeg_codec_stats). Round 6 narrowed it FURTHER:
    baseline COLOR JPEG (YCbCr interleaved scans, 4:2:0 and 4:4:4
    subsampling, DRI/RST restart markers) is pure numpy too
    (encode_color_jpeg / decode_color_jpeg, proven end-to-end by
    jpeg_color_codec_stats), and IMA ADPCM — a real compressed-audio
    codec (WAVE fmt 0x0011, 4:1) — is integer-exact stdlib+numpy
    (functions/adpcm_codec.py, adpcm_codec_stats), and PROGRESSIVE
    grayscale JPEG (SOF2 spectral selection + successive approximation)
    decodes AND encodes in pure numpy — jpeg_codec_stats proves per
    document that the progressive framing reconstructs the exact
    baseline pixels — and (r7) HIERARCHICAL grayscale JPEG (Annex J:
    DHP pyramid, EXP expansion, SOF5 differential frames) round-trips
    with decode pinned exactly to the encoder-predicted reconstruction
    (jpeg_codec_stats hier_exact). The seam now covers only
    arithmetic-coded JPEG (the QM-coder's 113-row state table is not
    reproducible from memory with confidence), other subsampling
    ratios, entropy-coded audio (MP3/AAC), and H.264."""
    try:
        import PIL  # noqa: F401
    except ModuleNotFoundError:
        raise NotImplementedError(
            "media decode libraries are not installed in this environment "
            "(PIL import probe failed); use decode_stub_features for the "
            "plumbing-verified fake path"
        )
    raise NotImplementedError(
        "a media library is present but no decoder is wired yet; "
        "implement width/height decode here"
    )


# --------------------------------------------------------------------------
# registered queries
# --------------------------------------------------------------------------

_BINARY_STATS_SQL = """
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS media_type,
       count(*) AS n_items,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes,
       -- DuckDB sha256 takes VARCHAR, not BLOB; hashing the string hashes
       -- its UTF-8 bytes, which is exactly sha2(encode(text,'UTF-8')) in Spark
       count(DISTINCT sha256(text)) AS n_distinct_payloads
FROM documents
GROUP BY 1
"""


@register("multimodal_binary_stats", oracle=_BINARY_STATS_SQL, driver=False)  # hashed via multimodal_suite
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over the media table: per media type, payload
    counts/sizes and distinct-content counts — the query pattern that must
    NOT deserialize payloads (verify: ReadSchema would exclude `payload`
    if this ran over a materialized parquet media table)."""
    m = media_table(spark, sf_dir)
    return m.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum("byte_len").cast("bigint").alias("total_bytes"),
        F.max("byte_len").cast("bigint").alias("max_bytes"),
        F.countDistinct("content_sha").alias("n_distinct_payloads"),
    )


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode stage over the payload column (stub features;
    real decoder plugs into decode_with_library). Registered rows-only —
    the point under test is the mapInPandas plumbing: schema, batch
    iteration, payload bytes arriving intact."""
    m = media_table(spark, sf_dir)
    return m.mapInPandas(decode_stub_features, FEATURE_SCHEMA)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (1:N explode through mapInPandas): 4 fake
    frames per video payload. Rows-only; tests pin the per-video frame
    count and hash determinism."""
    m = media_table(spark, sf_dir)
    return m.mapInPandas(frame_sample_stub(4), FRAME_SCHEMA)


# Roster consolidation (round 2): the driver records correctness for at
# most 50 registered keys, so the mapInPandas surfaces merge into one
# tagged key (superset schema, NULL-padded). Components stay importable
# functions with their own unit tests.
#
# Round 3: the key is HASH-CHECKED (VERDICT r2 item 2). Every emitted
# field is a decode result the DuckDB oracle re-derives independently
# from the container-generation formulas (_encode_media: PNG width
# 1+n_chars%32 / height 1+doc_id%24 / grayscale, WAV n_samples
# 64+n_chars%128 @8000Hz x (1+doc_id%2)ch, MP4 duration 500+(n_chars*7)%
# 10000) and the exact container byte layouts (functions/media_codec:
# MP4 file size = 28B ftyp + 116B moov/mvhd + 8B free header +
# min(seed,64) seed bytes). Spark's side reads these values out of REAL
# encoded bytes; DuckDB recomputes them from `documents` alone — a
# cross-engine proof the byte-level encode->decode round trip is exact.
# Payload shas (not formula-derivable: zlib-compressed PNG rasters) stay
# in the pytest surface (tests/test_media_codec.py golden bytes).
_MP4_HEADER_BYTES = 28 + 116 + 8  # ftyp + moov(mvhd v0) + free box header

_DERIVED_SQL = """
WITH d AS (
    SELECT doc_id, n_chars, octet_length(encode(text)) AS tb FROM documents
), mp4 AS (
    SELECT doc_id, n_chars,
           152 + LEAST(CASE WHEN tb = 0 THEN 1 ELSE tb END, 64) AS mp4_len
    FROM d WHERE doc_id % 3 = 2
), decoded AS (
    SELECT 'decoded' AS kind, doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1 + n_chars % 32 END AS INTEGER) AS width,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1 + doc_id % 24 END AS INTEGER) AS height,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                     WHEN doc_id % 3 = 1 THEN 1 + doc_id % 2 END AS INTEGER) AS channels,
           CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 END AS INTEGER) AS sample_rate,
           CAST(CASE WHEN doc_id % 3 = 1 THEN 64 + n_chars % 128 END AS INTEGER) AS n_samples,
           CAST(CASE WHEN doc_id % 3 = 2 THEN 500 + (n_chars * 7) % 10000 END AS INTEGER)
             AS duration_ms,
           CAST(NULL AS INTEGER) AS frame_idx,
           CAST(NULL AS INTEGER) AS frame_len
    FROM d
), frames AS (
    SELECT 'frame' AS kind, doc_id, 'video/mp4' AS media_type,
           CAST(NULL AS INTEGER) AS width,
           CAST(NULL AS INTEGER) AS height,
           CAST(NULL AS INTEGER) AS channels,
           CAST(NULL AS INTEGER) AS sample_rate,
           CAST(NULL AS INTEGER) AS n_samples,
           CAST(NULL AS INTEGER) AS duration_ms,
           CAST(k AS INTEGER) AS frame_idx,
           CAST(mp4_len // 4 AS INTEGER) AS frame_len
    FROM mp4 CROSS JOIN range(0, 4) t(k)
)
SELECT * FROM decoded UNION ALL SELECT * FROM frames
"""


DERIVED_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_len", IntegerType()),
    ]
)


def _derive_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Single-pass derivation: encode each document's container ONCE, then
    emit its decoded-header row and (for videos) its sampled-frame rows
    from the same bytes. A two-leg union would run the zlib-heavy encode
    stage twice over the corpus for no extra information."""
    n_frames = 4
    for pdf in batches:
        if not len(pdf):
            continue
        rows = {k.name: [] for k in DERIVED_SCHEMA.fields}

        def emit(kind, doc_id, mt, **fields):
            rows["kind"].append(kind)
            rows["doc_id"].append(doc_id)
            rows["media_type"].append(mt)
            for c in ("width", "height", "channels", "sample_rate",
                      "n_samples", "duration_ms", "frame_idx", "frame_len"):
                rows[c].append(fields.get(c))

        for doc_id, text, n_chars in zip(pdf["doc_id"], pdf["text"], pdf["n_chars"]):
            mt, payload = _encode_one(doc_id, text, n_chars)
            meta = media_codec.sniff_and_parse(payload) or {}
            emit(
                "decoded", doc_id, mt,
                width=meta.get("width"), height=meta.get("height"),
                channels=meta.get("channels"), sample_rate=meta.get("sample_rate"),
                n_samples=meta.get("n_samples"), duration_ms=meta.get("duration_ms"),
            )
            if mt == "video/mp4":
                for i, chunk in enumerate(_frame_chunks(payload, n_frames)):
                    emit("frame", doc_id, mt, frame_idx=i, frame_len=len(chunk))
        yield pd.DataFrame(rows).astype(
            {
                c: "Int32"
                for c in ("width", "height", "channels", "sample_rate",
                          "n_samples", "duration_ms", "frame_idx", "frame_len")
            }
        )


@register("multimodal_derived", oracle=_DERIVED_SQL, driver=False)  # hashed via multimodal_suite
def multimodal_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union of the Arrow-batched media derivation stages, every
    field read from REAL container bytes and hash-checked against a DuckDB
    oracle that re-derives the expected values from `documents` alone:

    * kind='decoded' — container decode: valid PNG/WAV/MP4 payloads built
      by _encode_one, then parsed back from their actual byte layouts
      (magic sniff, CRC-checked IHDR, RIFF walk, ISO-BMFF box walk).
    * kind='frame' — per-video sampled frames (1:N explode through Arrow)
      over the SAME encoded MP4 containers; frame_len is each sampled
      chunk's true byte count, which the oracle checks against the exact
      ISO-BMFF file-size formula. Frame BYTES/shas stay pytest-pinned
      (pixel extraction needs the decode_with_library seam).

    One mapInPandas pass: each container is encoded once and feeds both
    row kinds (see _derive_media)."""
    docs = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "text", "n_chars")
    return docs.mapInPandas(_derive_media, DERIVED_SCHEMA)


# --------------------------------------------------------------------------
# codec-level decode stats (round 4): REAL pixels and samples, hash-checked
# --------------------------------------------------------------------------
#
# Closes the r2/r3 "codec-level decode is environment-blocked" item for
# the formats this corpus actually holds: grayscale PNG and PCM WAV are
# fully decodable with stdlib zlib/struct + numpy (media_codec.
# decode_png_pixels handles all five PNG scanline filters; tests decode
# hand-built files using each). Spark decodes PIXEL VALUES out of real
# container bytes; DuckDB re-derives the same statistics purely from the
# generation formulas (pixel(x,y) = text_byte[(x+y) mod len], WAV sample
# j = LE int16 of two cycled text bytes) — a cross-engine proof the
# byte->pixel decode is exact, same pattern as multimodal_derived's
# container headers. ord(substr(..)) equals the utf-8 byte because the
# driver corpus is ASCII (asserted over all SFs); the DECODER itself is
# byte-correct for any input. The decode_with_library seam now covers
# only entropy-coded formats (JPEG/MP3/H.264) that genuinely need
# external libraries.

_CODEC_STATS_SQL = """
WITH d AS (
    SELECT doc_id, n_chars, text, octet_length(encode(text)) AS L
    FROM documents WHERE octet_length(encode(text)) > 0
), png AS (
    SELECT d.doc_id,
           1 + n_chars % 32 AS w, 1 + doc_id % 24 AS h, L, text
    FROM d WHERE doc_id % 3 = 0
), png_vals AS (
    SELECT doc_id, w, h,
           ord(substr(text, CAST((x.k + y.k) % L AS INTEGER) + 1, 1)) AS v
    -- constant-bound series + filter: DuckDB's range() cannot take a
    -- lateral column; w <= 32 and h <= 24 by the generation formulas
    FROM png, range(0, 32) x(k), range(0, 24) y(k)
    WHERE x.k < w AND y.k < h
), png_stats AS (
    SELECT 'png_pixels' AS kind, doc_id,
           CAST(w * h AS BIGINT) AS n_values,
           CAST(sum(v) AS BIGINT) AS value_sum,
           CAST(min(v) AS BIGINT) AS value_min,
           CAST(max(v) AS BIGINT) AS value_max
    FROM png_vals GROUP BY doc_id, w, h
), wav AS (
    SELECT d.doc_id,
           (64 + n_chars % 128) * (1 + doc_id % 2) AS n_vals, L, text
    FROM d WHERE doc_id % 3 = 1
), wav_vals AS (
    SELECT doc_id, n_vals,
           ord(substr(text, CAST((2 * j.k) % L AS INTEGER) + 1, 1))
           + 256 * ord(substr(text, CAST((2 * j.k + 1) % L AS INTEGER) + 1, 1))
           AS raw
    -- n_vals <= (64 + 127) * 2 = 382 by the generation formulas
    FROM wav, range(0, 382) j(k)
    WHERE j.k < n_vals
), wav_signed AS (
    SELECT doc_id, n_vals,
           CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
    FROM wav_vals
), wav_stats AS (
    SELECT 'wav_samples' AS kind, doc_id,
           CAST(n_vals AS BIGINT) AS n_values,
           CAST(sum(v) AS BIGINT) AS value_sum,
           CAST(min(v) AS BIGINT) AS value_min,
           CAST(max(v) AS BIGINT) AS value_max
    FROM wav_signed GROUP BY doc_id, n_vals
)
SELECT * FROM png_stats UNION ALL SELECT * FROM wav_stats
"""

CODEC_STATS_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("doc_id", LongType()),
        StructField("n_values", LongType()),
        StructField("value_sum", LongType()),
        StructField("value_min", LongType()),
        StructField("value_max", LongType()),
    ]
)


def _codec_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from cc_mapreducer_spark.functions.media_codec import (
        decode_png_pixels,
        decode_wav_samples,
    )

    for pdf in batches:
        if not len(pdf):
            continue
        rows = {k.name: [] for k in CODEC_STATS_SCHEMA.fields}
        for doc_id, text, n_chars in zip(
            pdf["doc_id"], pdf["text"], pdf["n_chars"]
        ):
            if doc_id % 3 == 2:  # MP4 free-box payload has no codec data
                continue
            if not str(text).encode("utf-8"):
                continue  # matches the oracle's octet_length(text) > 0 gate
            mt, payload = _encode_one(doc_id, text, n_chars)
            if mt == "image/png":
                px = decode_png_pixels(payload)
                if px is None:
                    continue
                kind, vals = "png_pixels", px.astype("int64").ravel()
            else:
                s = decode_wav_samples(payload)
                if s is None:
                    continue
                kind, vals = "wav_samples", s.astype("int64").ravel()
            rows["kind"].append(kind)
            rows["doc_id"].append(doc_id)
            rows["n_values"].append(len(vals))
            rows["value_sum"].append(int(vals.sum()))
            rows["value_min"].append(int(vals.min()))
            rows["value_max"].append(int(vals.max()))
        yield pd.DataFrame(rows)


@register("media_codec_stats", oracle=_CODEC_STATS_SQL, driver=False)
def media_codec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document statistics over DECODED pixel/sample values: each
    PNG's pixels and WAV's int16 samples, decoded from the real encoded
    container bytes (not from the formulas), summarized as
    (count, sum, min, max) integers — exactly hashable. The oracle
    recomputes the same numbers from the generation formulas alone, so a
    hash match proves the full encode -> bytes -> codec-decode loop is
    value-exact in both directions."""
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", "n_chars"
    )
    return docs.mapInPandas(_codec_stats, CODEC_STATS_SCHEMA)


# --------------------------------------------------------------------------
# image resize (round 4): block-average downsample over DECODED pixels
# --------------------------------------------------------------------------
#
# The driver's multimodal mandate names four verbs: decode /
# feature-extract / resize / frame-sample. Resize is the one that was
# still stub-only; with real pixel decode it becomes real too: a 2x2
# block-average thumbnail (integer floor mean per block, partial edge
# blocks averaged over their actual pixel count — deterministic integer
# arithmetic, so the result is exactly hashable). The oracle re-derives
# every thumbnail value from the generation formulas by grouping the
# same pixel grid into the same blocks.

_THUMB_F = 2  # downsample factor

_THUMB_SQL = """
WITH d AS (
    SELECT doc_id, n_chars, text, octet_length(encode(text)) AS L
    FROM documents WHERE octet_length(encode(text)) > 0
), png AS (
    SELECT d.doc_id, 1 + n_chars % 32 AS w, 1 + doc_id % 24 AS h, L, text
    FROM d WHERE doc_id % 3 = 0
), vals AS (
    SELECT doc_id, w, h, x.k AS x, y.k AS y,
           ord(substr(text, CAST((x.k + y.k) % L AS INTEGER) + 1, 1)) AS v
    FROM png, range(0, 32) x(k), range(0, 24) y(k)
    WHERE x.k < w AND y.k < h
), blocks AS (
    SELECT doc_id, w, h, x // 2 AS bx, y // 2 AS by,
           CAST(sum(v) // count(*) AS BIGINT) AS bv
    FROM vals GROUP BY doc_id, w, h, x // 2, y // 2
)
SELECT doc_id,
       CAST((w + 1) // 2 AS BIGINT) AS thumb_w,
       CAST((h + 1) // 2 AS BIGINT) AS thumb_h,
       CAST(sum(bv) AS BIGINT) AS value_sum,
       CAST(min(bv) AS BIGINT) AS value_min,
       CAST(max(bv) AS BIGINT) AS value_max
FROM blocks GROUP BY doc_id, w, h
"""

THUMB_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("thumb_w", LongType()),
        StructField("thumb_h", LongType()),
        StructField("value_sum", LongType()),
        StructField("value_min", LongType()),
        StructField("value_max", LongType()),
    ]
)


def block_average(px, f: int = _THUMB_F):
    """(h, w) uint8 -> (ceil(h/f), ceil(w/f)) int64 thumbnail: each
    output value is the INTEGER floor mean of its block's actual pixels
    (edge blocks average over the pixels they really cover — no padding
    bias). Deterministic integer arithmetic end-to-end."""
    import numpy as np

    h, w = px.shape
    th, tw = -(-h // f), -(-w // f)
    out = np.zeros((th, tw), dtype=np.int64)
    p = px.astype(np.int64)
    for by in range(th):
        for bx in range(tw):
            blk = p[by * f : (by + 1) * f, bx * f : (bx + 1) * f]
            out[by, bx] = blk.sum() // blk.size
    return out


def _thumbnails(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from cc_mapreducer_spark.functions.media_codec import decode_png_pixels

    for pdf in batches:
        if not len(pdf):
            continue
        rows = {k.name: [] for k in THUMB_SCHEMA.fields}
        for doc_id, text, n_chars in zip(
            pdf["doc_id"], pdf["text"], pdf["n_chars"]
        ):
            if doc_id % 3 != 0 or not str(text).encode("utf-8"):
                continue
            _, payload = _encode_one(doc_id, text, n_chars)
            px = decode_png_pixels(payload)
            if px is None:
                continue
            t = block_average(px)
            rows["doc_id"].append(doc_id)
            rows["thumb_w"].append(t.shape[1])
            rows["thumb_h"].append(t.shape[0])
            rows["value_sum"].append(int(t.sum()))
            rows["value_min"].append(int(t.min()))
            rows["value_max"].append(int(t.max()))
        yield pd.DataFrame(rows)


@register("media_thumbnails", oracle=_THUMB_SQL, driver=False)
def media_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image 2x block-average thumbnail statistics, computed from
    REAL decoded pixels (decode -> resize in one Arrow batch pass) and
    hashed against the oracle's formula-derived block means — the
    'resize' verb of the multimodal mandate, value-exact."""
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", "n_chars"
    )
    return docs.mapInPandas(_thumbnails, THUMB_SCHEMA)


# --------------------------------------------------------------------------
# entropy-coded codec (round 5): baseline JPEG encode/decode, pure numpy
# --------------------------------------------------------------------------
#
# Round 4 left exactly one multimodal leg behind the decode_with_library
# environment seam: entropy-coded codecs. functions/jpeg_codec.py removes
# baseline grayscale JPEG from that list — Huffman bitstream with byte
# stuffing, zigzag RLE, dequantize, IDCT, all numpy+stdlib. This query
# proves it end-to-end IN SPARK: a deterministic text-derived image per
# document is encoded to real interchange-format bytes and decoded back
# in one Arrow batch pass.
#
# No DuckDB oracle: the decode output depends on the float DCT round
# trip, which SQL cannot reasonably express — so this key is rows-only
# for the driver and pytest-pinned instead (the item_pagerank policy):
# exact on constant blocks, error-bounded on gradients, run-to-run
# byte-identical (sha over decoded pixels), and re-compression
# convergent. JPEG is LOSSY; the contract is bounded error plus
# determinism, never equality with the source.

JPEG_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("jpeg_bytes", LongType()),
        StructField("max_abs_err", LongType()),
        StructField("prog_matches", BooleanType()),
        StructField("hier_exact", BooleanType()),
        StructField("decoded_sha", StringType()),
    ]
)


def jpeg_test_image(doc_id: int, text: str, n_chars: int):
    """Deterministic grayscale image from a document row (same derivation
    style as the PNG generator): w in 8..32, h in 8..24, pixel (y, x) =
    utf-8 byte of text at (x + 3 * y) mod len."""
    import numpy as np

    b = str(text).encode("utf-8")
    if not b:
        return None
    w = 8 + int(n_chars) % 25
    h = 8 + int(doc_id) % 17
    arr = np.frombuffer(b, dtype=np.uint8)
    y, x = np.mgrid[0:h, 0:w]
    return arr[(x + 3 * y) % len(arr)]


def _jpeg_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    import numpy as np

    from cc_mapreducer_spark.functions.jpeg_codec import (
        _hier_frame,
        decode_gray_jpeg,
        decode_gray_jpeg_hierarchical,
        decode_progressive_jpeg,
        downsample2,
        encode_gray_jpeg,
        encode_gray_jpeg_hierarchical,
        encode_gray_jpeg_progressive,
        upsample2x,
    )

    def _hier_predicted(px):
        # the encoder-side reconstruction the hierarchical decoder must
        # reproduce EXACTLY (same float expressions — Annex J pin)
        lv1 = downsample2(px.astype(np.int64))
        _, srec = _hier_frame(lv1, shift=128.0)
        ref = upsample2x(np.clip(srec, 0, 255))[: px.shape[0], : px.shape[1]]
        _, drec = _hier_frame(px.astype(np.int64) - ref, shift=0.0)
        return np.clip(ref + drec, 0, 255).astype(np.uint8)

    for pdf in batches:
        if not len(pdf):
            continue
        rows = {k.name: [] for k in JPEG_STATS_SCHEMA.fields}
        for doc_id, text, n_chars in zip(
            pdf["doc_id"], pdf["text"], pdf["n_chars"]
        ):
            px = jpeg_test_image(doc_id, text, n_chars)
            if px is None:
                continue
            payload = encode_gray_jpeg(px)
            dec = decode_gray_jpeg(payload)
            # the progressive framing carries the SAME quantized
            # coefficients, so its decode must be bit-identical
            prog = decode_progressive_jpeg(encode_gray_jpeg_progressive(px))
            # the hierarchical framing is a different pipeline (pyramid
            # + differential stage), so its pin is exact equality with
            # the encoder-predicted reconstruction, not with baseline
            hier = decode_gray_jpeg_hierarchical(
                encode_gray_jpeg_hierarchical(px, levels=2)
            )
            rows["doc_id"].append(doc_id)
            rows["width"].append(px.shape[1])
            rows["height"].append(px.shape[0])
            rows["jpeg_bytes"].append(len(payload))
            rows["max_abs_err"].append(
                int(np.abs(dec.astype(np.int64) - px.astype(np.int64)).max())
            )
            rows["prog_matches"].append(bool((prog == dec).all()))
            rows["hier_exact"].append(bool((hier == _hier_predicted(px)).all()))
            rows["decoded_sha"].append(hashlib.sha256(dec.tobytes()).hexdigest())
        yield pd.DataFrame(rows)


@register("jpeg_codec_stats", driver=False)  # lossy float DCT: pytest-pinned
def jpeg_codec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document baseline-JPEG round trip over deterministic
    text-derived grayscale images: encode to real JFIF bytes, decode
    back, report dimensions, compressed size, max reconstruction error,
    and the sha256 of the decoded pixels (the determinism witness
    tests/test_jpeg_codec.py pins across runs)."""
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", "n_chars"
    )
    return docs.mapInPandas(_jpeg_stats, JPEG_STATS_SCHEMA)


def jpeg_color_test_image(doc_id: int, text: str, n_chars: int):
    """Deterministic RGB image from a document row: each channel is the
    grayscale derivation with a different byte-phase stride, so the
    channels differ (real chroma content) while staying reproducible in
    any replica."""
    import numpy as np

    b = str(text).encode("utf-8")
    if not b:
        return None
    w = 8 + int(n_chars) % 25
    h = 8 + int(doc_id) % 17
    arr = np.frombuffer(b, dtype=np.uint8)
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [arr[(x + s * y) % len(arr)] for s in (3, 5, 7)], axis=-1
    )


def _jpeg_color_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    import numpy as np

    from cc_mapreducer_spark.functions.jpeg_codec import (
        decode_color_jpeg,
        encode_color_jpeg,
        rgb_to_ycbcr,
    )

    for pdf in batches:
        if not len(pdf):
            continue
        rows = {k.name: [] for k in JPEG_COLOR_STATS_SCHEMA.fields}
        for doc_id, text, n_chars in zip(
            pdf["doc_id"], pdf["text"], pdf["n_chars"]
        ):
            px = jpeg_color_test_image(doc_id, text, n_chars)
            if px is None:
                continue
            payload = encode_color_jpeg(px)  # 4:2:0, the libjpeg default
            dec = decode_color_jpeg(payload)
            y_src, _, _ = rgb_to_ycbcr(px)
            y_dec, _, _ = rgb_to_ycbcr(dec)
            rows["doc_id"].append(doc_id)
            rows["width"].append(px.shape[1])
            rows["height"].append(px.shape[0])
            rows["jpeg_bytes"].append(len(payload))
            # luma error is the codec-quality witness (chroma error is
            # dominated by 4:2:0 subsampling loss, by design)
            rows["max_luma_err"].append(int(round(float(np.abs(y_src - y_dec).max()))))
            rows["decoded_sha"].append(hashlib.sha256(dec.tobytes()).hexdigest())
        yield pd.DataFrame(rows)


JPEG_COLOR_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("jpeg_bytes", IntegerType()),
        StructField("max_luma_err", IntegerType()),
        StructField("decoded_sha", StringType()),
    ]
)


@register("jpeg_color_codec_stats", driver=False)  # lossy float DCT: pytest-pinned
def jpeg_color_codec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document baseline COLOR (YCbCr 4:2:0) JPEG round trip over
    deterministic text-derived RGB images: interleaved-MCU encode with
    the Annex K luma+chroma tables, decode with chroma upsampling,
    reporting dimensions, compressed size, max LUMA reconstruction
    error, and the sha256 of the decoded pixels (run-to-run determinism
    pinned in tests/test_jpeg_codec.py). Closes the color leg of the
    entropy-coded-codec family that was previously behind the
    decode_with_library seam."""
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", "n_chars"
    )
    return docs.mapInPandas(_jpeg_color_stats, JPEG_COLOR_STATS_SCHEMA)


def adpcm_test_signal(doc_id: int, text: str, n_chars: int):
    """Deterministic int16 mono signal from a document row: a byte-
    modulated integer triangle wave (no float anywhere, so the fixture
    is bit-identical in any replica), long enough to cross the ADPCM
    505-sample block boundary."""
    import numpy as np

    b = str(text).encode("utf-8")
    if not b:
        return None
    n = 600 + int(n_chars) % 700
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
    i = np.arange(n)
    period = 40 + int(doc_id) % 23
    tri = np.abs((i % period) * 2 - period) - period // 2
    # amplitude modulated per PERIOD (not per sample): the signal stays
    # locally smooth, which is the regime ADPCM's step adaptation is
    # built for; the byte content still drives the envelope
    amp = 50 + arr[(i // period) % len(arr)]
    return np.clip(tri * amp, -32768, 32767).astype(np.int16)


def _adpcm_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    import numpy as np

    from cc_mapreducer_spark.functions.adpcm_codec import (
        decode_ima_adpcm_batch,
        encode_ima_adpcm_batch,
    )

    for pdf in batches:
        if not len(pdf):
            continue
        rows = {k.name: [] for k in ADPCM_STATS_SCHEMA.fields}
        ids, sigs = [], []
        for doc_id, text, n_chars in zip(
            pdf["doc_id"], pdf["text"], pdf["n_chars"]
        ):
            sig = adpcm_test_signal(doc_id, text, n_chars)
            if sig is None:
                continue
            ids.append(doc_id)
            sigs.append(sig)
        # lockstep-vectorized across the whole Arrow batch (bit-identical
        # to the sequential codec — functions/adpcm_codec.py batch note)
        payloads = encode_ima_adpcm_batch(sigs)
        decs = decode_ima_adpcm_batch(payloads)
        for doc_id, sig, payload, dec in zip(ids, sigs, payloads, decs):
            err = np.abs(dec.astype(np.int64) - sig.astype(np.int64))
            rows["doc_id"].append(doc_id)
            rows["n_samples"].append(len(sig))
            rows["adpcm_bytes"].append(len(payload))
            rows["max_abs_err"].append(int(err.max()))
            rows["mean_abs_err"].append(round(float(err.mean()), 6))
            # the first decoded sample travels verbatim through the block
            # header predictor, so it is integer-exact AND independently
            # derivable in closed form — the sketches_suite adpcm:s0 leg
            # hashes it against that derivation
            rows["first_sample"].append(int(dec[0]))
            rows["decoded_sha"].append(hashlib.sha256(dec.tobytes()).hexdigest())
        yield pd.DataFrame(rows)


ADPCM_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", IntegerType()),
        StructField("adpcm_bytes", IntegerType()),
        StructField("max_abs_err", IntegerType()),
        StructField("mean_abs_err", DoubleType()),
        StructField("first_sample", IntegerType()),
        StructField("decoded_sha", StringType()),
    ]
)


@register("adpcm_codec_stats", driver=False)  # integer codec: pytest-pinned
def adpcm_codec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document IMA ADPCM (WAVE fmt 0x0011) round trip over
    deterministic text-derived audio: 4:1 adaptive-differential encode
    to a real RIFF container, decode back, report sample/byte counts,
    reconstruction error, and the decoded-sample sha256. Unlike the
    float-DCT JPEG legs this codec is all-integer, so the shas are
    platform-exact; registration stays rows-only because no SQL oracle
    can express a sample-recursive codec."""
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", "n_chars"
    )
    return docs.mapInPandas(_adpcm_stats, ADPCM_STATS_SCHEMA)
