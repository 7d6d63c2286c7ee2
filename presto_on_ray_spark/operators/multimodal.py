"""Multimodal columns (SURVEY §2.11): image/audio/video as opaque
binary columns + typed metadata, processed via Arrow-batched
mapInPandas.

Two tiers:

- **Real decode** (``multimodal_decode_features``): actual 24-bit BMP
  and 16-bit PCM WAV payloads, encoded and then decoded by independent
  struct/wave parsers inside mapInPandas; the decoded brightness/RMS
  features are exact-matched against a DuckDB oracle that recomputes
  them from first principles. This is a genuine binary decode path —
  no image/audio *libraries* needed, just the binary formats.
- **Real compressed decode** (``multimodal_png_decode``): actual PNG
  files (zlib-deflated IDAT, varied per-row filter types) decoded by a
  full five-filter unfiltering parser with CRC validation — still pure
  stdlib.
- **Real lossy decode** (``multimodal_jpeg_decode``, r5): actual
  baseline JPEGs via the in-engine pure-numpy codec
  (functions/jpeg_codec.py) — DCT, quantization, canonical Huffman,
  byte stuffing — with the DC-only closed form oracle-checked.
- **Library-gated decode** (``decode_image``): JPEG/PNG dispatch is
  in-engine now; formats beyond those (mp3, webp, ...) still raise
  NotImplementedError without a media library; the surrounding
  pipeline (``multimodal_features``) runs a clearly-marked
  deterministic digest fake so the Arrow plumbing stays exercised.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.suite import query

# Media row schema: opaque payload + typed metadata (the multimodal
# column convention: binary + struct, parquet-round-trippable).
MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", LongType()),
        StructField("meta_height", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_digest", StringType()),
        StructField("fake_brightness", LongType()),
    ]
)


def decode_image(payload: bytes):
    """Real image decode → numpy grayscale array.

    Three tiers, most-capable first:
    - **JPEG** (FFD8 magic): the engine's own pure-numpy baseline codec
      (functions/jpeg_codec.py) — no external library needed (r5; this
      was the PIL-gated gap through r4).
    - **PNG** (engine's stdlib five-filter decoder, 8-bit grayscale).
    - anything else: PIL if present, else a loud NotImplementedError.
    """
    if payload[:2] == b"\xff\xd8":
        from presto_on_ray_spark.functions.jpeg_codec import decode_baseline_jpeg

        return decode_baseline_jpeg(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        import numpy as np

        w, h, psum, npix = _decode_png(payload)  # noqa: F821 (defined below)
        # the PNG tier returns summary stats; re-decode to pixels is the
        # same walk — for array output use the JPEG tier or extend here
        return np.array([[psum // max(npix, 1)]], dtype="int64")
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "unsupported format: JPEG/PNG decode ships in-engine; other "
            "formats need an image library not present in this environment"
        ) from exc
    raise NotImplementedError("real decoder wiring is environment-specific")


def synthesize_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media: payload = utf-8 bytes of the text,
    metadata derived from lengths. Stands in for reading real blobs
    (parquet binary columns) so the downstream plumbing is testable."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col(id_col) % 2 == 0, "image").otherwise("audio").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.length(F.col(text_col)) % 640).cast("long").alias("meta_width"),
        (F.length(F.col(text_col)) % 480).cast("long").alias("meta_height"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched; each pandas batch holds the opaque bytes. The
    "brightness" is a deterministic fake (first-byte of sha256) marking
    where a real decoder would plug in via decode_image()."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["payload"].map(
                lambda b: hashlib.sha256(bytes(b)).hexdigest()
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_digest": digests,
                    "fake_brightness": digests.map(lambda h: int(h[:2], 16)).astype("int64"),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
           CAST(LENGTH(text) AS BIGINT) AS n_bytes,
           SHA256(text) AS payload_digest
    FROM documents WHERE doc_id <= 100
    """,
)
def multimodal_features(spark, sf_dir):
    """End-to-end multimodal pipeline: synthesize binary payloads →
    Arrow-batched mapInPandas feature extraction. n_bytes and the
    sha256 digest are oracle-checkable because the fake payload is the
    utf-8 text; fake_brightness is dropped from the comparison
    projection (stub-only)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    feats = extract_features(synthesize_media(d))
    return feats.select("doc_id", "media_type", "n_bytes", "payload_digest")


def resize_image_stub(payload: bytes, width: int, height: int) -> bytes:
    """Resize hook — STUB (no image libs here). The deterministic fake
    truncates/pads the byte stream to width*height bytes, preserving the
    real signature a PIL-backed implementation would have."""
    target = max(width * height, 1)
    return (payload * (target // max(len(payload), 1) + 1))[:target]


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for 'video' payloads via mapInPandas: split the
    opaque byte stream into n equal chunks (deterministic fake frames —
    the real decoder plugs into decode_image). One output row per
    frame, with frame index + frame digest; schema/batching/partition
    plumbing is the real thing."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("frame_bytes", LongType()),
            StructField("frame_digest", StringType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_digest": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    frame = b[i * step : (i + 1) * step]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(len(frame))
                    out["frame_digest"].append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(_sample, schema=schema)


@query("multimodal_frame_sample")
def multimodal_frame_sample(spark, sf_dir):
    """Video-style frame sampling pipeline: synthesize payloads →
    mapInPandas frame split → per-doc frame stats. Rows-only check;
    determinism asserted in tests/test_multimodal.py."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 50)
    frames = sample_frames(synthesize_media(d), n_frames=4)
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.sum("frame_bytes").alias("total_frame_bytes"),
        F.countDistinct("frame_digest").alias("distinct_frames"),
    )


@query("multimodal_partition_shape")
def multimodal_partition_shape(spark, sf_dir):
    """Batch-shape/partitioning audit for the media pipeline: rows and
    bytes per media_type after a repartition on the blob-affinity key —
    the layout a 100 TB blob pipeline needs (co-locate by type so
    decode executors specialize). Rows-only check."""
    d = t(spark, sf_dir, "documents")
    media = synthesize_media(d).repartition(8, "media_type")
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum(F.length("payload")).cast("long").alias("total_bytes"),
    )


# ---------------------------------------------------------------------------
# REAL decode path (round 4): formats the standard library can encode AND
# decode — 24-bit BMP (struct-parsed) and 16-bit PCM WAV (wave module).
# The encoder and decoder are independent code paths over the actual byte
# formats, and the decoded features are verified against a DuckDB oracle
# that recomputes them from first principles — so this is a genuine
# binary-decode pipeline, not a digest fake. decode_image() above remains
# the hook for libraries this container lacks (jpeg/png via PIL).
# ---------------------------------------------------------------------------

import io  # noqa: E402
import struct  # noqa: E402
import wave  # noqa: E402

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_samples", LongType()),
        # exact integer accumulators; the float feature math (mean
        # brightness, RMS) happens in Spark expressions so rounding is
        # engine-comparable
        StructField("pixel_sum", LongType()),
        StructField("n_pixels", LongType()),
        StructField("sample_sumsq", LongType()),
    ]
)

_WAV_RATE = 8000


def _bmp_dims(doc_id: int) -> tuple[int, int]:
    return 8 + doc_id % 16, 6 + doc_id % 12


def _wav_len(doc_id: int) -> int:
    return 64 + doc_id % 64


def _bmp_bytes(doc_id: int) -> bytes:
    """Encode a real 24-bit BMP: grayscale pixel (doc_id + x + y) % 256,
    bottom-up rows padded to 4 bytes — the actual on-disk format."""
    w, h = _bmp_dims(doc_id)
    row_pad = (4 - (w * 3) % 4) % 4
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # BMP stores rows bottom-up
        for x in range(w):
            p = (doc_id + x + y) % 256
            rows += bytes((p, p, p))  # B, G, R
        rows += b"\x00" * row_pad
    pixel_bytes = bytes(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_bytes), 0, 0, 54)
    return header + info + pixel_bytes


def _decode_bmp(payload: bytes) -> tuple[int, int, int, int]:
    """Parse the BMP byte format: header offsets, dims, bottom-up padded
    rows → (width, height, pixel_sum, n_pixels). Independent of the
    encoder (reads offsets from the header it finds)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    row_stride = (w * 3 + 3) // 4 * 4
    total = 0
    for y in range(abs(h)):
        base = offset + y * row_stride
        for x in range(w):
            total += payload[base + x * 3]  # blue channel (grayscale)
    return w, abs(h), total, w * abs(h)


def _wav_bytes(doc_id: int) -> bytes:
    """Encode a real RIFF/WAVE file (wave module): 16-bit PCM mono,
    sample_i = ((doc_id*7 + i*13) % 2048) - 1024."""
    n = _wav_len(doc_id)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(_WAV_RATE)
        wv.writeframes(
            b"".join(
                struct.pack("<h", ((doc_id * 7 + i * 13) % 2048) - 1024)
                for i in range(n)
            )
        )
    return buf.getvalue()


def _decode_wav(payload: bytes) -> tuple[int, int]:
    """Parse the RIFF/WAVE container → (n_samples, sum of squares)."""
    with wave.open(io.BytesIO(payload), "rb") as wv:
        n = wv.getnframes()
        raw = wv.readframes(n)
    samples = struct.unpack(f"<{n}h", raw)
    return n, sum(s * s for s in samples)


def synthesize_decodable_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas encoder: real BMP payloads for even ids, real WAV for
    odd — actual binary formats, byte-for-byte parseable by any BMP/WAV
    reader."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "media_type": [], "payload": []}
            for doc_id in pdf[id_col]:
                doc_id = int(doc_id)
                out["doc_id"].append(doc_id)
                if doc_id % 2 == 0:
                    out["media_type"].append("image")
                    out["payload"].append(_bmp_bytes(doc_id))
                else:
                    out["media_type"].append("audio")
                    out["payload"].append(_wav_bytes(doc_id))
            yield pd.DataFrame(out)

    return df.select(id_col).mapInPandas(_synth, schema=schema)


def decode_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas REAL decoder: struct-parse BMPs, wave-parse WAVs,
    emitting exact integer accumulators (float feature math stays in
    Spark expressions so rounding semantics are engine-comparable)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "media_type", "width", "height",
                "n_samples", "pixel_sum", "n_pixels", "sample_sumsq",
            )}
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                b = bytes(payload)
                rows["doc_id"].append(int(doc_id))
                rows["media_type"].append(mtype)
                if mtype == "image":
                    w, h, psum, npix = _decode_bmp(b)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["pixel_sum"].append(psum)
                    rows["n_pixels"].append(npix)
                    rows["n_samples"].append(None)
                    rows["sample_sumsq"].append(None)
                else:
                    n, sumsq = _decode_wav(b)
                    rows["n_samples"].append(n)
                    rows["sample_sumsq"].append(sumsq)
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["pixel_sum"].append(None)
                    rows["n_pixels"].append(None)
            yield pd.DataFrame(rows)

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


@query(
    "multimodal_decode_features",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id <= 100),
    img AS (
      SELECT doc_id, 8 + doc_id % 16 AS w, 6 + doc_id % 12 AS h
      FROM ids WHERE doc_id % 2 = 0
    ),
    img_feat AS (
      SELECT i.doc_id, 'image' AS media_type,
             i.w AS width, i.h AS height, CAST(NULL AS BIGINT) AS n_samples,
             ROUND(CAST((SELECT SUM((i.doc_id + x.range + y.range) % 256)
                         FROM range(0, 32) x, range(0, 32) y
                         WHERE x.range < i.w AND y.range < i.h) AS DOUBLE)
                   / (i.w * i.h), 4) AS brightness,
             CAST(NULL AS DOUBLE) AS rms
      FROM img i
    ),
    aud AS (
      SELECT doc_id, 64 + doc_id % 64 AS n FROM ids WHERE doc_id % 2 = 1
    ),
    aud_feat AS (
      SELECT a.doc_id, 'audio' AS media_type,
             CAST(NULL AS BIGINT) AS width, CAST(NULL AS BIGINT) AS height,
             a.n AS n_samples,
             CAST(NULL AS DOUBLE) AS brightness,
             ROUND(SQRT(CAST((SELECT SUM(POW(((a.doc_id * 7 + i.range * 13) % 2048) - 1024, 2))
                              FROM range(0, 128) i WHERE i.range < a.n)
                             AS DOUBLE) / a.n), 4) AS rms
      FROM aud a
    )
    SELECT * FROM img_feat UNION ALL SELECT * FROM aud_feat
    """,
)
def multimodal_decode_features(spark, sf_dir):
    """REAL binary decode pipeline: encode actual BMP/WAV payloads →
    Arrow-batched mapInPandas decode (independent struct/wave parsers)
    → brightness (mean pixel) and RMS features. The DuckDB oracle
    recomputes both features from first principles over generated
    pixel/sample grids, so an exact match certifies the whole
    encode→bytes→decode→feature path cross-engine. The float math
    (divide, sqrt, round) runs in Spark expressions over the decoder's
    exact integer accumulators — IEEE-identical on both engines."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    decoded = decode_media_features(
        synthesize_decodable_media(d)
    )
    brightness = F.round(
        F.col("pixel_sum").cast("double") / F.col("n_pixels"), 4
    )
    rms = F.round(
        F.sqrt(F.col("sample_sumsq").cast("double") / F.col("n_samples")), 4
    )
    return decoded.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        "n_samples",
        brightness.alias("brightness"),
        rms.alias("rms"),
    )


# ---------------------------------------------------------------------------
# PNG (round 4, second pass): a real COMPRESSED image format, still pure
# stdlib — zlib inflate + per-scanline unfiltering. The encoder varies
# the filter type per row (None/Sub/Up) so the decoder's unfiltering
# logic is genuinely exercised; the decoder implements all five PNG
# filters and validates chunk CRCs.
# ---------------------------------------------------------------------------

import zlib  # noqa: E402


def _png_dims(doc_id: int) -> tuple[int, int]:
    return 5 + doc_id % 9, 4 + doc_id % 7


def _png_pixel(doc_id: int, x: int, y: int) -> int:
    return (doc_id * 3 + 5 * x + 11 * y) % 256


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png_bytes(doc_id: int) -> bytes:
    """Encode a real grayscale 8-bit PNG. Rows cycle filter types
    (0=None, 1=Sub, 2=Up) so decoding requires real unfiltering."""
    w, h = _png_dims(doc_id)
    raw = bytearray()
    prev = [0] * w
    for y in range(h):
        row = [_png_pixel(doc_id, x, y) for x in range(w)]
        ftype = y % 3
        raw.append(ftype)
        if ftype == 0:
            raw += bytes(row)
        elif ftype == 1:  # Sub: delta vs left
            raw += bytes((row[x] - (row[x - 1] if x else 0)) % 256 for x in range(w))
        else:  # Up: delta vs row above
            raw += bytes((row[x] - prev[x]) % 256 for x in range(w))
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes) -> tuple[int, int, int, int]:
    """Parse chunks (CRC-checked), inflate IDAT, unfilter scanlines
    (all five PNG filter types) → (w, h, pixel_sum, n_pixels).
    Grayscale 8-bit only — the format this pipeline writes."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    h = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", body, 0)
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    total = 0
    prev = [0] * w
    off = 0
    for _y in range(h):
        ftype = raw[off]
        line = list(raw[off + 1 : off + 1 + w])
        off += 1 + w
        out = [0] * w
        for x in range(w):
            a = out[x - 1] if x else 0  # left (already unfiltered)
            b = prev[x]                 # up
            c = prev[x - 1] if x else 0  # up-left
            if ftype == 0:
                v = line[x]
            elif ftype == 1:
                v = line[x] + a
            elif ftype == 2:
                v = line[x] + b
            elif ftype == 3:
                v = line[x] + (a + b) // 2
            elif ftype == 4:
                v = line[x] + _paeth(a, b, c)
            else:
                raise ValueError(f"bad filter {ftype}")
            out[x] = v % 256
        total += sum(out)
        prev = out
    return w, h, total, w * h


@query(
    "multimodal_png_decode",
    oracle="""
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id <= 100),
    dims AS (
      SELECT doc_id, 5 + doc_id % 9 AS w, 4 + doc_id % 7 AS h FROM ids
    )
    SELECT d.doc_id, d.w AS width, d.h AS height,
           ROUND(CAST((SELECT SUM((d.doc_id * 3 + 5 * x.range + 11 * y.range) % 256)
                       FROM range(0, 16) x, range(0, 16) y
                       WHERE x.range < d.w AND y.range < d.h) AS DOUBLE)
                 / (d.w * d.h), 4) AS brightness
    FROM dims d
    """,
)
def multimodal_png_decode(spark, sf_dir):
    """Compressed-image decode pipeline: encode real PNGs (zlib-deflated
    IDAT, per-row filter types cycling None/Sub/Up), decode them with a
    full five-filter unfiltering parser inside mapInPandas, and
    exact-match the mean brightness against a first-principles oracle.
    With BMP (uncompressed) and WAV (audio) this completes the
    stdlib-decodable multimodal tier; jpeg stays behind the PIL-gated
    decode_image hook."""
    png_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("pixel_sum", LongType()),
            StructField("n_pixels", LongType()),
        ]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height", "pixel_sum", "n_pixels")}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h, psum, npix = _decode_png(_png_bytes(doc_id))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["pixel_sum"].append(psum)
                rows["n_pixels"].append(npix)
            yield pd.DataFrame(rows)

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    decoded = d.select("doc_id").mapInPandas(_run, schema=png_schema)
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.round(F.col("pixel_sum").cast("double") / F.col("n_pixels"), 4).alias(
            "brightness"
        ),
    )


# ---------------------------------------------------------------------------
# JPEG (round 5): real lossy-DCT decode, pure numpy + stdlib — the
# format that was PIL-gated through r4. Encoder and decoder live in
# functions/jpeg_codec.py (baseline T.81: DCT, quantization, zigzag,
# canonical Huffman declared in DHT, byte stuffing). The suite query
# uses constant 8x8 blocks, where the lossy chain has an exact closed
# form (DC-only: v -> clamp(2*floor((v-128)/2 + 0.5) + 128) under the
# flat Q=16 DC table), so the oracle states decoded brightness from
# first principles; gradients/noise exercise the AC/Huffman paths in
# tests/test_jpeg_codec.py.
# ---------------------------------------------------------------------------


def _jpeg_block_value(doc_id: int, b: int) -> int:
    return (doc_id * 7 + 31 * b) % 256


def _jpeg_bytes(doc_id: int) -> bytes:
    import numpy as np

    from presto_on_ray_spark.functions.jpeg_codec import encode_baseline_jpeg

    img = np.zeros((16, 16), dtype=np.uint8)
    for b in range(4):
        by, bx = (b // 2) * 8, (b % 2) * 8
        img[by : by + 8, bx : bx + 8] = _jpeg_block_value(doc_id, b)
    return encode_baseline_jpeg(img)


@query(
    "multimodal_jpeg_decode",
    oracle="""
    WITH blocks AS (
      SELECT d.doc_id, b.range AS b,
             (d.doc_id * 7 + 31 * b.range) % 256 AS v
      FROM (SELECT doc_id FROM documents WHERE doc_id <= 100) d, range(0, 4) b
    )
    SELECT doc_id, 16 AS width, 16 AS height,
           ROUND(AVG(LEAST(255.0, GREATEST(0.0,
                 2 * FLOOR((v - 128) / 2.0 + 0.5) + 128))), 4) AS brightness
    FROM blocks GROUP BY doc_id
    """,
)
def multimodal_jpeg_decode(spark, sf_dir):
    """Lossy-DCT image decode end-to-end: encode real baseline JPEGs
    (four constant 8x8 blocks per document), decode them with the
    in-engine codec inside mapInPandas, and exact-match mean brightness
    against the closed-form DC-quantization oracle. Completes the
    multimodal decode tier (BMP/WAV/PNG/JPEG) with zero external
    libraries. Scale shape: identical to the PNG tier — Arrow-batched
    binary decode, one map pass, no shuffle."""
    import numpy as np

    from presto_on_ray_spark.functions.jpeg_codec import decode_baseline_jpeg

    jpeg_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("pixel_sum", LongType()),
            StructField("n_pixels", LongType()),
        ]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height", "pixel_sum", "n_pixels")}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                img = decode_baseline_jpeg(_jpeg_bytes(doc_id))
                h, w = img.shape
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["pixel_sum"].append(int(np.asarray(img, dtype="int64").sum()))
                rows["n_pixels"].append(h * w)
            yield pd.DataFrame(rows)

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    decoded = d.select("doc_id").mapInPandas(_run, schema=jpeg_schema)
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.round(F.col("pixel_sum").cast("double") / F.col("n_pixels"), 4).alias(
            "brightness"
        ),
    )
