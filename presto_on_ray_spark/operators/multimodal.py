"""Multimodal columns (SURVEY §2.11): image/audio/video as opaque
binary columns + typed metadata, processed via Arrow-batched
mapInPandas.

The decode step is STUBBED (no image/audio libs in this container):
``decode_image`` raises NotImplementedError unless a real decoder is
importable, and the pipeline's default feature extractor is a
clearly-marked deterministic fake. The Spark-side plumbing — schema,
binary payload handling, batch iteration, partitioning — is real and
tested; swapping the fake for PIL/librosa is a one-function change.
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
    """Real decode hook — STUB. Raises unless an image library exists.

    Swap-in point for PIL: ``Image.open(io.BytesIO(payload))``.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "environment; use extract_features() which runs the stubbed "
            "deterministic feature path"
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
