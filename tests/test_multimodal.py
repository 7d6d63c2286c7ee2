"""Multimodal plumbing invariants (SURVEY §2.11): deterministic stub
pipeline, stub gating, frame sampling."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from presto_on_ray_spark import suite
from presto_on_ray_spark.operators._util import t
from presto_on_ray_spark.operators.multimodal import (
    decode_image,
    extract_features,
    resize_image_stub,
    sample_frames,
    synthesize_media,
)

suite.load_all()


def test_decode_stub_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_features_deterministic_across_runs(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 20)
    a = extract_features(synthesize_media(d)).collect()
    b = extract_features(synthesize_media(d)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_payload_digest_matches_text_hash(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 20)
    feats = extract_features(synthesize_media(d)).select("doc_id", "payload_digest")
    expected = d.select("doc_id", F.sha2("text", 256).alias("payload_digest"))
    assert {tuple(r) for r in feats.collect()} == {tuple(r) for r in expected.collect()}


def test_frame_sample_covers_payload(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 20)
    media = synthesize_media(d)
    frames = sample_frames(media, n_frames=4)
    per_doc = frames.groupBy("doc_id").agg(F.count("*").alias("n"))
    assert per_doc.filter(F.col("n") != 4).count() == 0
    # frames are prefixes of the payload split; total bytes <= payload bytes
    joined = (
        frames.groupBy("doc_id")
        .agg(F.sum("frame_bytes").alias("fb"))
        .join(media.select("doc_id", F.length("payload").alias("pb")), "doc_id")
    )
    assert joined.filter(F.col("fb") > F.col("pb")).count() == 0


def test_resize_stub_shape():
    out = resize_image_stub(b"abcdef", 4, 3)
    assert len(out) == 12
    assert resize_image_stub(b"x", 2, 2) == b"xxxx"
