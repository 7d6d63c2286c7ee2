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


def test_bmp_roundtrip_decodes_what_was_encoded():
    """The struct-parsing decoder must recover dims and pixel sum from
    the encoder's actual BMP bytes (header offsets honored, bottom-up
    padded rows)."""
    from presto_on_ray_spark.operators.multimodal import (
        _bmp_bytes,
        _bmp_dims,
        _decode_bmp,
    )

    for doc_id in (0, 2, 14, 88, 100):
        w_exp, h_exp = _bmp_dims(doc_id)
        w, h, psum, npix = _decode_bmp(_bmp_bytes(doc_id))
        assert (w, h, npix) == (w_exp, h_exp, w_exp * h_exp)
        expected_sum = sum(
            (doc_id + x + y) % 256 for x in range(w_exp) for y in range(h_exp)
        )
        assert psum == expected_sum


def test_wav_roundtrip_decodes_what_was_encoded():
    from presto_on_ray_spark.operators.multimodal import (
        _decode_wav,
        _wav_bytes,
        _wav_len,
    )

    for doc_id in (1, 3, 77, 99):
        n_exp = _wav_len(doc_id)
        n, sumsq = _decode_wav(_wav_bytes(doc_id))
        assert n == n_exp
        assert sumsq == sum(
            (((doc_id * 7 + i * 13) % 2048) - 1024) ** 2 for i in range(n_exp)
        )


def test_decode_pipeline_runs_on_spark(spark, sf_dir):
    from presto_on_ray_spark import suite

    res = suite.QUERIES["multimodal_decode_features"](spark, sf_dir)
    rows = res.collect()
    assert len(rows) > 0
    imgs = [r for r in rows if r["media_type"] == "image"]
    auds = [r for r in rows if r["media_type"] == "audio"]
    assert imgs and auds
    assert all(0 <= r["brightness"] <= 255 for r in imgs)
    assert all(r["rms"] > 0 for r in auds)


def test_png_roundtrip_all_encoder_filters():
    """Decoder must unfilter the None/Sub/Up rows the encoder emits and
    reproduce the exact pixel sum."""
    from presto_on_ray_spark.operators.multimodal import (
        _decode_png,
        _png_bytes,
        _png_dims,
        _png_pixel,
    )

    for doc_id in (0, 1, 7, 42, 100):
        w_exp, h_exp = _png_dims(doc_id)
        w, h, psum, npix = _decode_png(_png_bytes(doc_id))
        assert (w, h, npix) == (w_exp, h_exp, w_exp * h_exp)
        assert psum == sum(
            _png_pixel(doc_id, x, y) for x in range(w_exp) for y in range(h_exp)
        )


def test_png_decoder_handles_average_and_paeth_filters():
    """Filters 3 (Average) and 4 (Paeth) aren't produced by our encoder;
    build a PNG with them by hand and check the decoder unfilters both."""
    import struct
    import zlib

    from presto_on_ray_spark.operators.multimodal import _paeth, _decode_png, _png_chunk

    w, h = 4, 3
    rows = [[10, 20, 30, 40], [15, 25, 35, 45], [50, 60, 70, 80]]
    raw = bytearray()
    prev = [0] * w
    for y, row in enumerate(rows):
        if y == 0:
            raw.append(0)
            raw += bytes(row)
        elif y == 1:  # Average
            raw.append(3)
            raw += bytes(
                (row[x] - ((row[x - 1] if x else 0) + prev[x]) // 2) % 256
                for x in range(w)
            )
        else:  # Paeth
            raw.append(4)
            raw += bytes(
                (row[x] - _paeth(row[x - 1] if x else 0, prev[x],
                                 prev[x - 1] if x else 0)) % 256
                for x in range(w)
            )
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )
    got = _decode_png(payload)
    assert got == (w, h, sum(sum(r) for r in rows), w * h)


def test_png_decoder_rejects_corrupt_crc():
    import pytest

    from presto_on_ray_spark.operators.multimodal import _decode_png, _png_bytes

    payload = bytearray(_png_bytes(5))
    payload[20] ^= 0xFF  # flip a bit inside IHDR
    with pytest.raises(ValueError, match="CRC"):
        _decode_png(bytes(payload))
