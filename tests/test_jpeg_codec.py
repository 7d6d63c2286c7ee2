"""Baseline JPEG codec (functions/jpeg_codec.py): round-trip error
bounds, entropy-coding paths (AC run/size, ZRL, byte stuffing), marker
robustness, and the DC-only closed form the suite oracle leans on."""

from __future__ import annotations

import numpy as np
import pytest

from presto_on_ray_spark.functions.jpeg_codec import (
    _ZIGZAG,
    decode_baseline_jpeg,
    default_quant,
    encode_baseline_jpeg,
)


def test_zigzag_is_a_permutation_with_known_anchors():
    assert len(_ZIGZAG) == 64 and len(set(_ZIGZAG)) == 64
    assert _ZIGZAG[0] == (0, 0)
    assert _ZIGZAG[1] == (0, 1) and _ZIGZAG[2] == (1, 0)  # first diagonal
    assert _ZIGZAG[63] == (7, 7)


def test_constant_blocks_match_closed_form():
    """DC-only chain: v -> clamp(2*floor((v-128)/2 + 0.5) + 128) under
    the flat Q=16 DC table — the multimodal_jpeg_decode oracle."""
    for v in range(0, 256, 7):
        img = np.full((8, 8), v, dtype=np.uint8)
        dec = decode_baseline_jpeg(encode_baseline_jpeg(img))
        pred = min(255, max(0, 2 * int(np.floor((v - 128) / 2 + 0.5)) + 128))
        assert (dec == pred).all(), (v, dec[0, 0], pred)


def test_gradient_roundtrip_error_bounded():
    y, x = np.mgrid[0:24, 0:40]
    img = ((x * 3 + y * 5) % 256).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(img))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert dec.shape == img.shape
    assert err.mean() < 3 and err.max() <= 12


def test_noise_roundtrip_and_nonmultiple_dims():
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (17, 23)).astype(np.uint8)  # pads to 24x24
    dec = decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert dec.shape == (17, 23)  # cropped back to SOF dims
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 40  # bounded by quantization, not structural bugs


def test_unit_quant_table_is_near_lossless():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    dec = decode_baseline_jpeg(
        encode_baseline_jpeg(img, quant=np.ones((8, 8), dtype=int))
    )
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_byte_stuffing_roundtrip():
    """An image whose entropy stream contains 0xFF bytes must survive
    the stuff/unstuff cycle; sweep seeds until stuffing provably
    occurred (0xFF00 present between SOS and EOI)."""
    for seed in range(30):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
        blob = encode_baseline_jpeg(img)
        sos = blob.find(b"\xff\xda")
        if b"\xff\x00" in blob[sos:]:
            dec = decode_baseline_jpeg(blob)
            assert dec.shape == img.shape
            break
    else:
        pytest.fail("no seed produced a stuffed 0xFF byte (suspicious)")


def test_decoder_rejects_garbage_and_progressive():
    with pytest.raises(ValueError, match="SOI"):
        decode_baseline_jpeg(b"not a jpeg")
    # splice a progressive SOF2 marker into a valid stream's position
    img = np.full((8, 8), 100, dtype=np.uint8)
    blob = bytearray(encode_baseline_jpeg(img))
    idx = blob.find(b"\xff\xc0")
    blob[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_baseline_jpeg(bytes(blob))


def test_quant_table_written_and_used():
    """The DQT the encoder writes is what the decoder dequantizes with:
    a coarser table must produce a visibly coarser (but parseable)
    image, and the flat default stays the documented Q=16/24."""
    q = default_quant()
    assert q[0, 0] == 16 and q[3, 4] == 24
    img = (np.add.outer(np.arange(16) * 8, np.arange(16) * 6) % 256).astype(np.uint8)
    fine = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=np.ones((8, 8), int)))
    coarse = decode_baseline_jpeg(
        encode_baseline_jpeg(img, quant=np.full((8, 8), 120, int))
    )
    fine_err = np.abs(fine.astype(int) - img.astype(int)).mean()
    coarse_err = np.abs(coarse.astype(int) - img.astype(int)).mean()
    assert fine_err < coarse_err


def test_decode_image_hook_dispatches_jpeg():
    from presto_on_ray_spark.operators.multimodal import decode_image

    img = np.full((8, 8), 42, dtype=np.uint8)
    out = decode_image(encode_baseline_jpeg(img))
    assert out.shape == (8, 8)
    with pytest.raises(NotImplementedError, match="unsupported format"):
        decode_image(b"RIFFxxxxWEBP")
