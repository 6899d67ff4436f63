"""Baseline JPEG decode (numpy huffman + dequant + IDCT) — the codec-free
tier for the dominant web image format. Reference treats images as
first-class media (media.go, extract.go:1044-1089)."""

import numpy as np
import pytest

from htmlx.spark.jpeg import decode_jpeg, encode_jpeg


def _blocky(bh, bw, seed=0):
    rnd = np.random.RandomState(seed)
    vals = rnd.randint(0, 256, (bh, bw)).astype(np.uint8)
    return np.repeat(np.repeat(vals, 8, 0), 8, 1)


def test_gray_dc_only_bit_exact():
    """Block-constant rasters with an all-ones quant table round-trip
    exactly: DC = 8*(v-128) is integral, IDCT recovers v to the bit."""
    for bh, bw in ((1, 1), (2, 3), (5, 4)):
        img = _blocky(bh, bw, bh * 10 + bw)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == (bh * 8, bw * 8, 1)
        assert (out[:, :, 0] == img).all()


def test_color_444_exact_gray_triplets():
    y = _blocky(3, 2, 7)
    ycc = np.stack([y, np.full_like(y, 128), np.full_like(y, 128)], 2)
    out = decode_jpeg(encode_jpeg(ycc))
    assert out.shape == (24, 16, 3)
    for c in range(3):
        assert (out[:, :, c] == y).all()


def test_color_420_with_restart_intervals():
    y = _blocky(4, 6, 9)  # 32 x 48: 2x3 MCUs at 4:2:0
    ycc = np.stack([y, np.full_like(y, 128), np.full_like(y, 128)], 2)
    out = decode_jpeg(encode_jpeg(ycc, subsampling=(2, 2), restart_interval=2))
    for c in range(3):
        assert (out[:, :, c] == y).all()


def test_general_content_quant1_within_one():
    """Arbitrary (non-block-constant) content exercises the AC run-length
    paths (ZRL, EOB, all size categories); quant=1 keeps total error to
    DCT float rounding, at most +-1 per sample."""
    rnd = np.random.RandomState(3)
    img = rnd.randint(0, 256, (16, 24)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))[:, :, 0].astype(int)
    assert np.abs(out - img.astype(int)).max() <= 1
    grad = ((np.arange(32)[None, :] * 3 + np.arange(16)[:, None] * 5) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(grad))[:, :, 0].astype(int)
    assert np.abs(out - grad.astype(int)).max() <= 1


def test_lossy_quant_roundtrip_bounded():
    q = np.full((8, 8), 16, np.int32)
    rnd = np.random.RandomState(4)
    img = rnd.randint(0, 256, (16, 16)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality_table=q))[:, :, 0].astype(int)
    # lossy but sane: bounded by quant-scale worst case, mean close
    assert np.abs(out - img.astype(int)).mean() < 64


def test_progressive_raises_not_implemented():
    jp = bytearray(encode_jpeg(_blocky(1, 1)))
    i = jp.index(b"\xff\xc0")
    jp[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(jp))


def test_corrupt_and_truncated_raise_value_error():
    good = encode_jpeg(_blocky(2, 2))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xee")
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])
    assert decode_jpeg(good) is not None  # sanity: the base payload decodes


def test_decode_image_dispatch_and_dimensions():
    from htmlx.spark.multimodal import decode_image, image_dimensions, sniff_mime

    img = _blocky(2, 3, 5)
    jp = encode_jpeg(img)
    out = decode_image(jp)
    assert (out[:, :, 0] == img).all()
    assert image_dimensions(jp) == (24, 16)
    assert "jpeg" in sniff_mime(jp)


def test_byte_stuffing_survives():
    """Craft content whose entropy stream is statistically certain to
    contain 0xFF bytes (forcing stuffed zeros on encode)."""
    rnd = np.random.RandomState(11)
    img = rnd.randint(0, 256, (24, 24)).astype(np.uint8)
    payload = encode_jpeg(img)
    out = decode_jpeg(payload)[:, :, 0].astype(int)
    assert np.abs(out - img.astype(int)).max() <= 1
