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


def test_lossless_sof3_raises_not_implemented():
    jp = bytearray(encode_jpeg(_blocky(1, 1)))
    i = jp.index(b"\xff\xc0")
    jp[i + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(jp))


# --- progressive (SOF2) ----------------------------------------------------

def test_progressive_dc_only_bit_exact():
    img = _blocky(3, 4, 2)
    out = decode_jpeg(encode_jpeg(img, progressive=True))
    assert (out[:, :, 0] == img).all()


def test_progressive_color_exact_and_420():
    y = _blocky(2, 3, 6)
    ycc = np.stack([y, np.full_like(y, 128), np.full_like(y, 128)], 2)
    out = decode_jpeg(encode_jpeg(ycc, progressive=True))
    for c in range(3):
        assert (out[:, :, c] == y).all()
    # 4:2:0 progressive: non-interleaved AC scans over DIFFERENT block
    # grids per component
    rnd = np.random.RandomState(12)
    y = rnd.randint(0, 256, (32, 48)).astype(np.uint8)
    ycc = np.stack([y, np.full_like(y, 100), np.full_like(y, 150)], 2)
    base = decode_jpeg(encode_jpeg(ycc, subsampling=(2, 2)))
    prog = decode_jpeg(encode_jpeg(ycc, subsampling=(2, 2), progressive=True))
    assert np.abs(base.astype(int) - prog.astype(int)).max() <= 1


def test_progressive_equals_baseline_coefficients():
    """The strongest parity check: progressive scans (DC first/refine, AC
    first with EOB runs, AC refine correction bits) must transport the
    SAME quantized coefficients as the baseline encoding — decoded output
    identical byte-for-byte across random content, shapes and quants."""
    rnd = np.random.RandomState(13)
    for trial in range(12):
        h, w = 8 * rnd.randint(1, 6), 8 * rnd.randint(1, 6)
        img = rnd.randint(0, 256, (h, w)).astype(np.uint8)
        q = np.full((8, 8), int(rnd.choice([1, 2, 5, 16])), np.int32)
        a = decode_jpeg(encode_jpeg(img, quality_table=q, progressive=True))
        b = decode_jpeg(encode_jpeg(img, quality_table=q))
        assert (a == b).all(), (trial, h, w, int(q[0, 0]))


def test_progressive_long_eob_runs_and_zrl():
    """Sparse high-frequency content: most blocks are DC-only (long EOB
    runs across blocks) with isolated late AC coefficients (ZRL paths in
    both first and refine scans)."""
    img = np.full((48, 64), 90, np.uint8)
    img[7::8, 7::8] = 200  # one hot pixel per block tail
    img[20:28, :] = 90  # a fully flat band
    a = decode_jpeg(encode_jpeg(img, progressive=True))
    b = decode_jpeg(encode_jpeg(img))
    assert (a == b).all()


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


# ---------------------------------------------------------------------------
# 12-bit precision (SOF1 extended sequential / 12-bit SOF2 progressive)
# ---------------------------------------------------------------------------

def _blocky12(bh, bw, seed=0):
    """Block-constant 12-bit raster with values v8<<4: the decoded high
    byte (16-bit-TIFF convention) must equal v8 exactly."""
    rnd = np.random.RandomState(seed)
    v8 = rnd.randint(0, 256, (bh, bw)).astype(np.uint16)
    return v8, np.repeat(np.repeat(v8 << 4, 8, 0), 8, 1)


def test_12bit_gray_baseline_and_progressive_bit_exact():
    for bh, bw in ((1, 1), (3, 2), (4, 5)):
        v8, y12 = _blocky12(bh, bw, bh * 7 + bw)
        exp = np.repeat(np.repeat(v8, 8, 0), 8, 1).astype(np.uint8)
        for prog in (False, True):
            payload = encode_jpeg(y12, progressive=prog, precision=12)
            assert (b"\xff\xc2" if prog else b"\xff\xc1") in payload[:256]
            out = decode_jpeg(payload)
            assert out.shape == (bh * 8, bw * 8, 1)
            assert (out[:, :, 0] == exp).all()


def test_12bit_color_444_and_420_exact_gray_triplets():
    for sub in ((1, 1), (2, 2)):
        v8, y12 = _blocky12(2 * sub[1], 2 * sub[0], 13)
        exp = np.repeat(np.repeat(v8, 8, 0), 8, 1).astype(np.uint8)
        ycc = np.stack([y12, np.full_like(y12, 2048), np.full_like(y12, 2048)], 2)
        out = decode_jpeg(encode_jpeg(ycc, subsampling=sub, precision=12))
        assert out.shape[2] == 3
        for c in range(3):
            assert (out[:, :, c] == exp).all()


def test_12bit_general_content_high_byte_within_one():
    """Non-block-constant 12-bit data: quant-1 encode+decode is exact to
    DCT float rounding; the emitted high byte is within 1 of source>>4."""
    rnd = np.random.RandomState(21)
    img12 = rnd.randint(0, 4096, (16, 24)).astype(np.uint16)
    out = decode_jpeg(encode_jpeg(img12, precision=12))[:, :, 0].astype(int)
    assert np.abs(out - (img12 >> 4).astype(int)).max() <= 1


def test_12bit_dc_size_categories_above_11():
    """Adjacent blocks at the 12-bit extremes force DC diffs of magnitude
    ~32760 — size category 15, rejected for 8-bit, legal for 12-bit."""
    v12 = np.array([[0, 4095, 0, 4095]], np.uint16)
    y12 = np.repeat(np.repeat(v12, 8, 0), 8, 1)
    out = decode_jpeg(encode_jpeg(y12, precision=12))
    exp = np.repeat(np.repeat((v12 >> 4).astype(np.uint8), 8, 0), 8, 1)
    assert (out[:, :, 0] == exp).all()


def test_12bit_sof0_degrades_and_bad_precision_rejected():
    v8, y12 = _blocky12(1, 1, 3)
    payload = encode_jpeg(y12, precision=12)
    with pytest.raises(NotImplementedError):
        decode_jpeg(payload.replace(b"\xff\xc1", b"\xff\xc0", 1))
    with pytest.raises(ValueError):
        encode_jpeg(y12, precision=10)
    with pytest.raises(ValueError):
        encode_jpeg(np.full((8, 8), 4096, np.uint16), precision=12)


def test_12bit_decode_image_dispatch():
    from htmlx.spark.multimodal import decode_image, image_dimensions

    v8, y12 = _blocky12(2, 3, 9)
    payload = encode_jpeg(y12, precision=12)
    exp = np.repeat(np.repeat(v8, 8, 0), 8, 1).astype(np.uint8)
    assert (decode_image(payload)[:, :, 0] == exp).all()
    assert image_dimensions(payload) == (24, 16)
