"""CCITT G3/G4 (ITU-T T.4/T.6) decode — twins, containers, edge cases,
fuzz. Real-encoder anchors live in test_real_anchors.py."""

import random

import numpy as np
import pytest

from htmlx.spark.ccitt import (
    decode_ccitt,
    encode_ccitt_g3_1d,
    encode_ccitt_g3_mixed,
    encode_ccitt_g4,
    encode_tiff_ccitt,
)


def _images(rng):
    for trial in range(120):
        h, w = int(rng.integers(1, 16)), int(rng.integers(1, 64))
        kind = trial % 5
        if kind == 0:
            yield (rng.random((h, w)) < 0.5).astype(np.uint8)
        elif kind == 1:
            yield np.zeros((h, w), np.uint8)
        elif kind == 2:
            yield np.ones((h, w), np.uint8)
        elif kind == 3:
            yield (np.add.outer(np.arange(h), np.arange(w)) % 3 == 0).astype(np.uint8)
        else:
            yield (rng.random((h, w)) < 0.05).astype(np.uint8)  # fax-like sparse ink


def test_g4_roundtrip_battery():
    rng = np.random.default_rng(11)
    for img in _images(rng):
        h, w = img.shape
        assert (decode_ccitt(encode_ccitt_g4(img), w, h, k=-1) == img).all()


def test_g3_1d_roundtrip_battery():
    rng = np.random.default_rng(12)
    for img in _images(rng):
        h, w = img.shape
        for ba, eol in ((False, False), (True, False), (False, True), (True, True)):
            enc = encode_ccitt_g3_1d(img, byte_align=ba, with_eol=eol)
            assert (decode_ccitt(enc, w, h, k=0, byte_align=ba) == img).all()


def test_long_runs_use_makeup_codes():
    # fax-width line: extended makeup (1792-2560) + chained makeups
    img = np.zeros((4, 3000), np.uint8)
    img[:, 2900:] = 1
    img[2, :7] = 1
    assert (decode_ccitt(encode_ccitt_g4(img), 3000, 4, k=-1) == img).all()
    assert (decode_ccitt(encode_ccitt_g3_1d(img), 3000, 4, k=0) == img).all()


def test_vertical_pass_horizontal_modes_all_hit():
    # staircase exercises V±1..±3; a wide gap under a narrow mark forces
    # pass mode; alternating noise forces horizontal
    img = np.zeros((8, 40), np.uint8)
    for y in range(8):
        img[y, 5 + y : 9 + y] = 1  # staircase (vertical modes)
    img[0, 20:36] = 1
    img[1, 24:26] = 1  # pass-mode shape
    img[7, ::2] = 1  # horizontal-mode noise
    assert (decode_ccitt(encode_ccitt_g4(img), 40, 8, k=-1) == img).all()


def test_tiff_container_twin_all_compressions():
    ink = (np.add.outer(np.arange(9), np.arange(31)) % 5 < 2).astype(np.uint8)
    from htmlx.spark.tiffbmp import decode_tiff

    for comp in (2, 3, 4):
        px = decode_tiff(encode_tiff_ccitt(ink, comp))
        assert px.shape == (9, 31, 1)
        assert (px[:, :, 0] == 255 * (1 - ink)).all()


def test_pdf_ccittfax_filter():
    """PDF CCITTFaxDecode image XObject: K<0 (G4) and K=0 (MH) routes,
    /BlackIs1 both ways."""
    from htmlx.spark.pdf import extract_pdf_images

    ink = (np.add.outer(np.arange(7), np.arange(19)) % 4 == 1).astype(np.uint8)
    h, w = ink.shape

    def pdf_with(data, extra):
        return (
            b"%PDF-1.7\n1 0 obj\n<< /Type /Catalog >>\nendobj\n"
            b"2 0 obj\n<< /Subtype /Image /Width " + str(w).encode()
            + b" /Height " + str(h).encode()
            + b" /Filter /CCITTFaxDecode " + extra
            + b" /Length " + str(len(data)).encode()
            + b" >>\nstream\n" + data + b"\nendstream\nendobj\n%%EOF\n"
        )

    g4 = encode_ccitt_g4(ink)
    out = extract_pdf_images(pdf_with(g4, b"/DecodeParms << /K -1 /Columns "
                                      + str(w).encode() + b" /Rows " + str(h).encode() + b" >>"))
    assert len(out) == 1 and out[0]["error"] == ""
    assert (out[0]["width"], out[0]["height"], out[0]["img_filter"]) == (w, h, "ccitt")
    import binascii
    import hashlib

    # BlackIs1 default false: sample 0 = black -> pixel 0
    expect = ((1 - ink) * 255).astype(np.uint8)
    assert out[0]["px_md5"] == hashlib.md5(binascii.hexlify(expect.tobytes())).hexdigest()

    mh = encode_ccitt_g3_1d(ink)
    out2 = extract_pdf_images(pdf_with(mh, b"/K 0 /BlackIs1 true"))
    assert out2[0]["error"] == ""
    expect2 = (ink * 255).astype(np.uint8)
    assert out2[0]["px_md5"] == hashlib.md5(binascii.hexlify(expect2.tobytes())).hexdigest()


def test_malformed_inputs_degrade_declared():
    with pytest.raises(ValueError):
        decode_ccitt(b"", 10, 10, k=-1)
    # all-ones is LEGAL (a run of V0s -> all-white rows), so pin that too
    assert (decode_ccitt(b"\xff\xff\xff", 10, 2, k=-1) == 0).all()
    with pytest.raises(ValueError):
        decode_ccitt(b"\x00\x00\x00", 10, 2, k=-1)  # 6+ zeros: no such 2D mode
    with pytest.raises(ValueError):
        decode_ccitt(b"\x00" * 8, 0, 4, k=-1)  # bad geometry
    # truncated mid-row
    img = (np.add.outer(np.arange(6), np.arange(30)) % 7 < 3).astype(np.uint8)
    enc = encode_ccitt_g4(img)
    with pytest.raises(ValueError):
        decode_ccitt(enc[: len(enc) // 3], 30, 6, k=-1)


def test_fuzz_declared_degradations_only():
    """Bit-flip + truncation fuzz: decode must return an array or raise
    ValueError — never IndexError/KeyError (mapInPandas task killers) and
    never hang (the no-progress guards)."""
    rng = random.Random(13)
    img = (np.add.outer(np.arange(8), np.arange(40)) % 6 < 3).astype(np.uint8)
    seeds = [
        (encode_ccitt_g4(img), -1, False),
        (encode_ccitt_g3_1d(img), 0, False),
        (encode_ccitt_g3_1d(img, byte_align=True), 0, True),
        (encode_ccitt_g3_1d(img, with_eol=True), 1, False),
    ]
    for seed, k, ba in seeds:
        for _ in range(150):
            b = bytearray(seed)
            for _ in range(rng.randint(1, 5)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            cut = rng.randrange(len(b) + 1)
            for payload in (bytes(b), bytes(b[:cut])):
                try:
                    out = decode_ccitt(payload, 40, 8, k=k, byte_align=ba)
                    assert out.shape == (8, 40)
                except ValueError:
                    pass


def test_g3_mixed_mode_roundtrip_battery():
    """PDF /K > 0 route: EOL + tag bit per row, alternating and all-2D
    row coding (encode_ccitt_g3_mixed twin)."""
    rng = np.random.default_rng(21)
    for img in _images(rng):
        h, w = img.shape
        for pattern in ("alternate", "all2d"):
            enc = encode_ccitt_g3_mixed(img, pattern)
            assert (decode_ccitt(enc, w, h, k=1) == img).all()


def test_tiff_t4_2d_flag():
    from htmlx.spark.tiffbmp import decode_tiff

    ink = (np.add.outer(np.arange(11), np.arange(37)) % 6 < 3).astype(np.uint8)
    px = decode_tiff(encode_tiff_ccitt(ink, compression=3, mixed=True))
    assert (px[:, :, 0] == 255 * (1 - ink)).all()


def test_pdf_ccitt_k_positive():
    from htmlx.spark.pdf import extract_pdf_images

    ink = (np.add.outer(np.arange(6), np.arange(23)) % 5 < 2).astype(np.uint8)
    h, w = ink.shape
    data = encode_ccitt_g3_mixed(ink)
    body = (
        b"%PDF-1.7\n1 0 obj\n<< /Subtype /Image /Width " + str(w).encode()
        + b" /Height " + str(h).encode()
        + b" /Filter /CCITTFaxDecode /DecodeParms << /K 1 /Columns "
        + str(w).encode() + b" /Rows " + str(h).encode() + b" >>"
        + b" /Length " + str(len(data)).encode()
        + b" >>\nstream\n" + data + b"\nendstream\nendobj\n%%EOF\n"
    )
    out = extract_pdf_images(body)
    assert out[0]["error"] == "" and (out[0]["width"], out[0]["height"]) == (w, h)
