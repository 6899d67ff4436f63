"""Multimodal plumbing: magic-byte sniffing + header-only dimensions
(no codecs in container; deep decode is stubbed — see multimodal.py)."""

import struct

import pytest

from htmlx.spark.multimodal import decode_image, image_dimensions, sniff_mime


def _png(w, h):
    return b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", w, h) + b"\x08"


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 4


def _jpeg(w, h):
    # SOI + minimal SOF0 segment
    sof = b"\xff\xc0" + struct.pack(">H", 8 + 3) + b"\x08" + struct.pack(">HH", h, w) + b"\x03"
    return b"\xff\xd8" + sof + b"\xff\xd9"


def test_sniff():
    assert sniff_mime(_png(1, 1)) == "image/png"
    assert sniff_mime(_gif(1, 1)) == "image/gif"
    assert sniff_mime(b"\xff\xd8\xff\xe0JFIF") == "image/jpeg"
    assert sniff_mime(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "image/webp"
    assert sniff_mime(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "audio/wav"
    assert sniff_mime(b"ID3\x04") == "audio/mpeg"
    assert sniff_mime(b"OggS\x00") == "audio/ogg"
    assert sniff_mime(b"\x00\x00\x00\x18ftypisom") == "video/mp4"
    assert sniff_mime(b"garbage") == "application/octet-stream"
    assert sniff_mime(b"") == ""


def test_dimensions():
    assert image_dimensions(_png(640, 480)) == (640, 480)
    assert image_dimensions(_gif(13, 37)) == (13, 37)
    assert image_dimensions(_jpeg(800, 600)) == (800, 600)
    assert image_dimensions(b"junk") == (0, 0)


def test_decode_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(_png(1, 1))
