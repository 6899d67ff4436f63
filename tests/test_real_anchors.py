"""REAL-ENCODER conformance anchors (VERDICT r4 item 2).

Every codec in this repo is otherwise validated by synthesis twins
(decode(encode(x)) == x) plus formula oracles — a shared spec misreading
on both twin sides would pass those gates. These fixtures were produced
by a genuinely independent codec suite, javax.imageio (JDK 17), via
tools/FixGen.java:

- real_baseline.jpg / real_progressive.jpg: a REAL photograph (Spark's
  mllib kitten sample, downscaled) encoded by ImageIO's JPEG writer
  (baseline SOF0 and progressive scripts), with ImageIO's own DECODED
  rasters frozen alongside (*.raster: >i4 h, w then RGB byte triples).
- real_imageio.gif: same photo through ImageIO's GIF encoder (palette
  quantization + LZW); tk_logo64.raster: ImageIO's decode of a
  REAL-WORLD tcl/tk GIF shipped by the OS.
- real_lzw.tif: ImageIO TIFF LZW — which writes the historical
  LATE code-width change (PDF EarlyChange=0), unlike the TIFF 6.0 spec
  wording; this anchor CAUGHT the repo's early-change-only decode and
  pinned the tolerant retry in tiffbmp.decompress.
- real_g4/g3/mh.tif: CCITT T.6 / T.4 / Modified-Huffman encodings of a
  deterministic bitonal pattern (bitonal.raster carries ImageIO's raw
  sample dump of the same pattern).
- real_imageio.bmp: the photo through ImageIO's BMP writer (lossless,
  byte-exact decode required).
- pluck-pcm16.wav: a REAL recording from CPython's test audio (PSF
  licence), cross-decoded against the stdlib wave module bit-exact.

FLAC has NO independent encoder in this container (no ffmpeg/flac/sox;
javax doesn't do FLAC). Its anchor is flac_spec_vector.flac: a stream
hand-assembled from the published format definition by
tools/flac_vector.py with independent bit assembly and CRC/MD5
implementations, exercising layouts the twin never emits (see
test_flac_spec_vector_bit_exact). That closes the twin blind spot to the
extent possible offline; a third-party-encoder cross-check remains the
one step only a real encoder binary could add.
"""

import os
import struct

import numpy as np
import pytest

DIR = os.path.join(os.path.dirname(__file__), "fixtures", "real_anchors")


def _raster(name):
    """RGB dump written by FixGen.dumpRaster (getRGB)."""
    with open(os.path.join(DIR, name), "rb") as f:
        h, w = struct.unpack(">II", f.read(8))
        return np.frombuffer(f.read(), np.uint8).reshape(h, w, 3)


def _samples(name):
    """Raw band-sample dump written by FixGen.dumpSamples."""
    with open(os.path.join(DIR, name), "rb") as f:
        h, w, b = struct.unpack(">III", f.read(12))
        return np.frombuffer(f.read(), np.uint8).reshape(h, w, b)


def _bytes(name):
    with open(os.path.join(DIR, name), "rb") as f:
        return f.read()


def _bitonal_pattern():
    h, w = 29, 71
    ys, xs = np.mgrid[0:h, 0:w]
    return (((xs * 7 + ys * 13) % 11 < 4) | (ys == 5) | ((xs > 60) & (ys % 2 == 0))).astype(
        np.uint8
    )


@pytest.mark.parametrize("name", ["baseline", "progressive"])
def test_real_jpeg_vs_imageio_decode(name):
    """Our JPEG decode of a REAL-encoder photographic file must agree with
    ImageIO's decode within DCT-conformance tolerance (T.81 allows small
    per-sample IDCT variation between conforming decoders; measured max
    delta on these fixtures is 3)."""
    from htmlx.spark.jpeg import decode_jpeg

    ref = _raster(f"{name}.raster")
    px = decode_jpeg(_bytes(f"real_{name}.jpg"))
    assert px.shape == ref.shape
    delta = np.abs(px.astype(int) - ref.astype(int))
    assert delta.max() <= 4, delta.max()
    assert delta.mean() < 1.0


def test_real_gif_imageio_exact():
    from htmlx.spark.multimodal import decode_gif

    ref = _raster("imageio_gif.raster")
    px = decode_gif(_bytes("real_imageio.gif"))
    assert px.shape == ref.shape and (px == ref).all()


def test_real_world_tk_gif_exact():
    """A GIF shipped by the OS (tcl/tk logo64.gif), decoded by ImageIO vs
    by this repo — both lossless, must agree byte-for-byte."""
    from htmlx.spark.multimodal import decode_gif

    path = "/usr/share/tcltk/tk8.6/images/logo64.gif"
    if not os.path.exists(path):
        pytest.skip("tcl/tk images not present on this host")
    ref = _raster("tk_logo64.raster")
    px = decode_gif(open(path, "rb").read())
    assert px.shape == ref.shape and (px == ref).all()


def test_real_tiff_lzw_late_change_exact():
    """ImageIO's TIFF LZW switches code width one code LATE (the
    historical interop split the PDF /EarlyChange parameter exists for).
    The spec-mode-then-retry in tiffbmp must decode it exactly."""
    from htmlx.spark.tiffbmp import decode_tiff

    ref = _samples("gray.raster")
    px = decode_tiff(_bytes("real_lzw.tif"))
    assert px.shape == (23, 37, 1)
    assert (px[:, :, 0] == ref[:, :, 0]).all()
    # and the pattern formula holds end-to-end (value = (x*31 + y*97) % 256)
    ys, xs = np.mgrid[0:23, 0:37]
    assert (px[:, :, 0] == ((xs * 31 + ys * 97) % 256).astype(np.uint8)).all()


@pytest.mark.parametrize("name", ["real_g4.tif", "real_g3.tif", "real_mh.tif"])
def test_real_ccitt_tiff_exact(name):
    """CCITT T.6 / T.4 / MH streams from a REAL encoder decode bit-exact
    (bitonal coding is lossless)."""
    from htmlx.spark.tiffbmp import decode_tiff

    ink = _bitonal_pattern()
    # Java's TYPE_BYTE_BINARY raw sample dump: sample 1 = white
    assert ((1 - _samples("bitonal.raster")[:, :, 0]) == ink).all()
    px = decode_tiff(_bytes(name))
    assert px.shape == (29, 71, 1)
    assert (px[:, :, 0] == 255 * (1 - ink)).all()


def test_real_mp3_anchor_exists():
    # the LAME-encoded MPEG2 anchor lives in test_audio_headers.py; keep a
    # cross-reference so the anchor inventory is greppable in one file
    assert os.path.exists(os.path.join(os.path.dirname(__file__), "fixtures", "real_lame_mpeg2.mp3"))


def test_real_bmp_imageio_exact():
    """ImageIO's BMP writer (24-bit bottom-up) on the photographic image;
    lossless, must decode byte-for-byte."""
    from htmlx.spark.tiffbmp import decode_bmp

    ref = _raster("imageio_bmp.raster")
    px = decode_bmp(_bytes("real_imageio.bmp"))
    assert px.shape == ref.shape and (px == ref).all()


def test_real_wav_vs_stdlib_wave_exact():
    """A REAL PCM recording (CPython's pluck-pcm16.wav test audio, PSF
    licence) decoded by this repo's RIFF walk vs the stdlib wave module —
    bit-exact sample agreement on a third-party-authored file."""
    import wave

    from htmlx.spark.multimodal import decode_wav

    path = os.path.join(DIR, "pluck-pcm16.wav")
    rate, ch, s = decode_wav(open(path, "rb").read())
    wf = wave.open(path)
    assert (rate, ch, s.shape[0]) == (wf.getframerate(), wf.getnchannels(), wf.getnframes())
    ref = np.frombuffer(wf.readframes(wf.getnframes()), "<i2").astype(np.int32).reshape(
        -1, wf.getnchannels()
    )
    assert (s == ref).all()


def test_real_wav_pcm8_in_place():
    # 8-bit variant read from the interpreter's own test data (skip if the
    # layout differs on another host)
    import wave

    from htmlx.spark.multimodal import decode_wav

    path = "/root/.pyenv/versions/3.13.0/lib/python3.13/test/audiodata/pluck-pcm8.wav"
    if not os.path.exists(path):
        pytest.skip("pyenv test audio not present")
    rate, ch, s = decode_wav(open(path, "rb").read())
    wf = wave.open(path)
    ref = np.frombuffer(wf.readframes(wf.getnframes()), np.uint8).astype(np.int32).reshape(
        -1, wf.getnchannels()
    ) - 128
    assert (s == ref).all() and rate == wf.getframerate()


def test_tiff_lzw_short_output_triggers_late_retry():
    """A late-change LZW stream can decode in early mode WITHOUT an
    invalid code, just short (misaligned reads land on valid entries) —
    the retry must key off output length too (review finding r5). The
    seed below deterministically reproduces the short-no-error shape."""
    import random

    from htmlx.spark.pdf import StreamCorruptError, lzw_decode_pdf
    from htmlx.spark.tiffbmp import encode_tiff, decode_tiff

    rng = random.Random(1)
    data = None
    for trial in range(200):
        n = 600 + (trial % 400)
        cand = bytes(rng.randrange(4) * 60 + rng.randrange(30) for _ in range(n))
        enc = lzw_decode = None
        enc = __import__("htmlx.spark.pdf", fromlist=["lzw_encode_pdf"]).lzw_encode_pdf(
            cand, early_change=0
        )
        try:
            if len(lzw_decode_pdf(enc, early_change=1)) < len(cand):
                data = cand
                break
        except StreamCorruptError:
            data = cand
            break
    assert data is not None, "no late-change divergence found in search space"
    # wrap as a gray TIFF strip encoded in LATE mode: splice the late
    # stream into an early-encoded container of the same geometry
    import struct

    import numpy as np

    w = len(data)
    img = np.frombuffer(data, np.uint8).reshape(1, w)
    t = bytearray(encode_tiff(img, compression=5))
    from htmlx.spark.pdf import lzw_encode_pdf

    late = lzw_encode_pdf(data, early_change=0)
    early = lzw_encode_pdf(data, early_change=1)
    # locate the early-encoded strip bytes and replace with the late ones
    idx = bytes(t).find(early)
    assert idx > 0, "strip bytes not found"
    t2 = bytes(t[:idx]) + late + bytes(t[idx + len(early):])
    # patch StripByteCounts (tag 279)
    j = t2.find(struct.pack("<HHI", 279, 4, 1))
    assert j > 0
    t2 = t2[: j + 8] + struct.pack("<I", len(late)) + t2[j + 12 :]
    px = decode_tiff(t2)
    assert (px[0, :, 0] == img[0]).all()


def test_real_tiled_ccitt_tiff_exact():
    """ImageIO TIFF writer with explicit 32x16 tiling + CCITT T.6: tiled
    bilevel layout from a REAL encoder decodes bit-exact."""
    from htmlx.spark.tiffbmp import decode_tiff

    ink = _bitonal_pattern()
    px = decode_tiff(_bytes("real_g4_tiled.tif"))
    assert px.shape == (29, 71, 1)
    assert (px[:, :, 0] == 255 * (1 - ink)).all()


def _audio_formula_pcm():
    """The AudioFixGen.java signal: ((i*2654435761 mod 2^32) >> 16) mod
    4096 - 2048, 400 stereo frames at 11025 Hz."""
    vals = ((np.arange(800, dtype=np.uint64) * 2654435761) & 0xFFFFFFFF) >> 16
    return ((vals % 4096).astype(np.int64) - 2048).reshape(400, 2)


def test_real_aiff_javasound_exact():
    """javax.sound's AIFF writer (big-endian PCM16 + 80-bit extended
    sample rate) decoded by this repo's FORM walk — bit-exact."""
    from htmlx.spark.multimodal import decode_aiff

    rate, ch, s = decode_aiff(_bytes("real_javasound.aiff"))
    assert (rate, ch) == (11025, 2)
    assert (s == _audio_formula_pcm()).all()


def test_real_au_javasound_exact():
    from htmlx.spark.multimodal import decode_au

    rate, ch, s = decode_au(_bytes("real_javasound.au"))
    assert (rate, ch) == (11025, 2)
    assert (s == _audio_formula_pcm()).all()


def test_real_ulaw_vs_jdk_g711_table_exact():
    """G.711 mu-law anchor: the JDK's UlawCodec encoded the formula
    signal into real_ulaw.au AND produced its own mu-law->PCM16 decode
    (ulaw_ref.pcm). This repo's formula-based table must reproduce the
    JDK's decode of the same bytes BIT-EXACTLY — two independent G.711
    implementations agreeing on a real payload."""
    from htmlx.spark.multimodal import decode_au

    rate, ch, s = decode_au(_bytes("real_ulaw.au"))
    ref = np.frombuffer(_bytes("ulaw_ref.pcm"), ">i2").astype(np.int32).reshape(400, 2)
    assert (rate, ch) == (11025, 2)
    assert (s == ref).all()


def test_real_alaw_vs_jdk_g711_table_exact():
    """Same two-independent-implementations anchor for G.711 A-law: this
    repo's formula decode of real_alaw.au must match the JDK AlawCodec's
    own PCM16 decode of the same bytes."""
    from htmlx.spark.multimodal import decode_au

    rate, ch, s = decode_au(_bytes("real_alaw.au"))
    ref = np.frombuffer(_bytes("alaw_ref.pcm"), ">i2").astype(np.int32).reshape(400, 2)
    assert (rate, ch) == (11025, 2)
    assert (s == ref).all()


def test_real_wbmp_imageio_exact():
    """javax.imageio's WBMP writer on a deterministic bitonal pattern —
    decoded bit-exact by this repo's multibyte-dims + row walk."""
    from htmlx.spark.multimodal import decode_wbmp

    px = decode_wbmp(_bytes("real_imageio.wbmp"))
    x, y = np.meshgrid(np.arange(61), np.arange(23))
    exp = (((x * 7 + y * 13) % 5 < 2) * 255).astype(np.uint8)[:, :, None]
    assert px.shape == (23, 61, 1) and (px == exp).all()


def test_flac_spec_vector_bit_exact():
    """VERDICT r5 item 3: the frozen FLAC vector was hand-assembled from
    the published format definition by tools/flac_vector.py — its own
    string-of-bits assembly, table-driven CRC-8/CRC-16, hashlib MD5 —
    sharing no code with flac.py or its encoder twin, and deliberately
    exercising layouts the twin never emits (partitioned Rice,
    blocksize/rate at end of header, wasted bits, left/side AND mid/side
    in one stream, short last block). Bit-exact decode closes the
    synthesis-twin blind spot to the extent possible without an
    independent encoder binary."""
    import json

    from htmlx.spark.flac import decode_flac

    payload = _bytes("flac_spec_vector.flac")
    with open(os.path.join(DIR, "flac_spec_vector.expected.json")) as f:
        exp = json.load(f)
    rate, ch, samples = decode_flac(payload)
    assert rate == exp["sample_rate"] and ch == exp["channels"]
    assert samples[:, 0].tolist() == exp["left"]
    assert samples[:, 1].tolist() == exp["right"]
    # integrity layers are live on this vector: flipping one PCM-carrying
    # byte must trip a CRC (or MD5) check, not silently alter samples
    bad = bytearray(payload)
    bad[-10] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # and the frozen bytes match the generator spec (regeneration guard)
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import flac_vector

    stream, expected = flac_vector.build()
    assert stream == payload and expected == exp


def test_real_subbyte_tiff_imageio_exact():
    """Sub-byte TIFF (r6): 1-bit uncompressed grayscale (BitsPerSample
    tag omitted — the TIFF 6.0 default of 1 must apply), 4-bit palette
    (uncompressed AND LZW) and 2-bit palette, all written by
    javax.imageio (tools/TiffSubByteGen.java) at a deliberately
    non-byte-multiple width (37), decoded bit-exactly against ImageIO's
    own rasters."""
    from htmlx.spark.tiffbmp import decode_tiff

    for tif, ras in (
        ("real_gray1.tif", "gray1.raster"),
        ("real_pal4.tif", "pal4.raster"),
        ("real_pal4_lzw.tif", "pal4.raster"),
        ("real_pal2.tif", "pal2.raster"),
    ):
        img = decode_tiff(_bytes(tif))
        exp = _raster(ras)
        got = np.repeat(img, 3, axis=2) if img.shape[2] == 1 else img
        assert got.shape == exp.shape and (got == exp).all(), tif
