"""FLAC decode (pure Python/numpy: Rice residuals, FIXED/LPC predictors,
stereo decorrelation, CRC-8/16 + PCM-MD5 verification)."""

import numpy as np
import pytest

from htmlx.spark.flac import decode_flac, encode_flac


def test_mono_roundtrips_across_signal_shapes():
    rnd = np.random.RandomState(5)
    for sig in (
        rnd.randint(-2000, 2000, 5000),  # noise (rice param high)
        (np.arange(7000) * 3 % 4001) - 2000,  # ramp (fixed-order friendly)
        np.full(3000, 123),  # constant subframes
        np.concatenate([np.full(4096, -7), rnd.randint(-30000, 30000, 1000)]),
    ):
        s = sig.astype(np.int64)[:, None]
        rate, ch, out = decode_flac(encode_flac(s, 16000))
        assert (rate, ch) == (16000, 1)
        assert out.shape == s.shape and (out == s).all()


def test_stereo_decorrelation_modes():
    l = (np.sin(np.arange(6000) / 30) * 8000).astype(np.int64)
    r = (np.sin(np.arange(6000) / 17 + 1) * 6000).astype(np.int64)
    s = np.stack([l, r], 1)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        rate, ch, out = decode_flac(encode_flac(s, 44100, stereo_mode=mode))
        assert ch == 2 and (out == s).all(), mode


def test_lpc_subframe_path():
    rnd = np.random.RandomState(6)
    s = rnd.randint(-500, 500, (5000, 1)).astype(np.int64)
    _, _, out = decode_flac(encode_flac(s, 8000, lpc=True))
    assert (out == s).all()


def test_short_last_frame_and_small_blocks():
    rnd = np.random.RandomState(7)
    s = rnd.randint(-100, 100, (301, 2)).astype(np.int64)
    _, _, out = decode_flac(encode_flac(s, 8000, block_size=128))
    assert (out == s).all()


def test_corruption_caught_by_crc_or_md5():
    rnd = np.random.RandomState(8)
    s = rnd.randint(-500, 500, (4000, 1)).astype(np.int64)
    good = encode_flac(s, 8000)
    for pos in (len(good) // 3, len(good) // 2, len(good) - 5):
        bad = bytearray(good)
        bad[pos] ^= 0x40
        with pytest.raises(ValueError):
            decode_flac(bytes(bad))


def test_error_paths():
    with pytest.raises(ValueError):
        decode_flac(b"not a flac")
    with pytest.raises(ValueError):
        decode_flac(b"fLaC")  # truncated metadata
    good = encode_flac(np.zeros((100, 1), np.int64), 8000)
    with pytest.raises(ValueError):
        decode_flac(good[:40])  # inside STREAMINFO


def test_audio_dispatch():
    from htmlx.spark.multimodal import decode_audio, encode_wav, sniff_mime

    rnd = np.random.RandomState(9)
    s = rnd.randint(-1000, 1000, (500, 2)).astype(np.int64)
    fl = encode_flac(s, 16000)
    assert sniff_mime(fl) == "audio/flac"
    rate, ch, out = decode_audio(fl)
    assert (rate, ch) == (16000, 2) and (out == s).all()
    rate, ch, out = decode_audio(encode_wav(s.astype(np.int16), 16000))
    assert (out == s).all()
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04 mp3 data")
