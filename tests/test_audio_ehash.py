"""Perceptual audio near-dup (multimodal.audio_ehash +
extract_audio_ehash): envelope difference hash over decoded PCM, paired
through the SAME hash-agnostic banded-Hamming machinery as image dHash.

Pins: an independent no-numpy pure-Python replay on random PCM, the
designed invariances (amplitude scale, sample rate / duration, stereo
mix), ramp hash constants, the too-short bound, decode degradation for
codec-needing containers, and near-dup pairing over ehash."""

import random

import pytest

from htmlx.spark.multimodal import (
    audio_ehash,
    dhash_near_dup,
    encode_wav,
    extract_audio_ehash,
)
from htmlx.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-audio-ehash-test")
    yield s
    s.stop()


def _py_ehash(samples_2d):
    """Independent replay: plain Python ints, no numpy."""
    frames = [sum(f) // len(f) for f in samples_2d]
    n = len(frames)
    assert n >= 72
    bounds = [i * n // 72 for i in range(72)] + [n]
    means = []
    for k in range(72):
        seg = frames[bounds[k]:bounds[k + 1]]
        means.append(sum(abs(v) for v in seg) // len(seg))
    bits = 0
    for r in range(8):
        for c in range(8):
            bits = (bits << 1) | (1 if means[r * 9 + c + 1] > means[r * 9 + c] else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def test_matches_independent_replay_on_random_pcm():
    import numpy as np

    rng = random.Random(3)
    for trial in range(20):
        n = rng.randrange(72, 400)
        ch = rng.choice([1, 2])
        raw = [[rng.randrange(-32768, 32768) for _ in range(ch)] for _ in range(n)]
        a = np.array(raw, np.int64)
        assert audio_ehash(8000, ch, a) == _py_ehash(raw), (trial, n, ch)


def test_ramp_constants_and_invariances():
    import numpy as np

    up = 2 * np.arange(100)
    assert audio_ehash(8000, 1, up) == -1            # all ones
    assert audio_ehash(8000, 1, up[::-1].copy()) == 0
    # amplitude scaling invariance (order-preserving integer scale)
    assert audio_ehash(8000, 1, up * 13) == -1
    # duration / rate invariance: same shape at a different length
    up2 = 2 * np.arange(171)
    assert audio_ehash(44100, 1, up2) == -1
    # stereo mix == mono of the same ramp
    st = np.stack([up, up], axis=1)
    assert audio_ehash(8000, 2, st) == -1
    # final-segment dip flips exactly the last comparison
    dip = up2.copy()
    dip[71 * 171 // 72:] = 0
    assert audio_ehash(8000, 1, dip) == -2           # ...fffe


def test_too_short():
    import numpy as np

    with pytest.raises(ValueError, match="audio_too_short"):
        audio_ehash(8000, 1, np.arange(71))


def test_extract_stage_and_pairing(spark):
    import numpy as np

    up = (2 * np.arange(100)).astype(np.int64)
    dip = up.copy(); dip[71 * 100 // 72:] = 0
    rows = [
        (1, bytearray(encode_wav(up))),
        (2, bytearray(encode_wav(up * 3, rate=44100))),   # scaled+resampled dup
        (3, bytearray(encode_wav(dip))),                  # hamming-1 neighbor
        (4, bytearray(encode_wav(up[::-1].copy()))),      # far (hamming 64)
        (5, bytearray(b"ID3" + b"\x00" * 64)),            # mp3: degrade
        (6, bytearray(encode_wav(np.arange(10)))),        # too short
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in extract_audio_ehash(df).collect()}
    assert got[1]["ehash"] == got[2]["ehash"] == -1
    assert got[3]["ehash"] == -2 and got[4]["ehash"] == 0
    assert got[5]["error"] == "decoder_unavailable"
    assert got[6]["error"] == "audio_too_short"
    ok = spark.createDataFrame(
        [(k, v["ehash"]) for k, v in got.items() if v["error"] == ""],
        "media_id long, ehash long",
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dhash_near_dup(ok, hash_col="ehash").collect()}
    assert pairs[(1, 2)] == 0       # exact perceptual dup
    assert pairs[(1, 3)] == 1 and pairs[(2, 3)] == 1
    assert (1, 4) not in pairs      # far stays unpaired
