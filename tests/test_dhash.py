"""Perceptual dHash (multimodal.image_dhash / extract_image_dhash /
dhash_near_dup): the numpy implementation is pinned against an
independent pure-Python (no numpy) replay of the spec on random rasters;
the Spark stage decodes real containers; the banded near-dup join finds
exactly the pairs within the Hamming bound with no cartesian."""

import random

import numpy as np
import pytest

from htmlx.spark.multimodal import dhash_near_dup, extract_image_dhash, image_dhash
from htmlx.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-dhash-test")
    yield s
    s.stop()


def _reference_dhash(px_rows):
    """Independent spec replay: lists + loops only."""
    h = len(px_rows)
    w = len(px_rows[0])
    if isinstance(px_rows[0][0], (list, tuple)):
        g = [
            [
                (299 * p[0] + 587 * p[1] + 114 * p[2]) // 1000
                for p in row
            ]
            for row in px_rows
        ]
    else:
        g = px_rows
    ys = [r * h // 8 for r in range(8)] + [h]
    xs = [c * w // 9 for c in range(9)] + [w]
    means = []
    for r in range(8):
        mrow = []
        for c in range(9):
            vals = [
                g[y][x]
                for y in range(ys[r], ys[r + 1])
                for x in range(xs[c], xs[c + 1])
            ]
            mrow.append(sum(vals) // len(vals))
        means.append(mrow)
    out = 0
    for r in range(8):
        for c in range(8):
            out = (out << 1) | (1 if means[r][c + 1] > means[r][c] else 0)
    return out - (1 << 64) if out >= (1 << 63) else out


def test_matches_independent_replay_random_rasters():
    rng = random.Random(7)
    for _ in range(25):
        w, h = rng.randint(9, 40), rng.randint(8, 30)
        gray = [[rng.randint(0, 255) for _ in range(w)] for _ in range(h)]
        assert image_dhash(np.array(gray, dtype=np.uint8)) == _reference_dhash(gray)
        rgb = [
            [(rng.randint(0, 255), rng.randint(0, 255), rng.randint(0, 255)) for _ in range(w)]
            for _ in range(h)
        ]
        assert image_dhash(np.array(rgb, dtype=np.uint8)) == _reference_dhash(rgb)


def test_known_gradients():
    w, h = 36, 16
    ltr = np.tile((2 * np.arange(w)).astype(np.uint8), (h, 1))
    assert image_dhash(ltr) == -1  # all 64 bits set (signed two's complement)
    assert image_dhash(ltr[:, ::-1].copy()) == 0  # strictly decreasing
    flat = np.full((h, w), 7, np.uint8)
    assert image_dhash(flat) == 0  # ties are NOT 'brighter'
    with pytest.raises(ValueError, match="image_too_small"):
        image_dhash(np.zeros((8, 8), np.uint8))


def test_alpha_ignored_and_small_perturbation_is_near():
    w, h = 45, 24
    base = np.tile((2 * np.arange(w)).astype(np.uint8), (h, 1))
    rgb = np.stack([base] * 3, axis=2)
    rgba = np.concatenate([rgb, np.random.default_rng(3).integers(0, 255, (h, w, 1), dtype=np.uint8).astype(np.uint8)], axis=2)
    assert image_dhash(rgb) == image_dhash(rgba) == -1
    # zero out the top-right block only: exactly bit (0,7) flips
    pert = base.copy()
    pert[: h // 8, 8 * w // 9:] = 0
    d = image_dhash(pert)
    assert bin((d ^ -1) & ((1 << 64) - 1)).count("1") == 1


def test_spark_stage_and_near_dup_pairs(spark, tmp_path):
    from htmlx.spark.tiffbmp import encode_bmp

    w, h = 36, 16
    base = np.tile((2 * np.arange(w)).astype(np.uint8), (h, 1))
    pert = base.copy()
    pert[: h // 8, 8 * w // 9:] = 0
    far = base[:, ::-1].copy()
    rows = [
        (1, bytearray(encode_bmp(np.stack([base] * 3, axis=2)))),
        (2, bytearray(encode_bmp(np.stack([pert] * 3, axis=2)))),
        (3, bytearray(encode_bmp(np.stack([far] * 3, axis=2)))),
        (4, bytearray(b"\x00\x01garbage")),
    ]
    d = str(tmp_path / "media")
    spark.createDataFrame(rows, "media_id long, payload binary").write.parquet(d)
    hashes = extract_image_dhash(spark.read.parquet(d))
    got = {r["media_id"]: (r["dhash"], r["error"]) for r in hashes.collect()}
    assert got[1] == (-1, "")
    assert got[3] == (0, "")
    assert got[4][1] != ""  # degrades, never throws
    assert bin((got[2][0] ^ -1) & ((1 << 64) - 1)).count("1") == 1

    ok = hashes.where("error = ''")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in dhash_near_dup(ok).collect()}
    assert pairs == {(1, 2): 1}  # 1~2 near; 3 is 64/63 bits away from both

    plan = dhash_near_dup(ok)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_identical_hashes_pair_at_zero(spark):
    df = spark.createDataFrame(
        [(1, 42), (2, 42), (3, -1)], "media_id long, dhash long"
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in dhash_near_dup(df).collect()}
    assert pairs == {(1, 2): 0}
