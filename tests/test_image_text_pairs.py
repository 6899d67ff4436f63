"""image_text_pairs: (image, caption, quality) training-pair
construction — caption fallback + byte-length/lang gates, one-pass
decode, dHash dedup with component keepers, precedence reasons.

Rasters are the proven BMP-gradient family (dHash constants pinned in
test_dhash.py): left-to-right => all-ones hash, right-to-left =>
all-zero, zeroed top-right block => exactly one bit off all-ones."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from htmlx.spark.multimodal import image_text_pairs
from htmlx.spark.session import get_spark
from htmlx.spark.tiffbmp import encode_bmp


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-imgtext-test")
    yield s
    s.stop()


def _grad(w, h, reverse=False, perturb=False):
    vals = 2 * np.arange(w)
    if reverse:
        vals = 2 * (w - 1 - np.arange(w))
    g = np.tile(vals.astype(np.uint8), (h, 1))
    if perturb:
        g = g.copy()
        g[: h // 8, 8 * w // 9 :] = 0
    return bytearray(encode_bmp(np.stack([g] * 3, axis=2)))


EN = "a nice photo of the sea"
FR = "le chat est sur le tapis et la vie est une chanson de paris"


def _frames(spark):
    imgs = [
        # (page_id, media_id, src, alt, title)
        (100, 1, "https://a/1.bmp", EN, ""),
        (100, 2, "https://a/2.bmp", EN, ""),  # exact-dhash dup of 1
        (101, 3, "https://a/3.bmp", EN, ""),  # hamming-1 near-dup of 1
        (101, 4, "https://a/4.bmp", EN, ""),  # distinct component keeper
        (102, 5, "https://a/5.bmp", EN, ""),  # corrupt payload
        (102, 6, "https://a/6.bmp", EN, ""),  # 8x8: too small to hash
        (103, 7, "https://a/7.bmp", "tiny", ""),  # 4 bytes < min 5
        (103, 8, "https://a/8.bmp", FR, ""),  # lang gate
        (104, 9, "https://a/9.bmp", "", None),  # no caption at all
        (104, 10, "https://a/10.bmp", "very " * 120, ""),  # 600 bytes > 512
        (105, 11, "https://a/11.bmp", EN, ""),  # no media row
        (105, 12, "https://a/12.bmp", "", "a calm photo of the lake"),  # title fallback
    ]
    media = [
        (1, _grad(12, 8)),
        (2, _grad(24, 16)),
        (3, _grad(18, 8, perturb=True)),
        (4, _grad(12, 8, reverse=True)),
        (5, bytearray(b"notanimage")),
        (6, _grad(8, 8)),
        (7, _grad(30, 16, reverse=True)),
        (8, _grad(12, 8)),
        (9, _grad(12, 8)),
        (10, _grad(12, 8)),
        # 11 deliberately absent
        (12, _grad(40, 24, reverse=True)),
    ]
    images = spark.createDataFrame(
        imgs, "page_id long, media_id long, src string, alt string, title string"
    )
    mdf = spark.createDataFrame(media, "media_id long, payload binary")
    return images, mdf


def test_reason_precedence_and_keepers(spark):
    images, media = _frames(spark)
    out = {
        r["media_id"]: r
        for r in image_text_pairs(images, media).collect()
    }
    want = {
        1: "",
        2: "near_dup_image",
        3: "near_dup_image",  # via the hamming-1 component, keeper 1
        4: "",
        5: "decode_error",
        6: "image_too_small",
        7: "caption_too_short",
        8: "caption_lang",
        9: "no_caption",
        10: "caption_too_long",
        11: "missing_media",
        12: "near_dup_image",  # title fallback, but dup of keeper 4
    }
    assert {m: r["reason"] for m, r in out.items()} == want
    assert {m for m, r in out.items() if r["keep"]} == {1, 4}
    # caption fallback + lang + byte accounting
    assert out[12]["caption"] == "a calm photo of the lake"
    assert out[12]["caption_lang"] == "en"
    assert out[8]["caption_lang"] == "fr"
    assert out[10]["caption_bytes"] == 599  # trailing space trimmed
    assert out[9]["caption"] is None and out[9]["caption_bytes"] == 0
    # one decoded geometry surfaced
    assert (out[1]["width"], out[1]["height"]) == (12, 8)


def test_gated_dup_never_shadows_keeper(spark):
    """media 7 shares media 4's dhash class but is caption-gated: the
    pool must exclude it, so 4 stays keeper — and 7's reason is the
    caption gate, not near_dup_image."""
    images, media = _frames(spark)
    out = {r["media_id"]: r for r in image_text_pairs(images, media).collect()}
    assert out[7]["reason"] == "caption_too_short"
    assert out[4]["keep"] is True


def test_same_media_on_two_pages_keeps_page_granularity(spark):
    images, media = _frames(spark)
    extra = spark.createDataFrame(
        [(200, 1, "https://b/1.bmp", EN, "")],
        "page_id long, media_id long, src string, alt string, title string",
    )
    out = image_text_pairs(images.unionByName(extra), media)
    rows = out.where(F.col("media_id") == 1).collect()
    assert len(rows) == 2 and all(r["keep"] for r in rows)
    assert {r["page_id"] for r in rows} == {100, 200}


def test_imgtext_cli_emit_pairs(spark, tmp_path, monkeypatch):
    """--emit-pairs writes the KEPT (caption, payload) dataset — dropped
    rows and their payloads never reach it."""
    import sys

    import jobs.curate as jc

    images, media = _frames(spark)
    ip, mp = str(tmp_path / "imgs.parquet"), str(tmp_path / "media.parquet")
    images.write.parquet(ip)
    media.write.parquet(mp)
    pairs_out = str(tmp_path / "pairs.parquet")
    monkeypatch.setattr(sys, "argv", [
        "curate.py", "--input", ip, "--media-input", mp,
        "--output", str(tmp_path / "out"), "--mode", "imgtext",
        "--emit-pairs", pairs_out,
    ])
    jc.main()
    rows = {r["media_id"]: r for r in spark.read.parquet(pairs_out).collect()}
    assert set(rows) == {1, 4}
    assert rows[1]["caption"] == EN and len(bytes(rows[1]["payload"])) > 50
