"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The actual codec work (image decode, resampling, frame sampling) requires
libraries not present in this container (PIL/ffmpeg/torchaudio); the decode
step is STUBBED behind ``NotImplementedError`` with a deterministic fake
used in tests — but the Spark-side plumbing is real: schemas, batch
signatures, partitioning, and the metadata fast-paths that DON'T need a
codec (magic-byte sniffing, dimensions from headers) are fully implemented.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("source_url", StringType()),
    ]
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("mime_sniffed", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("error", StringType()),
    ]
)

_MAGIC = (
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"RIFF", "riff"),  # webp/wav disambiguated below
    (b"ID3", "audio/mpeg"),
    (b"\xff\xfb", "audio/mpeg"),
    (b"OggS", "audio/ogg"),
    (b"fLaC", "audio/flac"),
)


def sniff_mime(payload: bytes) -> str:
    """Magic-byte MIME sniff — pure Python, no codec needed."""
    if not payload:
        return ""
    for magic, mime in _MAGIC:
        if payload.startswith(magic):
            if mime == "riff" and len(payload) >= 12:
                sub = payload[8:12]
                return {b"WEBP": "image/webp", b"WAVE": "audio/wav"}.get(sub, "application/octet-stream")
            if mime != "riff":
                return mime
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "video/mp4"
    return "application/octet-stream"


def image_dimensions(payload: bytes) -> tuple[int, int]:
    """Header-only dimension extraction for PNG/GIF/JPEG (no decoder)."""
    if payload.startswith(b"\x89PNG\r\n\x1a\n") and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return w, h
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h
    if payload.startswith(b"\xff\xd8"):
        i = 2
        n = len(payload)
        while i + 9 < n:
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return w, h
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
    return 0, 0


def decode_image(payload: bytes):
    """Full image decode — requires an imaging library not present in this
    container. The Spark plumbing calls this behind a try/except so rows
    degrade to metadata-only with error='decoder_unavailable'."""
    raise NotImplementedError("image decode requires PIL/libvips (not in container)")


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """mapInPandas stage: binary payload -> typed metadata rows.

    Pure-Python header parsing (sniff + dimensions) runs for real; the
    deep-decode path is stubbed per module docstring."""
    import pandas as pd

    def meta_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(pdf.media_id, pdf.kind, pdf.payload):
                b = bytes(payload) if payload is not None else b""
                mime = sniff_mime(b)
                w = h = 0
                err = ""
                if kind == "image":
                    w, h = image_dimensions(b)
                    if (w, h) == (0, 0) and mime not in ("", "application/octet-stream"):
                        try:
                            decode_image(b)
                        except NotImplementedError:
                            err = "decoder_unavailable"
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "mime_sniffed": mime,
                        "byte_len": len(b),
                        "width": w,
                        "height": h,
                        "error": err,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return media.mapInPandas(meta_batch, MEDIA_META_SCHEMA)


# Byte-level feature spec (engine-defined, codec-free, cross-engine
# verifiable on the lowercase-hex basis):
#   hexstr        = lower(hex(payload))
#   payload_md5   = md5(hexstr)
#   frame i of N (frame_len bytes): off_i = (i * (byte_len - frame_len)) // (N - 1)
#                   frame_hash_i = md5(substr(hexstr, 2*off_i + 1, 2*frame_len));
#                   byte_len <= frame_len -> every frame hash = md5(hexstr)
#   entropy_x1000 = floor(1000 * sum over byte values ASCENDING (count>0)
#                   of -(c/n) * log2(c/n))   [sequential summation]
# This is the deterministic stand-in for the codec stage (real frame
# sampling needs ffmpeg, absent here): the Spark plumbing — binary columns
# through Arrow batches, numpy histogramming, per-frame digests — is real.
MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("payload_md5", StringType()),
        StructField("entropy_x1000", LongType()),
        StructField("frame0", StringType()),
        StructField("frame1", StringType()),
        StructField("frame2", StringType()),
        StructField("frame3", StringType()),
    ]
)


def extract_media_features(media: DataFrame, n_frames: int = 4, frame_len: int = 16) -> DataFrame:
    """mapInPandas stage: binary payload -> byte-level features + sampled
    frame digests (numpy histogram + hashlib; Arrow-batched)."""
    import binascii
    import hashlib
    import math

    import numpy as np
    import pandas as pd

    def feat_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf.media_id, pdf.payload):
                b = bytes(payload) if payload is not None else b""
                hx = binascii.hexlify(b)
                n = len(b)
                counts = np.bincount(np.frombuffer(b, np.uint8), minlength=256) if n else []
                ent = 0.0
                for c in counts:  # ascending byte value, sequential sum
                    if c:
                        p = c / n
                        ent += -p * math.log2(p)
                frames = []
                for i in range(n_frames):
                    if n <= frame_len:
                        frames.append(hashlib.md5(hx).hexdigest())
                    else:
                        off = (i * (n - frame_len)) // (n_frames - 1)
                        frames.append(
                            hashlib.md5(hx[2 * off : 2 * (off + frame_len)]).hexdigest()
                        )
                rows.append(
                    {
                        "media_id": media_id,
                        "byte_len": n,
                        "payload_md5": hashlib.md5(hx).hexdigest(),
                        "entropy_x1000": math.floor(1000 * ent),
                        "frame0": frames[0],
                        "frame1": frames[1],
                        "frame2": frames[2],
                        "frame3": frames[3],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURES_SCHEMA.fields])

    return media.mapInPandas(feat_batch, MEDIA_FEATURES_SCHEMA)
