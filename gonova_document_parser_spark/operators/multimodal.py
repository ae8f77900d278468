"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A training-data pipeline at corpus scale carries images/audio/video as
``binary`` columns with typed metadata and decodes them inside Arrow-batched
UDFs.  The decode step itself needs codec libraries that are NOT in this
container, so it is STUBBED (clearly marked below): ``decode_media`` either
raises ``NotImplementedError`` (strict mode) or produces a deterministic
fake feature vector (test mode).  Everything Spark-side — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested.

The reference's analog is its page-image path (PDF page -> PIL image ->
base64 -> model server, ``mineru_processor.py:150-176,264-331``); here the
bitmap decode/feature step is the pluggable stub and the distribution
plumbing is the deliverable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql import DataFrame

MEDIA_FEATURE_DIM = 16

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("media_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
        StructField("error", StringType(), True),
    ]
)


def sniff_media_type(data: bytes) -> str:
    """Container format from magic bytes (pure Python, no codec libs)."""
    if data.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    if data.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if data.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    if data.startswith(b"RIFF") and data[8:12] == b"WAVE":
        return "wav"
    if data.startswith(b"%PDF-"):
        return "pdf_scan"
    return "image"  # opaque binary: generic image payload


def parse_image_header(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the container header — REAL metadata decode,
    no codec library needed (only pixel decoding is stubbed below).

    PNG: IHDR width/height (big-endian u32 at offsets 16/20).
    GIF: logical screen descriptor (little-endian u16 at 6/8).
    JPEG: scan segment markers for a start-of-frame (SOF0..SOF15 except
    DHT/JPG/DAC), whose payload is [precision u8, height u16, width u16].
    """
    try:
        if data.startswith(b"\x89PNG\r\n\x1a\n") and len(data) >= 24:
            return (
                int.from_bytes(data[16:20], "big"),
                int.from_bytes(data[20:24], "big"),
            )
        if data.startswith((b"GIF87a", b"GIF89a")) and len(data) >= 10:
            return (
                int.from_bytes(data[6:8], "little"),
                int.from_bytes(data[8:10], "little"),
            )
        if data.startswith(b"\xff\xd8"):
            i, n = 2, len(data)
            while i + 9 < n:
                if data[i] != 0xFF:
                    i += 1
                    continue
                marker = data[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    height = int.from_bytes(data[i + 5 : i + 7], "big")
                    width = int.from_bytes(data[i + 7 : i + 9], "big")
                    return (width, height)
                i += 2 + max(seg_len, 2)
    except Exception:  # malformed header -> treated as opaque
        return None
    return None


def decode_media(payload: bytes, media_type: str, fake: bool = True):
    """Header metadata is decoded for real (``parse_image_header``); PIXEL
    decoding is STUBBED — it needs PIL/ffmpeg, not present in this container.

    Recognized image containers return their true header dimensions.  For
    the pixel-derived feature vector (and dimensions of opaque payloads):
    fake=True returns a deterministic (payload-hash-derived) stand-in so
    the distributed plumbing is testable; fake=False raises
    NotImplementedError exactly where a real pixel decoder would plug in.
    """
    dims = parse_image_header(payload)
    if not fake:
        raise NotImplementedError(
            "media PIXEL decode requires codec libraries (PIL/ffmpeg); "
            "plug a real decoder in here"
        )
    digest = hashlib.sha256(payload).digest()
    if dims is not None:
        width, height = dims  # real header metadata
    else:
        width = 1 + digest[0]  # deterministic fake dimensions
        height = 1 + digest[1]
    features = [b / 255.0 for b in digest[:MEDIA_FEATURE_DIM]]
    return width, height, features


def media_features(df: "DataFrame", payload_col: str = "html", fake: bool = True) -> "DataFrame":
    """(url, <binary payload>) -> per-item decoded metadata + feature vector.

    Arrow-batched mapInPandas; decode errors become error rows, never task
    failures (same policy as extraction M4).
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                mtype = sniff_media_type(data)
                try:
                    width, height, feats = decode_media(data, mtype, fake=fake)
                    rows.append((url, mtype, width, height, len(data), feats, None))
                except Exception as exc:  # noqa: BLE001
                    rows.append((url, mtype, None, None, len(data), None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "url",
                    "media_type",
                    "width",
                    "height",
                    "n_bytes",
                    "features",
                    "error",
                ],
            )

    return df.select("url", payload_col).mapInPandas(batches, MEDIA_FEATURES_SCHEMA)
