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


def decode_media(payload: bytes, media_type: str, fake: bool = True):
    """STUB — real decoding needs PIL/ffmpeg, not present in this container.

    fake=True returns a deterministic (payload-hash-derived) stand-in so the
    distributed plumbing is testable; fake=False raises NotImplementedError
    exactly where a real decoder would plug in.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires codec libraries (PIL/ffmpeg); "
            "plug a real decoder in here"
        )
    digest = hashlib.sha256(payload).digest()
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
                mtype = "image" if not data.startswith(b"%PDF-") else "pdf_scan"
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
