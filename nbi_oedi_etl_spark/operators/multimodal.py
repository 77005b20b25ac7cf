"""Multimodal column plumbing (SURVEY.md §2.12).

Images/audio/video are opaque ``binary`` columns with typed metadata; the
engine provides the Spark-side machinery — schemas, Arrow batch transfer,
partition-parallel ``mapInPandas`` — while the actual codec calls are
STUBBED (the container has no image/audio libraries):

- ``decode_image_real`` raises NotImplementedError (clearly-marked stub for
  a PIL/libvips call).
- ``_fake_decode`` is the deterministic stand-in used by the shipped
  feature extractor: it derives (width, height, channels) from a stable
  hash of the payload, so tests are reproducible and the full pipeline
  (binary column → Arrow batches → pandas → feature rows) is exercised for
  real.

Scale: mapInPandas streams Arrow record batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``) — a 100 TB corpus of
payloads never materializes per-partition; one narrow stage, no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the image feature extractor (typed, stable).
IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_len", IntegerType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("decoded_ok", BooleanType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_hash", StringType()),
    ]
)


def decode_image_real(payload: bytes) -> tuple[int, int, int]:
    """REAL image decode — stub. Wire PIL/libvips here in an environment
    that has them; the container does not."""
    raise NotImplementedError(
        "image codec not available in this environment; use the deterministic "
        "fake decode path (extract_image_features)"
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: stable pseudo-dimensions derived
    from the payload digest."""
    d = hashlib.md5(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    channels = 1 + d[2] % 4
    return width, height, channels


def with_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", mime: str = "text/plain"
) -> DataFrame:
    """Attach an opaque binary payload + typed metadata. (In production the
    payload IS the stored bytes; here we derive one from text so the
    testdata exercises the real binary path.)"""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit(mime).alias("mime"),
    )


def extract_image_features(payloads: DataFrame) -> DataFrame:
    """Partition-parallel feature extraction over binary payloads.

    Input: (doc_id long, payload binary, mime string). Output:
    IMAGE_FEATURES_SCHEMA. Arrow-batched; no shuffle."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mime in zip(pdf["doc_id"], pdf["payload"], pdf["mime"]):
                data = bytes(payload)
                w, h, c = _fake_decode(data)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "payload_len": len(data),
                        "mime": mime,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "decoded_ok": True,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return payloads.mapInPandas(_extract, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def resize_images(payloads: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize shape (binary → binary, 1→1): decode → resample → re-encode.

    The codec is stubbed (deterministic fake: the output buffer is the
    payload digest cycled to exactly width×height×channels bytes) but the
    Spark contract is real — binary in, binary out, stable typed metadata,
    Arrow-batched, no shuffle. In production swap ``_fake_resize`` for a
    PIL/libvips call; nothing else changes."""

    def _fake_resize(data: bytes, w: int, h: int, c: int) -> bytes:
        d = hashlib.md5(data).digest()
        n = w * h * c
        return (d * (n // len(d) + 1))[:n]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                _, _, c = _fake_decode(data)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "payload": _fake_resize(data, width, height, c),
                        "width": width,
                        "height": height,
                        "channels": c,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return payloads.mapInPandas(_resize, RESIZED_SCHEMA)


def sample_frames(payloads: DataFrame, n_frames: int = 3) -> DataFrame:
    """Frame sampling shape (video → N rows per payload): demonstrates
    1→many mapInPandas output with bounded fan-out."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                # deterministic fake frame extraction: hash of payload slices
                step = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    chunk = data[i * step : (i + 1) * step] or b"\x00"
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": i,
                            "frame_hash": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return payloads.mapInPandas(_frames, FRAME_SCHEMA)
