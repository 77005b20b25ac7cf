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
    """REAL general-purpose image decode — stub for formats that need a
    codec library (JPEG/PNG/WebP); wire PIL/libvips here in an environment
    that has them. Uncompressed 24-bpp BMP is decoded for real by
    ``decode_bmp`` below (pure Python, public format)."""
    raise NotImplementedError(
        "general image codecs not available in this environment; BMP is "
        "supported natively (decode_bmp) — use the deterministic fake "
        "decode path (extract_image_features) for other formats"
    )


# ------------------------------------------------------------ real BMP codec
#
# Windows BMP, BITMAPINFOHEADER, 24 bpp, uncompressed (BI_RGB) — the format
# is public (it ships with every OS); this is a dependency-free reference
# implementation. Layout: 14-byte file header ("BM", file size, pixel-data
# offset) + 40-byte info header (width, signed height, planes, bpp,
# compression) + pixel rows, each padded to a 4-byte boundary, stored
# BOTTOM-UP when height > 0 (top-down when height < 0).


def encode_bmp(width: int, height: int, pixels_bgr: bytes) -> bytes:
    """Encode a real uncompressed 24-bpp BMP from row-major top-down BGR
    bytes (len == width*height*3). Rows are written bottom-up with 4-byte
    padding, per the format."""
    if len(pixels_bgr) != width * height * 3:
        raise ValueError("pixels_bgr must be width*height*3 bytes")
    row_len = width * 3
    pad = (-row_len) % 4
    img_size = (row_len + pad) * height
    offset = 14 + 40
    header = b"BM" + (offset + img_size).to_bytes(4, "little") + b"\x00\x00\x00\x00"
    header += offset.to_bytes(4, "little")
    info = (
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + img_size.to_bytes(4, "little")
        + b"\x00" * 16
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        rows.append(pixels_bgr[y * row_len : (y + 1) * row_len] + b"\x00" * pad)
    return header + info + b"".join(rows)


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode an uncompressed 24-bpp BMP: returns (width, height, channels,
    pixels) with pixels row-major TOP-DOWN BGR, padding stripped. Handles
    both bottom-up (height > 0) and top-down (height < 0) files."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = int.from_bytes(data[10:14], "little")
    width = int.from_bytes(data[18:22], "little", signed=True)
    raw_height = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={compression}")
    height = abs(raw_height)
    bottom_up = raw_height > 0
    row_len = width * 3
    stride = row_len + ((-row_len) % 4)
    rows = []
    for i in range(height):
        y = (height - 1 - i) if bottom_up else i
        start = offset + y * stride
        rows.append(data[start : start + row_len])
    return width, height, 3, b"".join(rows)


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


#: Output schema of the REAL BMP decode path (oracle-checkable).
BMP_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixel_byte_sum", LongType()),
    ]
)


def with_bmp_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Attach a REAL BMP binary payload derived deterministically from each
    row: dimensions from the id (w = 1 + id % 13, h = 1 + id % 7 — widths
    1-13 cover every 4-byte row-padding case), pixel bytes = the row text's
    md5 digest cycled over width*height*3 BGR bytes. Because the
    construction is closed-form, the decoded features are analytically
    computable by an external SQL oracle — which is what promotes the
    decode path from rows-only to value-checked."""

    def _mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                i = int(doc_id)
                w, h = 1 + i % 13, 1 + i % 7
                n = w * h * 3
                d = hashlib.md5(str(text).encode("utf-8")).digest()
                pixels = (d * (n // len(d) + 1))[:n]
                rows.append(
                    {"doc_id": i, "payload": encode_bmp(w, h, pixels), "mime": "image/bmp"}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload", "mime"])

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("mime", StringType()),
        ]
    )
    return df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).mapInPandas(
        _mk, schema
    )


def extract_bmp_features(payloads: DataFrame) -> DataFrame:
    """REAL decode over BMP binary payloads: parse the file/info headers,
    strip row padding, re-order bottom-up rows, and reduce the pixel array
    (sum of BGR bytes — padding excluded, so a decoder that miscounts
    stride or padding fails the oracle). Arrow-batched mapInPandas, one
    narrow stage, no shuffle — identical plumbing to the stubbed codec
    paths, but the codec itself is real."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, c, pixels = decode_bmp(bytes(payload))
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": w,
                        "height": h,
                        "channels": c,
                        "pixel_byte_sum": sum(pixels),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in BMP_FEATURES_SCHEMA.fields])

    return payloads.mapInPandas(_extract, BMP_FEATURES_SCHEMA)


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


# ------------------------------------------------------------ real WAV codec
#
# RIFF/WAVE, PCM (format 1), 16-bit mono — the canonical uncompressed audio
# container; format is public. Chunk layout: "RIFF" <size> "WAVE" then a
# sequence of (<4-char id> <u32 size> <body>) chunks, odd-sized bodies padded
# one byte; "fmt " carries (format, channels, sample_rate, byte_rate,
# block_align, bits); "data" carries little-endian int16 samples.


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Encode 16-bit mono PCM samples into a real RIFF/WAVE file."""
    body = b"".join(
        int(s).to_bytes(2, "little", signed=True) for s in samples
    )
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")  # bits/sample
    )
    data = b"data" + len(body).to_bytes(4, "little") + body + (b"\x00" if len(body) % 2 else b"")
    riff_len = 4 + len(fmt) + len(data)
    return b"RIFF" + riff_len.to_bytes(4, "little") + b"WAVE" + fmt + data


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode RIFF/WAVE PCM-16 mono: returns (sample_rate, n_channels,
    samples). Walks the chunk sequence properly (fmt need not precede data
    at a fixed offset; unknown chunks are skipped, odd sizes padded)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, channels, bits, samples = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_format != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: format={audio_format} bits={bits}")
        elif cid == b"data":
            samples = [
                int.from_bytes(body[i : i + 2], "little", signed=True)
                for i in range(0, len(body) - 1, 2)
            ]
        pos += 8 + size + (size % 2)  # odd chunk bodies are padded
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return sample_rate, channels, samples


#: Output schema of the REAL WAV decode path (oracle-checkable).
WAV_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("sum_abs_amplitude", LongType()),
    ]
)


def with_wav_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Attach a REAL PCM WAV payload per row, closed-form like
    ``with_bmp_payload``: sample count and rate from the id, int16 sample i
    = little-endian pair (digest[2i mod 16], digest[2i+1 mod 16]) of the
    text's md5 — analytically reproducible by a SQL oracle."""

    def _mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                i = int(doc_id)
                n = 16 + i % 48
                rate = 8000 + (i % 3) * 4000
                d = hashlib.md5(str(text).encode("utf-8")).digest()
                samples = [
                    int.from_bytes(
                        bytes([d[(2 * j) % 16], d[(2 * j + 1) % 16]]),
                        "little",
                        signed=True,
                    )
                    for j in range(n)
                ]
                rows.append(
                    {"doc_id": i, "payload": encode_wav(rate, samples), "mime": "audio/wav"}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload", "mime"])

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("mime", StringType()),
        ]
    )
    return df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).mapInPandas(
        _mk, schema
    )


def extract_wav_features(payloads: DataFrame) -> DataFrame:
    """REAL audio decode over WAV binary payloads: chunk-walk the RIFF
    container, parse PCM-16 samples, reduce to integer features (sum of
    absolute amplitudes — exact, so value-hash-checkable). Arrow-batched
    mapInPandas, narrow stage, no shuffle."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, ch, samples = decode_wav(bytes(payload))
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "sample_rate": rate,
                        "n_channels": ch,
                        "n_samples": len(samples),
                        "sum_abs_amplitude": sum(abs(s) for s in samples),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in WAV_FEATURES_SCHEMA.fields])

    return payloads.mapInPandas(_extract, WAV_FEATURES_SCHEMA)


def resize_bmp_images(payloads: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize (binary → binary, 1→1): decode the BMP, resample
    with nearest-neighbor (src index = floor(dst·src_dim/dst_dim), the
    standard NN mapping), re-encode as BMP. No codec library — the whole
    path is the pure-Python BMP codec above, so unlike ``resize_images``
    (stubbed general-format path) this one is value-checkable end-to-end:
    an external oracle can predict every output pixel analytically when
    the input construction is closed-form (``with_bmp_payload``).

    Same scale posture as every multimodal op: Arrow-batched mapInPandas,
    one narrow stage, no shuffle."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _, pix = decode_bmp(bytes(payload))
                out = bytearray()
                for y2 in range(height):
                    ys = y2 * h // height
                    for x2 in range(width):
                        base = 3 * (ys * w + x2 * w // width)
                        out += pix[base : base + 3]
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "payload": encode_bmp(width, height, bytes(out)),
                        "width": width,
                        "height": height,
                        "channels": 3,
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
