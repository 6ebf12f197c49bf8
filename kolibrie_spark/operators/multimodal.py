"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, batch iteration, partition sizing) is real
and tested; the actual media decode is STUBBED — the container has no
image/audio libraries — behind ``decoder=`` hooks. ``deterministic_fake``
produces stable pseudo-features from the bytes so tests can assert
end-to-end behavior; passing ``decoder=None`` raises NotImplementedError at
the point a real codec (Pillow/torchaudio/decord) would plug in.

Scale notes: media bytes ride in parquet binary columns; ``mapInPandas``
streams Arrow record batches so one task never materializes more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` blobs; for 100 TB media,
set ``spark.sql.files.maxPartitionBytes`` so (blobs/partition × avg blob)
fits executor memory, and store frames/features columnar rather than
re-decoding downstream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("mime", StringType(), False),
        StructField("data", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("mime", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("decode_error", StringType(), True),
    ]
)


def deterministic_fake(data: bytes, dim: int = 16) -> list[float]:
    """Stable pseudo-feature: sha256 of the bytes expanded to ``dim`` floats
    in [0, 1). Stand-in for a real decode+embed; same bytes → same vector."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(data + counter.to_bytes(4, "big")).digest()
        for i in range(0, 32, 4):
            out.append(int.from_bytes(h[i : i + 4], "big") / 2**32)
            if len(out) == dim:
                break
        counter += 1
    return out


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = deterministic_fake,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Decode/feature-extract media blobs via mapInPandas (Arrow batches).

    ``decoder=None`` marks where a real codec goes: NotImplementedError.
    Per-row decode failures land in ``decode_error`` instead of killing the
    task — at 100 TB some blobs are always corrupt."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats, errs = [], []
            for data in pdf["data"]:
                if decoder is None:
                    raise NotImplementedError(
                        "real media decode requires an image/audio library; "
                        "plug a decoder(bytes) -> list[float] here"
                    )
                try:
                    feats.append(decoder(bytes(data) if data is not None else b""))
                    errs.append(None)
                except NotImplementedError:
                    raise
                except Exception as e:  # noqa: BLE001 — corrupt blob => row error
                    feats.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "feature": feats,
                    "decode_error": errs,
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


# ------------------------------------------------ real header-level codecs
# Pure-Python parsers for the three container formats' public layouts
# (PNG spec ISO/IEC 15948 §5.3/11.2.2, JPEG/JFIF ITU-T T.81 SOF segments,
# RIFF/WAVE fmt+data chunks). This is the non-stubbed part of "decode":
# width/height/duration come from the actual file bytes; pixel/sample
# decoding stays behind the pluggable ``decoder=`` hook.

def parse_png_header(data: bytes) -> dict:
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: bad signature")
    if data[12:16] != b"IHDR":
        raise ValueError("PNG: first chunk is not IHDR")
    return {
        "format": "png",
        "width": int.from_bytes(data[16:20], "big"),
        "height": int.from_bytes(data[20:24], "big"),
        "duration_ms": None,
    }


def parse_jpeg_header(data: bytes) -> dict:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError("JPEG: bad marker alignment")
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
        if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOFn: [len][prec][h][w]
            return {
                "format": "jpeg",
                "width": int.from_bytes(data[i + 7 : i + 9], "big"),
                "height": int.from_bytes(data[i + 5 : i + 7], "big"),
                "duration_ms": None,
            }
        i += 2 + seg_len
    raise ValueError("JPEG: no SOF segment found")


def parse_wav_header(data: bytes) -> dict:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE")
    i, rate, channels, bits, data_size = 12, None, None, None, None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        size = int.from_bytes(data[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            channels = int.from_bytes(data[i + 10 : i + 12], "little")
            rate = int.from_bytes(data[i + 12 : i + 16], "little")
            bits = int.from_bytes(data[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or data_size is None:
        raise ValueError("WAV: missing fmt or data chunk")
    duration_ms = data_size * 1000 // (rate * channels * (bits // 8))
    return {
        "format": "wav",
        "width": None,
        "height": None,
        "duration_ms": int(duration_ms),
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
    }


def parse_media_header(data: bytes) -> dict:
    """Sniff by magic bytes and parse the real container header."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return parse_png_header(data)
    if data[:2] == b"\xff\xd8":
        return parse_jpeg_header(data)
    if data[:4] == b"RIFF":
        return parse_wav_header(data)
    raise ValueError(f"unknown media container (magic {data[:4]!r})")


HEADERS_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("decode_error", StringType(), True),
    ]
)


def extract_headers(df: DataFrame) -> DataFrame:
    """Header-level decode of media blobs via mapInPandas: real parsing of
    the bytes (PNG IHDR / JPEG SOF / WAV fmt+data), per-row error isolation
    like extract_features."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                try:
                    h = parse_media_header(bytes(data) if data is not None else b"")
                    rows.append(
                        (mid, h["format"], h["width"], h["height"], h["duration_ms"], None)
                    )
                except Exception as e:  # noqa: BLE001 — corrupt blob => row error
                    rows.append((mid, None, None, None, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "format", "width", "height", "duration_ms", "decode_error",
                ],
            )

    return df.mapInPandas(run, schema=HEADERS_SCHEMA)


# --------------------------------------------------------------- file builders
def build_png(width: int, height: int) -> bytes:
    """Minimal fully-valid grayscale PNG (zlib-compressed zero scanlines)."""
    import struct
    import zlib

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + b"\x00" * width) * height  # filter byte + gray row
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def build_jpeg(width: int, height: int) -> bytes:
    """JPEG with valid SOI/APP0/SOF0/EOI segments (header-complete; no
    entropy-coded scan — the decode stub's job)."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
        + b"\xff\xd9"
    )


def build_wav(n_samples: int, sample_rate: int = 8000, channels: int = 1, bits: int = 16) -> bytes:
    """Fully-valid PCM WAV of silence."""
    import struct

    block = channels * bits // 8
    data = b"\x00" * (n_samples * block)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plumbing*: expands each video row into frame
    timestamps (duration from metadata) — the decode of each frame is the
    stubbed part. Output: one row per (media_id, frame_ts_ms)."""
    return (
        df.filter(F.col("mime").startswith("video/"))
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def resize_meta(df: DataFrame, max_side: int) -> DataFrame:
    """Resize bookkeeping: computes target dimensions preserving aspect
    ratio (the pixel work is the stubbed decoder's job)."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        F.greatest(w, h) > max_side, F.greatest(w, h) / F.lit(max_side)
    ).otherwise(F.lit(1.0))
    return df.withColumn(
        "target",
        F.struct(
            F.round(w / scale).cast("int").alias("width"),
            F.round(h / scale).cast("int").alias("height"),
        ),
    )
