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
