"""Streaming deduplication for continuous ingestion pipelines: exact-key
and content-fingerprint dedup over a Structured Streaming source.

Uses ``dropDuplicatesWithinWatermark`` (not ``dropDuplicates``): with a
plain dropDuplicates the state store must hold EVERY key seen since the
query started — unbounded at 100 TB/day. Within-watermark dedup bounds
state to the watermark horizon, which is the right contract for
at-least-once sources whose duplicates arrive close together (Kafka
redeliveries, file-source replays). Exact global dedup over all of
history belongs in the batch layer (``operators/dedup.exact_dedup``) —
this is the standard lambda split, stated here so nobody mistakes the
streaming operator for a global guarantee.

Content dedup derives the same order-sensitive document fingerprint as
the batch path (``textanalysis.doc_fingerprint``) so a doc deduped in the
stream hashes identically in any later batch reconciliation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kolibrie_spark.operators.textanalysis import doc_fingerprint


def dedup_stream(
    stream_df: DataFrame,
    key_cols: list[str],
    event_time_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keep the first arrival per key within the watermark horizon.
    ``event_time_col`` must be a TIMESTAMP column; state is bounded by
    ``watermark``."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    return stream_df.withWatermark(
        event_time_col, watermark
    ).dropDuplicatesWithinWatermark(key_cols)


def dedup_stream_by_content(
    stream_df: DataFrame,
    text_col: str,
    event_time_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Content dedup: first arrival per document fingerprint (normalized
    text hash, identical to the batch fingerprint) within the watermark."""
    with_fp = stream_df.withColumn(
        "__fp", doc_fingerprint(F.col(text_col))
    )
    return (
        with_fp.withWatermark(event_time_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )
