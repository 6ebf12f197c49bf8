"""Data-layout clustering: Morton (Z-order) interleave + range layout.

At 100 TB, scan cost is dominated by how well file-level min/max stats
prune. A Z-order curve interleaves the bits of two key columns so that
range-partitioning on the curve value co-locates rows that are close in
EITHER dimension — the standard multi-dimensional clustering trick
(Delta OPTIMIZE ZORDER BY, Hudi/Iceberg z-ordering) expressed with
plain column bit-arithmetic, so it runs JVM-side in whole-stage codegen.

``zorder_layout`` is the write-path operator: compute the curve value,
``repartitionByRange`` on it (one skew-resistant range shuffle driven by
Spark's reservoir sampling), sort within partitions, drop the helper
column. Downstream parquet files then carry tight min/max ranges on both
original keys.

No reference counterpart (storage-layout operator for the curation
layer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic-number bit spreads: 16-bit value -> even bit positions of 32 bits
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread16(c: Column) -> Column:
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zorder_value(x: Column, y: Column) -> Column:
    """32-bit Morton code of two 16-bit non-negative keys (callers bucket
    wider domains down to 16 bits first)."""
    return _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1))


def zorder_layout(
    df: DataFrame, x_col: str, y_col: str, num_partitions: int = 32
) -> DataFrame:
    """Cluster ``df`` along the Z-curve of (x_col, y_col): range-partition
    + sort by the curve value, then drop it. The returned frame, written
    to parquet, yields files whose (x, y) min/max stats prune on both
    dimensions."""
    with_z = df.withColumn(
        "_zval", zorder_value(F.col(x_col), F.col(y_col))
    )
    return (
        with_z.repartitionByRange(num_partitions, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) table: the
    co-location contract that lets Catalyst drop BOTH Exchanges from a
    join of two tables bucketed on the same key with the same bucket
    count (and the Sort too, when sorted). This is THE 100 TB join
    strategy for repeatedly-joined fact tables — pay the shuffle once at
    write time, never again at read time. (Spark bucketed tables require
    ``saveAsTable``; the session catalog + spark warehouse dir is
    enough, no Hive server.)"""
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def _spread16_duckdb(expr: str) -> str:
    x = f"(CAST({expr} AS BIGINT) & 65535)"
    for shift, mask in _SPREAD:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def zorder_value_duckdb(x_expr: str, y_expr: str) -> str:
    """DuckDB twin of :func:`zorder_value` (same magic-number spreads)."""
    return f"({_spread16_duckdb(x_expr)} | ({_spread16_duckdb(y_expr)} << 1))"
