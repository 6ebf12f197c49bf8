"""Slowly-changing-dimension (SCD2) versioning and time-series
downsampling — warehouse-side temporal operators.

``scd2_intervals`` turns an append-only change log (key, change_ts,
attributes...) into versioned validity intervals [valid_from, valid_to)
with an is_current flag — the MERGE-free way to build an SCD2 dimension:
one window (lead over change_ts per key), no join, no mutation.

``downsample_last`` keeps the last observation per (key, fixed time
bucket) — the telemetry compaction every metrics pipeline runs. max_by
on the (ts, tiebreak) pair inside one map-side-combined aggregation; no
window, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

OPEN_END = 9_223_372_036_854_775_807  # Long.MAX: the open interval end


def scd2_intervals(
    df: DataFrame, key_col: str, ts_col: str
) -> DataFrame:
    """Adds ``valid_from`` (= ts), ``valid_to`` (next change's ts, or
    Long.MAX for the current version) and ``is_current``. Duplicate
    change timestamps per key are ranked deterministically only if the
    caller pre-dedups — the contract requires (key, ts) unique, which a
    change log satisfies."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    nxt = F.lead(F.col(ts_col)).over(w)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.coalesce(nxt, F.lit(OPEN_END)))
        .withColumn("is_current", nxt.isNull())
    )


def scd2_intervals_duckdb_sql(
    table_expr: str, key_col: str, ts_col: str, select_cols: str
) -> str:
    return f"""
SELECT {select_cols},
       {ts_col} AS valid_from,
       COALESCE(LEAD({ts_col}) OVER (PARTITION BY {key_col}
                ORDER BY {ts_col} ASC), {OPEN_END}) AS valid_to,
       (LEAD({ts_col}) OVER (PARTITION BY {key_col}
                ORDER BY {ts_col} ASC) IS NULL) AS is_current
FROM {table_expr}
"""


def downsample_last(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_us: int,
    tiebreak_col: str,
) -> DataFrame:
    """Last value per (key, bucket): ``max_by`` over the (ts, tiebreak)
    pair — ONE hash aggregation with map-side combine, no window/sort.
    The tiebreak column makes same-timestamp observations deterministic.
    Returns ``(key, bucket_start, last_ts, last_value)``."""
    b = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(bucket_us))).alias(
        "bucket_start"
    )
    pair = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return df.groupBy(F.col(key_col), b).agg(
        F.max_by(F.col(ts_col), pair).alias("last_ts"),
        F.max_by(F.col(value_col), pair).alias("last_value"),
    )


def downsample_last_duckdb_sql(
    table_expr: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_us: int,
    tiebreak_col: str,
) -> str:
    """DuckDB twin. DuckDB's arg_max has no composite ordering, so the
    twin states the same semantics as a rank-1 window over
    (ts DESC, tiebreak DESC) — equivalent output, different (but fine for
    an oracle) plan."""
    b = f"({ts_col} - ({ts_col} % {bucket_us}))"
    return f"""
SELECT {key_col}, bucket_start, {ts_col} AS last_ts, {value_col} AS last_value
FROM (
  SELECT {key_col}, {b} AS bucket_start, {ts_col}, {value_col},
         row_number() OVER (PARTITION BY {key_col}, {b}
           ORDER BY {ts_col} DESC, {tiebreak_col} DESC) AS rn
  FROM {table_expr}
) WHERE rn = 1
"""
