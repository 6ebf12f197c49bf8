"""Closed-form distributed regression: per-group OLS from exact integer
sums.

The one-feature least-squares fit has a closed form over five sufficient
statistics (n, Sx, Sy, Sxx, Sxy) — each an exact int64 sum on integral
inputs, so the distributed aggregation is shuffle-order invariant and
the slope/intercept are ONE shared IEEE expression: bit-identical
across engines, partitionings, and reruns (the same contract as
graph.pagerank and profiling.group_corr). This is the "fit a trend per
key" workhorse (per-sensor drift, per-domain growth) that doesn't need
an iterative solver; for multi-feature fits swap in MLlib's
LinearRegression and drop the bit contract.

Overflow budget is the caller's: n * max|x| * max|y| must stay under
2^63 on the Spark side (DuckDB sums in int128 — Spark overflows first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ols_by_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group simple OLS of INTEGRAL y on INTEGRAL x:
    ``(group, n, slope, intercept)`` with
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), intercept =
    (Sy - slope*Sx) / n; NULL slope/intercept when x is constant."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = df.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    det = agg.n * agg.sxx - agg.sx * agg.sx
    slope = F.when(
        det > 0,
        (agg.n * agg.sxy - agg.sx * agg.sy).cast("double")
        / det.cast("double"),
    )
    intercept = (
        agg.sy.cast("double") - slope * agg.sx.cast("double")
    ) / agg.n.cast("double")
    return agg.select(
        group_col, "n", slope.alias("slope"), intercept.alias("intercept")
    )


def ols_by_group_duckdb_sql(
    table_expr: str, group_col: str, x_expr: str, y_expr: str
) -> str:
    """DuckDB twin of :func:`ols_by_group` (same sums, same expression)."""
    x, y = f"CAST({x_expr} AS BIGINT)", f"CAST({y_expr} AS BIGINT)"
    return f"""
WITH s AS (
  SELECT {group_col} AS g, COUNT(*) AS n,
         SUM({x}) AS sx, SUM({y}) AS sy,
         SUM({x} * {x}) AS sxx, SUM({x} * {y}) AS sxy
  FROM {table_expr} GROUP BY 1
), fit AS (
  SELECT g, n,
         CASE WHEN n * sxx - sx * sx > 0
              THEN CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE)
         END AS slope,
         sx, sy
  FROM s
)
SELECT g AS {group_col}, n, slope,
       (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
         AS intercept
FROM fit
"""
