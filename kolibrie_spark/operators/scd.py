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


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: int,
) -> DataFrame:
    """Regular-grid resampling with forward fill: for each key, emit one
    row per ``step`` tick between its first and last observation,
    carrying the latest observation at-or-before the tick — the gap
    filler that makes irregular telemetry joinable/chartable.

    Plan shape: a per-key min/max aggregation generates the tick grid
    with ``sequence`` + explode (grid size = span/step, no driver loop),
    a union with the real observations, and ONE ``last(ignorenulls)``
    window per key ordered by (ts, is_grid) — grid ticks sort after a
    same-timestamp observation so the tick picks it up. Grid rows are
    then kept. One shuffle on the key.

    Returns ``(key, tick_ts, value_ffill)``; leading ticks before the
    first observation cannot occur (grid starts at the first
    observation's tick).
    """
    k, ts, v = F.col(key_col), F.col(ts_col), F.col(value_col)
    span = df.groupBy(k.alias("k")).agg(
        F.min(ts).alias("t0"), F.max(ts).alias("t1")
    )
    grid = span.select(
        "k",
        F.explode(
            F.sequence(
                # first tick at ceil(t0/step)*step... start at t0 itself
                # rounded UP to the grid so every tick has a prior obs
                ((F.col("t0") + step - 1) / step).cast("long") * step,
                F.col("t1"),
                F.lit(step),
            )
        ).alias("tick"),
    )
    obs = df.select(
        k.alias("k"), ts.alias("t"), v.alias("v"), F.lit(0).alias("is_grid")
    )
    grid_rows = grid.select(
        "k", F.col("tick").alias("t"), F.lit(None).cast(
            df.schema[value_col].dataType
        ).alias("v"), F.lit(1).alias("is_grid")
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("is_grid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        obs.unionAll(grid_rows)
        .withColumn("__ff", F.last("v", ignorenulls=True).over(w))
        .filter(F.col("is_grid") == 1)
        .select(
            F.col("k").alias(key_col),
            F.col("t").alias("tick_ts"),
            F.col("__ff").alias("value_ffill"),
        )
    )


def resample_ffill_duckdb_sql(
    table_expr: str, key_col: str, ts_col: str, value_col: str, step: int
) -> str:
    """DuckDB twin of :func:`resample_ffill` (same grid, same
    last-ignore-nulls fill with identical tie order)."""
    return f"""
WITH span AS (
  SELECT {key_col} AS k, MIN({ts_col}) AS t0, MAX({ts_col}) AS t1
  FROM {table_expr} GROUP BY 1
), grid AS (
  SELECT k, unnest(range(((t0 + {step} - 1) // {step}) * {step},
                         t1 + 1, {step})) AS t
  FROM span
), unioned AS (
  SELECT {key_col} AS k, {ts_col} AS t, {value_col} AS v, 0 AS is_grid
  FROM {table_expr}
  UNION ALL
  SELECT k, t, NULL, 1 FROM grid
), filled AS (
  SELECT k, t, is_grid,
         last_value(v IGNORE NULLS) OVER (PARTITION BY k
           ORDER BY t ASC, is_grid ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff
  FROM unioned
)
SELECT k AS {key_col}, t AS tick_ts, ff AS value_ffill
FROM filled WHERE is_grid = 1
"""


def ewma_last(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-key exponentially-weighted moving average of the time-ordered
    value sequence, returning the FINAL smoothed level per key —
    ``(key, n_obs, ewma)`` with ``s_0 = v_0; s_i = alpha*v_i +
    (1-alpha)*s_{i-1}``.

    Determinism: floating EWMA depends on fold order, so the values are
    collected per key, sorted by (ts, value) — a total deterministic
    order — and folded LEFT-TO-RIGHT with the same two IEEE ops both
    engines run (DuckDB's list_reduce seeds with the first element,
    matching the explicit s_0 = v_0 here). One shuffle on the key; the
    per-key sequence must fit an executor row (the same contract as any
    collect_list window — for unbounded keys, window by time first).
    """
    a1 = float(alpha)
    a0 = float(1.0 - alpha)
    vals = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(ts_col), F.col(value_col)))
        ),
        lambda s: s[value_col].cast("double"),
    )
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(a1) * x + F.lit(a0) * acc,
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count("*").alias("n_obs"), fold.alias("ewma"))
    )


def ewma_last_duckdb_sql(
    table_expr: str,
    key_col: str,
    ts_col: str,
    value_expr: str,
    alpha: float = 0.5,
) -> str:
    """DuckDB twin of :func:`ewma_last` (same order, same fold)."""
    a1 = float(alpha)
    a0 = float(1.0 - alpha)
    return f"""
SELECT {key_col}, COUNT(*) AS n_obs,
       list_reduce(
         list(CAST({value_expr} AS DOUBLE) ORDER BY {ts_col}, {value_expr}),
         (acc, x) -> {a1!r} * x + {a0!r} * acc
       ) AS ewma
FROM {table_expr}
WHERE {value_expr} IS NOT NULL
GROUP BY {key_col}
"""
