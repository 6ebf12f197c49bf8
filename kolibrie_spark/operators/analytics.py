"""Event-sequence analytics: funnels and retention cohorts.

The events table is the streaming side of the engine; these are the two
batch questions every event pipeline answers about it.

**Funnel** — for an ordered list of step types [s1, s2, ...]: per user,
t1 = earliest s1 event; t_{i+1} = earliest s_{i+1} event STRICTLY after
t_i. "Strictly after" (ts >, not >=) is part of the contract: it makes
the result independent of how same-timestamp events are ordered, so no
tie-break column is needed and the SQL twin is three chained MINs.

Plan shape: one small filtered aggregation per step (map-side combined,
|users| rows each) chained by equi-joins on the user key — every shuffle
is on the same key, so AQE/exchange reuse keeps it one partitioning; at
1000 executors each step is a cheap co-partitioned join, never a window
over all events.

**Retention** — cohort users by their first-event day, then count
distinct users per (cohort_day, week_offset). Two aggregations: first-day
per user (|users| rows), then the cohort matrix (|cohorts x weeks| rows).
Integer day arithmetic end-to-end — no engine-specific week-boundary or
timezone semantics in the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Per-user funnel step times. Returns ``(uid, t1, t2, ..., tN)``
    with t_i NULL once the funnel is abandoned; only users who completed
    step 1 appear."""
    if not steps:
        raise ValueError("steps must be non-empty")
    u, ts, ty = F.col(user_col), F.col(ts_col), F.col(type_col)
    out = (
        df.filter(ty == steps[0])
        .groupBy(u.alias("uid"))
        .agg(F.min(ts).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            df.filter(ty == step)
            .select(u.alias("uid"), ts.alias("__ts"))
            .join(out, on="uid", how="inner")
            .filter(F.col("__ts") > F.col(f"t{i - 1}"))
            .groupBy("uid")
            .agg(F.min("__ts").alias(f"t{i}"))
        )
        out = out.join(nxt, on="uid", how="left")
    return out


def funnel_duckdb_sql(
    table_expr: str,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> str:
    """DuckDB twin of :func:`funnel` (chained strictly-after MINs)."""
    ctes = [
        f"s1 AS (SELECT {user_col} AS uid, MIN({ts_col}) AS t1 "
        f"FROM {table_expr} WHERE {type_col} = '{steps[0]}' GROUP BY 1)"
    ]
    prev = "s1"
    for i, step in enumerate(steps[1:], start=2):
        ctes.append(
            f"s{i} AS (SELECT e.{user_col} AS uid, MIN(e.{ts_col}) AS t{i} "
            f"FROM {table_expr} e JOIN {prev} p ON e.{user_col} = p.uid "
            f"WHERE e.{type_col} = '{step}' AND e.{ts_col} > p.t{i - 1} "
            f"GROUP BY 1)"
        )
        prev = f"s{i}"
    cols = ", ".join(
        f"s{i}.t{i}" for i in range(1, len(steps) + 1)
    )
    joins = " ".join(
        f"LEFT JOIN s{i} ON s1.uid = s{i}.uid"
        for i in range(2, len(steps) + 1)
    )
    return f"WITH {', '.join(ctes)} SELECT s1.uid, {cols} FROM s1 {joins}"


def retention(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Weekly retention matrix keyed by first-event day. Returns
    ``(cohort_day, week_offset, n_users)``."""
    u, d = F.col(user_col), F.to_date(F.col(ts_col))
    firsts = df.groupBy(u.alias("uid")).agg(F.min(d).alias("cohort_day"))
    return (
        df.select(u.alias("uid"), d.alias("day"))
        .join(firsts, on="uid")
        .groupBy(
            "cohort_day",
            F.floor(
                F.datediff(F.col("day"), F.col("cohort_day")) / 7
            ).alias("week_offset"),
        )
        .agg(F.count_distinct("uid").alias("n_users"))
    )


def retention_duckdb_sql(table_expr: str, user_col: str, ts_col: str) -> str:
    """DuckDB twin of :func:`retention` (same integer-day arithmetic)."""
    return f"""
WITH firsts AS (
  SELECT {user_col} AS uid, MIN(CAST({ts_col} AS DATE)) AS cohort_day
  FROM {table_expr} GROUP BY 1
)
SELECT f.cohort_day,
       CAST(FLOOR(datediff('day', f.cohort_day, CAST(e.{ts_col} AS DATE))
                  / 7) AS BIGINT) AS week_offset,
       COUNT(DISTINCT e.{user_col}) AS n_users
FROM {table_expr} e JOIN firsts f ON e.{user_col} = f.uid
GROUP BY 1, 2
"""
