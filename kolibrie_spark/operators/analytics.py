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
from pyspark.sql.window import Window


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    horizon=None,
) -> DataFrame:
    """Per-user funnel step times. Returns ``(uid, t1, t2, ..., tN)``
    with t_i NULL once the funnel is abandoned; only users who completed
    step 1 appear. ``horizon`` (same unit as ``ts_col``) bounds the whole
    conversion window: step i counts only if ``t_i <= t1 + horizon`` —
    the standard "converted within X hours" rule."""
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
        )
        if horizon is not None:
            nxt = nxt.filter(F.col("__ts") <= F.col("t1") + F.lit(horizon))
        nxt = nxt.groupBy("uid").agg(F.min("__ts").alias(f"t{i}"))
        out = out.join(nxt, on="uid", how="left")
    return out


def funnel_duckdb_sql(
    table_expr: str,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    horizon=None,
) -> str:
    """DuckDB twin of :func:`funnel` (chained strictly-after MINs)."""
    ctes = [
        f"s1 AS (SELECT {user_col} AS uid, MIN({ts_col}) AS t1 "
        f"FROM {table_expr} WHERE {type_col} = '{steps[0]}' GROUP BY 1)"
    ]
    prev = "s1"
    for i, step in enumerate(steps[1:], start=2):
        hz = (
            f"AND e.{ts_col} <= p.t1 + {horizon} " if horizon is not None else ""
        )
        t1_carry = ", MIN(p.t1) AS t1" if horizon is not None else ""
        ctes.append(
            f"s{i} AS (SELECT e.{user_col} AS uid, MIN(e.{ts_col}) AS t{i}"
            f"{t1_carry} "
            f"FROM {table_expr} e JOIN {prev} p ON e.{user_col} = p.uid "
            f"WHERE e.{type_col} = '{step}' AND e.{ts_col} > p.t{i - 1} {hz}"
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


def rolling_user_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    row_window: int = 3,
    range_us: int = 3_600_000_000,
) -> DataFrame:
    """Per-event rolling aggregates over each user's history: the
    trailing ``row_window``-row sum and the trailing ``range_us``
    event-time-range sum (both inclusive of the current event) — the
    feature columns an online-abuse / anomaly score reads.

    Exactness: values are scaled to integer cents before summation, so
    frame-order float accumulation cannot differ between engines. Frame
    ordering ties break on the event id.

    Plan shape: both frames share ONE window partitioning (hash shuffle
    on the user key, sort by (ts, id) inside) — Spark evaluates the two
    frames in a single Window operator pass. Per-user state is the frame
    buffer, O(row_window + events-in-range)."""
    ts, v = F.col(ts_col), F.col(value_col)
    cents = F.round(v * 100).cast("long")
    order_rows = Window.partitionBy(user_col).orderBy(
        ts.asc(), F.col(id_col).asc()
    )
    w_rows = order_rows.rowsBetween(-(row_window - 1), Window.currentRow)
    # RANGE frames allow one ordering expression: order by the raw
    # timestamp value; ties collapse into the same range position (well
    # defined for sums)
    w_range = (
        Window.partitionBy(user_col)
        .orderBy(ts.asc())
        .rangeBetween(-range_us, Window.currentRow)
    )
    return df.select(
        F.col(id_col),
        F.col(user_col).alias("uid"),
        ts.alias("ts"),
        F.sum(cents).over(w_rows).alias(f"roll{row_window}_cents"),
        F.sum(cents).over(w_range).alias("range_cents"),
    )


def rolling_user_stats_duckdb_sql(
    table_expr: str,
    user_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    row_window: int = 3,
    range_us: int = 3_600_000_000,
) -> str:
    """DuckDB twin of :func:`rolling_user_stats` (same integer-cent
    summation, same frames)."""
    cents = f"CAST(ROUND({value_col} * 100) AS BIGINT)"
    return f"""
SELECT {id_col},
       {user_col} AS uid,
       {ts_col} AS ts,
       CAST(SUM({cents}) OVER (PARTITION BY {user_col}
         ORDER BY {ts_col} ASC, {id_col} ASC
         ROWS BETWEEN {row_window - 1} PRECEDING AND CURRENT ROW)
         AS BIGINT) AS roll{row_window}_cents,
       CAST(SUM({cents}) OVER (PARTITION BY {user_col}
         ORDER BY {ts_col} ASC
         RANGE BETWEEN {range_us} PRECEDING AND CURRENT ROW)
         AS BIGINT) AS range_cents
FROM {table_expr}
"""


def pivot_counts(
    df: DataFrame, row_col: str, pivot_col: str, values: list[str]
) -> DataFrame:
    """Cross-tab: one row per ``row_col`` value, one count column per
    (fixed, explicitly listed) ``pivot_col`` value. Passing the value
    list is mandatory — it keeps the schema static (no discovery job)
    and makes the pivot ONE map-side-combined aggregation; missing
    combinations are 0, values outside the list are dropped."""
    out = (
        df.filter(F.col(pivot_col).isin(values))
        .groupBy(row_col)
        .pivot(pivot_col, values)
        .count()
    )
    return out.select(
        F.col(row_col),
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(f"n_{v}")
            for v in values
        ],
    )


def pivot_counts_duckdb_sql(
    table_expr: str, row_col: str, pivot_col: str, values: list[str]
) -> str:
    """DuckDB twin of :func:`pivot_counts` (conditional-sum pivot)."""
    cols = ", ".join(
        f"CAST(SUM(CASE WHEN {pivot_col} = '{v}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{v}"
        for v in values
    )
    return (
        f"SELECT {row_col}, {cols} FROM {table_expr} "
        f"WHERE {pivot_col} IN ({', '.join(repr(v) for v in values)}) "
        f"GROUP BY {row_col}"
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


def path_ngrams(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_col: str,
    n: int = 3,
    k: int = 20,
) -> DataFrame:
    """Behavioral sequence mining: the top-``k`` most frequent length-``n``
    event-type paths users actually walk (``view > click > purchase``) —
    the product-analytics complement to funnel() (which checks ONE given
    path; this discovers which paths matter).

    Per user the event stream is ordered by (ts, order_col) — a total
    deterministic order — and each event emits the path of itself and its
    next ``n-1`` successors via lead() windows; paths crossing the end of
    a user's history are dropped. One shuffle on the user key for the
    window, one map-side-combined count on the path string, TakeOrdered
    for the top-k (count DESC, path ASC tie-break — deterministic).

    At 100 TB: the window state is n rows per user-partition cursor; the
    path-count aggregation is the classic heavy-hitter shuffle and
    combines map-side (distinct paths are Zipf-bounded, Z n-gram
    explosion notwithstanding — cap n, not the data)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_col).asc()
    )
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    paths = df.select(
        F.concat_ws(" > ", *steps).alias("path"),
        steps[-1].isNotNull().alias("__complete"),
    ).filter("__complete")
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("path").asc())
        .limit(k)
    )


def path_ngrams_duckdb_sql(
    table_expr: str,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_col: str,
    n: int = 3,
    k: int = 20,
) -> str:
    """DuckDB twin of :func:`path_ngrams`."""
    leads = ", ".join(
        f"lead({type_col}, {i}) OVER (PARTITION BY {user_col} "
        f"ORDER BY {ts_col} ASC, {order_col} ASC) AS s{i}"
        for i in range(1, n)
    )
    concat = " || ' > ' || ".join([type_col] + [f"s{i}" for i in range(1, n)])
    return f"""
WITH stepped AS (
  SELECT {type_col}, {leads} FROM {table_expr}
), paths AS (
  SELECT {concat} AS path FROM stepped WHERE s{n - 1} IS NOT NULL
)
SELECT path, COUNT(*) AS n_occurrences
FROM paths GROUP BY path
ORDER BY n_occurrences DESC, path ASC
LIMIT {k}
"""


def last_touch_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_col: str,
    conversion: str,
) -> DataFrame:
    """Last-touch attribution: for every ``conversion`` event, the type of
    the latest PRECEDING non-conversion event by the same user (NULL when
    the conversion is the user's first touch). One carry-forward window
    per user — the same single-shuffle shape as the as-of join, no
    self-join. Returns ``(event_id, user, attributed_type)``.

    Order is (ts, order_col): total and deterministic; a touch at the
    conversion's exact timestamp attributes iff it sorts before it."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col(type_col) != conversion, F.col(type_col)),
        ignorenulls=True,
    ).over(w)
    return (
        df.withColumn("attributed_type", touch)
        .filter(F.col(type_col) == conversion)
        .select(order_col, user_col, "attributed_type")
    )


def last_touch_attribution_duckdb_sql(
    table_expr: str,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_col: str,
    conversion: str,
) -> str:
    """DuckDB twin of :func:`last_touch_attribution`."""
    return f"""
SELECT {order_col}, {user_col}, attributed_type FROM (
  SELECT {order_col}, {user_col}, {type_col},
         last_value(CASE WHEN {type_col} != '{conversion}'
                         THEN {type_col} END IGNORE NULLS)
           OVER (PARTITION BY {user_col}
                 ORDER BY {ts_col} ASC, {order_col} ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS attributed_type
  FROM {table_expr}
) WHERE {type_col} = '{conversion}'
"""
