"""Temporal joins the reference lacks but a Spark-native engine gets to add
(SURVEY §2.3 notes semi/anti/theta/range/as-of joins are absent there).

``asof_join``: for each left row, attach the payload of the latest right
row with right_ts <= left_ts per key — the standard event-enrichment /
slowly-changing-dimension lookup. Implemented with the union +
carry-forward-window trick: one shuffle on (key), one sort within
partitions, no per-row probing — the classic scalable formulation (an
actual range/broadcast-probe variant only wins when the right side is tiny).

Determinism: ties on right_ts within a key are broken by the ordered
payload columns, so the result is stable across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    suffix: str = "_matched",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row, plus for each payload column the
    value from the matching right row in the same key group — the LATEST
    right row with right_ts <= left_ts (``direction="backward"``, the
    default SCD lookup) or the EARLIEST with right_ts >= left_ts
    (``direction="forward"``, the next-scheduled-event lookup); NULL when
    no such row. Forward is the same union + carry window with the sort
    reversed (carry-backward), so both directions cost one key shuffle."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    left_cols = left.columns
    # payload rides as ONE struct so ties can never mix columns from
    # different right rows
    payload_struct = F.struct(*[F.col(c) for c in payload_cols])
    payload_type = right.select(payload_struct.alias("__p")).schema["__p"].dataType
    l = left.select(
        *left_cols,
        F.col(left_ts).cast("long").alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__p"),
    )
    r = right.select(
        *key_cols,
        F.col(right_ts).cast("long").alias("__t"),
        F.lit(0).alias("__side"),
        payload_struct.alias("__p"),
    )
    for c in left_cols:
        if c not in key_cols:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l.unionByName(r.select(*l.columns))
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__side").asc(), F.col("__p").asc()]
    else:
        # reverse time so "carry forward" becomes "carry the next right
        # row backward"; side still sorts right rows before the left rows
        # they match at equal timestamps, payload ties deterministic
        order = [F.col("__t").desc(), F.col("__side").asc(), F.col("__p").asc()]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__p", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("__side") == 1).select(
        *left_cols,
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in payload_cols],
    )


def sessionize(
    df,
    user_col: str,
    time_col: str,
    gap: int,
    split_by: int | None = None,
) -> "DataFrame":
    """Assign gap-based session ids per user: a new session starts when the
    time since the user's previous event exceeds ``gap`` (seconds).

    Batch shape: lag + conditional cumsum over a (user, time) window — two
    pure window passes, shuffles once on the user key, no Python. Output
    adds ``session_id`` (the session's start time, a stable natural key)
    and ``session_seq`` (1-based session ordinal per user).

    At 100 TB this is the standard telemetry/sessionization plan: the
    shuffle is one hash partition by user. A power user whose events
    dominate the table turns that into a single straggler task —
    ``split_by`` (seconds, e.g. 86400 for daily) pre-splits every user's
    timeline into (user, time-bucket) groups, runs the windows locally per
    bucket, and stitches the buckets back with a per-(user, bucket)
    aggregate table (one row per user-bucket: last event time, new-session
    count, open-session start) that is window-scanned per user and joined
    back — output is bit-identical to the unsplit plan, but the serial
    per-user work drops from O(user's events) to O(events per bucket).
    For live streams see ``streaming.sessionize_stream`` —
    applyInPandasWithState with a per-user open-session state row;
    pass ``flush_open_sessions=True`` there for the event-time-timeout
    mode that emits idle users' final sessions and frees their state."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if split_by is not None:
        return _sessionize_split(df, user_col, time_col, gap, split_by)

    w = Window.partitionBy(user_col).orderBy(time_col)
    prev = F.lag(F.col(time_col)).over(w)
    new_session = F.when(
        prev.isNull() | (F.col(time_col) - prev > gap), F.lit(1)
    ).otherwise(F.lit(0))
    df2 = df.withColumn("__new", new_session)
    seq = F.sum("__new").over(
        Window.partitionBy(user_col).orderBy(time_col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    df3 = df2.withColumn("session_seq", seq)
    start = F.min(time_col).over(
        Window.partitionBy(user_col, "session_seq")
    )
    return df3.withColumn("session_id", start).drop("__new")


def _sessionize_split(
    df, user_col: str, time_col: str, gap: int, split_by: int
) -> "DataFrame":
    """Skew-safe sessionize: local windows per (user, bucket) + cross-bucket
    stitch through a tiny per-bucket summary. Three facts make the stitch
    exact:
      * the previous event of a bucket's first event is the max event time
        of the user's earlier buckets (times in bucket b exceed all times
        in buckets < b);
      * session_seq = local new-session cumsum + the count of new-session
        flags in earlier buckets;
      * the session open at a bucket's start began at the most recent
        earlier bucket's last new-session event (carried with
        last(ignorenulls) over the summary rows).
    The events shuffle once on (user, bucket); the summary table has one
    row per user-bucket, so its per-user window and the joins back (which
    Catalyst/AQE broadcast) are noise at any scale."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t = F.col(time_col)
    bucketed = df.withColumn("__b", (t.cast("long") / F.lit(split_by)).cast("long"))

    # per-(user, bucket) last event time -> previous-bucket last, per user
    summary_a = bucketed.groupBy(user_col, "__b").agg(F.max(t).alias("__last_t"))
    w_user = Window.partitionBy(user_col).orderBy("__b")
    summary_a = summary_a.withColumn(
        "__prev_last", F.lag("__last_t").over(w_user)
    ).drop("__last_t")

    ev = bucketed.join(summary_a, on=[user_col, "__b"], how="left")
    w_local = Window.partitionBy(user_col, "__b").orderBy(time_col)
    prev_t = F.coalesce(F.lag(t).over(w_local), F.col("__prev_last"))
    ev = ev.withColumn(
        "__new",
        F.when(prev_t.isNull() | (t - prev_t > gap), F.lit(1)).otherwise(F.lit(0)),
    )
    w_cum = w_local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = ev.withColumn("__seq_local", F.sum("__new").over(w_cum)).withColumn(
        "__start_local",
        F.last(F.when(F.col("__new") == 1, t), ignorenulls=True).over(w_cum),
    )

    # per-(user, bucket) new-session count + open-session start -> per-user
    # prefix sums over the summary (strictly earlier buckets)
    summary_b = ev.groupBy(user_col, "__b").agg(
        F.sum("__new").alias("__n_new"),
        F.max(F.when(F.col("__new") == 1, t)).alias("__open_start"),
    )
    w_prev = w_user.rowsBetween(Window.unboundedPreceding, -1)
    summary_b = summary_b.select(
        user_col,
        "__b",
        F.coalesce(F.sum("__n_new").over(w_prev), F.lit(0)).alias("__seq_off"),
        F.last("__open_start", ignorenulls=True).over(w_prev).alias("__inherited"),
    )

    out = ev.join(summary_b, on=[user_col, "__b"], how="left")
    return (
        out.withColumn("session_seq", F.col("__seq_local") + F.col("__seq_off"))
        .withColumn(
            "session_id", F.coalesce(F.col("__start_local"), F.col("__inherited"))
        )
        .drop("__b", "__prev_last", "__new", "__seq_local", "__start_local",
              "__seq_off", "__inherited")
    )


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping-or-touching ``[start, end]`` intervals per key
    (the classic gaps-and-islands collapse): returns one row per maximal
    merged interval ``(key, start, end, n_merged)``.

    Plan shape: ONE shuffle on the key; inside each key an ordered
    running max of ``end`` (window) marks island starts where the
    current start exceeds every prior end, a conditional running sum
    numbers the islands, and a groupBy on (key, island) emits min/max —
    no self-join, no explode of the covered range (an interval spanning
    a year costs one row, not 365). At 100 TB the only hot spot is a
    single key owning most intervals; the window+groupBy pair both run
    on the same hash partitioning, and AQE's skew split applies to the
    final aggregation.

    Touching intervals (next.start == prior.end) merge; strictly-after
    starts a new island. Ties on start order by end (deterministic).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(start_col).asc(), F.col(end_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = df.withColumn("__prior_max_end", F.max(end_col).over(w)).withColumn(
        "__new_island",
        (
            F.col("__prior_max_end").isNull()
            | (F.col(start_col) > F.col("__prior_max_end"))
        ).cast("long"),
    )
    w2 = (
        Window.partitionBy(key_col)
        .orderBy(F.col(start_col).asc(), F.col(end_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        marked.withColumn("__island", F.sum("__new_island").over(w2))
        .groupBy(key_col, "__island")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count("*").alias("n_merged"),
        )
        .select(key_col, start_col, end_col, "n_merged")
    )


def merge_intervals_duckdb_sql(
    table_expr: str, key_col: str, start_col: str, end_col: str
) -> str:
    """DuckDB twin of :func:`merge_intervals` (same island construction)."""
    return f"""
WITH marked AS (
  SELECT {key_col}, {start_col}, {end_col},
         CASE WHEN max({end_col}) OVER (PARTITION BY {key_col}
                ORDER BY {start_col} ASC, {end_col} ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR {start_col} > max({end_col}) OVER (PARTITION BY {key_col}
                ORDER BY {start_col} ASC, {end_col} ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS new_island
  FROM {table_expr}
), islands AS (
  SELECT *, SUM(new_island) OVER (PARTITION BY {key_col}
           ORDER BY {start_col} ASC, {end_col} ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
)
SELECT {key_col}, MIN({start_col}) AS {start_col}, MAX({end_col}) AS {end_col},
       COUNT(*) AS n_merged
FROM islands GROUP BY {key_col}, island
"""
