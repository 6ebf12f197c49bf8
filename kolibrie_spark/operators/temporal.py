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
) -> DataFrame:
    """Left as-of (backward) join: every left row, plus for each payload
    column the value from the latest right row with right_ts <= left_ts in
    the same key group (NULL when no such row)."""
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
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__t"), F.col("__side"), F.col("__p"))
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
) -> "DataFrame":
    """Assign gap-based session ids per user: a new session starts when the
    time since the user's previous event exceeds ``gap`` (seconds).

    Batch shape: lag + conditional cumsum over a (user, time) window — two
    pure window passes, shuffles once on the user key, no Python. Output
    adds ``session_id`` (the session's start time, a stable natural key)
    and ``session_seq`` (1-based session ordinal per user).

    At 100 TB this is the standard telemetry/sessionization plan: the
    shuffle is one hash partition by user; skewed power-users can be
    pre-split by (user, day) if a single user's events exceed a partition.
    For live streams see ``streaming.sessionize_stream`` —
    applyInPandasWithState with a per-user open-session state row;
    pass ``flush_open_sessions=True`` there for the event-time-timeout
    mode that emits idle users' final sessions and frees their state."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

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
