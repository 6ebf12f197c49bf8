"""Batch replay twins of the R2S operators (SURVEY §2.9).

A continuous RSP query over historical data is a batch job: assign events
to windows with column math, evaluate per window, and express the R2S
diff-against-previous-firing as a self-anti-join on the previous window —
one shuffle, no driver loop, no per-firing state. This is how a 100 TB
backfill of a registered stream query runs; the live path (engine.py /
structured.py) produces the same rows incrementally.

RSTREAM(w) = rows of window w; ISTREAM(w) = rows of w absent from w-1;
DSTREAM(w) = rows of w-1 absent from w (attributed to w, the firing that
observed the deletion) — exactly r2s.rs:14-58 applied per window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_windows(
    df: DataFrame, time_col: str, width: int, key_cols: list[str]
) -> DataFrame:
    """Distinct (window_open, keys) table for tumbling windows of ``width``
    seconds over an integer-seconds time column."""
    w = (F.col(time_col) - (F.col(time_col) % F.lit(width))).cast("long")
    return df.select(w.alias("window_open"), *key_cols).dropDuplicates()


def _keyed_windows(
    df: DataFrame, time_col: str, width: int, key_cols: list[str]
) -> DataFrame:
    """``tumbling_windows`` pre-partitioned by the KEYS alone: since the
    key columns are a subset of the dedup keys, hashpartitioning(keys)
    satisfies the aggregate's ClusteredDistribution, so the dedup runs on
    this single exchange AND the per-key lag/lead window that follows
    needs no second shuffle — one wide shuffle for the whole replay."""
    w = (F.col(time_col) - (F.col(time_col) % F.lit(width))).cast("long")
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(w.alias("window_open"), *key_cols)
        .repartition(par, *key_cols)
        .dropDuplicates()
    )


def rstream_replay(df: DataFrame, time_col: str, width: int, key_cols: list[str]) -> DataFrame:
    return tumbling_windows(df, time_col, width, key_cols)


def istream_replay(df: DataFrame, time_col: str, width: int, key_cols: list[str]) -> DataFrame:
    """Rows new in their window vs the previous window.

    Formulated per key with ``lag`` instead of a self-anti-join: within a
    key's sorted distinct windows, the immediate predecessor row IS the
    (window-width) membership probe — (key present in w-width) iff
    lag(window_open) == window_open - width. One scan and one shuffle
    replace the r3 plan's two scans + broadcast anti-join whose build
    side was the full distinct (window, keys) set (fine under AQE at
    sf0.1, a broadcast/SMJ hazard at 100 TB)."""
    from pyspark.sql.window import Window

    wins = _keyed_windows(df, time_col, width, key_cols)
    byk = Window.partitionBy(*key_cols).orderBy("window_open")
    return (
        wins.withColumn("_prev", F.lag("window_open").over(byk))
        .filter(
            F.col("_prev").isNull()
            | (F.col("_prev") != F.col("window_open") - width)
        )
        .select("window_open", *key_cols)
    )


def dstream_replay(df: DataFrame, time_col: str, width: int, key_cols: list[str]) -> DataFrame:
    """Rows of the previous window absent from the current one, attributed
    to the current window (the firing that observes the deletion). The
    final window's deletions are unobservable in a bounded replay (no
    firing follows), matching the live engines.

    Per key, ``lead`` is the membership probe: key deleted at w+width iff
    its next distinct window != w+width — provided some firing observed
    w+width at all, which the broadcast semi-join against the (tiny)
    distinct-window set enforces. One wide shuffle + one broadcast of
    the window list replace the r3 plan's three scans, full-keyset
    broadcast anti-join, and trailing dedup shuffle."""
    from pyspark.sql.window import Window

    wins = _keyed_windows(df, time_col, width, key_cols)
    byk = Window.partitionBy(*key_cols).orderBy("window_open")
    deleted = (
        wins.withColumn("_next", F.lead("window_open").over(byk))
        .filter(
            F.col("_next").isNull()
            | (F.col("_next") != F.col("window_open") + width)
        )
        .select(
            (F.col("window_open") + F.lit(width)).alias("window_open"),
            *key_cols,
        )
    )
    w = (F.col(time_col) - (F.col(time_col) % F.lit(width))).cast("long")
    observed = df.select(w.alias("window_open")).dropDuplicates()
    return deleted.join(F.broadcast(observed), on="window_open", how="left_semi")
