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


def rstream_replay(df: DataFrame, time_col: str, width: int, key_cols: list[str]) -> DataFrame:
    return tumbling_windows(df, time_col, width, key_cols)


def istream_replay(df: DataFrame, time_col: str, width: int, key_cols: list[str]) -> DataFrame:
    """Rows new in their window vs the previous window."""
    wins = tumbling_windows(df, time_col, width, key_cols)
    prev = wins.select(
        (F.col("window_open") + F.lit(width)).alias("window_open"), *key_cols
    )
    return wins.join(prev, on=["window_open", *key_cols], how="left_anti")


def dstream_replay(df: DataFrame, time_col: str, width: int, key_cols: list[str]) -> DataFrame:
    """Rows of the previous window absent from the current one, attributed
    to the current window (the firing that observes the deletion). The
    final window's deletions are unobservable in a bounded replay (no
    firing follows), matching the live engines."""
    wins = tumbling_windows(df, time_col, width, key_cols)
    shifted = wins.select(
        (F.col("window_open") + F.lit(width)).alias("window_open"), *key_cols
    )
    observed = wins.select("window_open").dropDuplicates()
    return (
        shifted.join(wins, on=["window_open", *key_cols], how="left_anti")
        .join(observed, on="window_open", how="left_semi")
    )
