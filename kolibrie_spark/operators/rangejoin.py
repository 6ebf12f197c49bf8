"""Binned interval (range) join: point-in-interval without a cartesian.

Spark executes a pure theta join (``e.ts BETWEEN i.start AND i.end``)
as BroadcastNestedLoopJoin — O(|events| x |intervals|), a non-starter at
scale when the interval side doesn't fit in a broadcast. The classic
fix: quantize time into fixed-width bins no narrower than the longest
interval, explode each interval onto every bin it overlaps (<= 2 bins
when bin_width >= interval length), equi-join on the bin, then apply the
exact predicate. Each event belongs to exactly ONE bin, and an interval
covers a given bin at most once, so a qualifying (event, interval) pair
matches exactly once — no dedup pass needed.

Scale shape (100 TB): turns the nested loop into one hash shuffle on the
bin key with a bounded 2x blowup of the (smaller) interval side.
Calendar-hot bins are data skew, not operator skew — mitigable with the
standard salt toolbox (operators/skew.py) on the bin key.

No reference counterpart (Kolibrie has no interval join); Spark-first
pattern, same trick as Databricks' range-join bin optimization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin_of(ts_seconds: Column, bin_width_s: int) -> Column:
    return F.floor(ts_seconds / F.lit(bin_width_s)).cast("long")


def interval_join_binned(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_width_s: int,
) -> DataFrame:
    """Inner join of ``events`` rows to ``intervals`` rows with
    ``start <= ts < end`` (timestamp columns). Correct for any interval
    length (an interval explodes onto every bin it overlaps); pick
    ``bin_width_s`` >= the typical interval length so the blowup stays
    <= 2x. Returns the joined rows with all columns from both sides.
    """
    ev = events.withColumn(
        "_bin", _bin_of(F.unix_timestamp(F.col(ts_col)), bin_width_s)
    )
    start_s = F.unix_timestamp(F.col(start_col))
    end_s = F.unix_timestamp(F.col(end_col))
    iv = (
        intervals.withColumn(
            "_bins",
            F.sequence(
                _bin_of(start_s, bin_width_s),
                # cover through end's own bin: unix_timestamp truncates
                # sub-seconds, so an exclusive end with a fractional part
                # can still admit events in its second; the extra bin is
                # harmless (the exact predicate filters it)
                _bin_of(end_s, bin_width_s),
            ),
        )
        .withColumn("_bin", F.explode("_bins"))
        .drop("_bins")
    )
    joined = ev.join(iv, "_bin").where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_bin")
