"""Streaming sessionization — the custom stateful operator shape
(applyInPandasWithState): per-user open-session state, gap-based closing.

The batch twin (operators/temporal.sessionize: lag + conditional cumsum
window plan) is the oracle-checkable shape; this module is the live-stream
path. State per user is ONE row (start, last, n) regardless of event
volume; each micro-batch folds its events into the open session, emitting
closed sessions downstream. At 100 TB of telemetry this is the standard
recipe: state size = |active users|, shuffles once per batch on the user
key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    events: DataFrame,
    user_col: str,
    time_col: str,
    gap: int,
    flush_open_sessions: bool = False,
) -> DataFrame:
    """events: a STREAMING DataFrame with a long epoch-seconds ``time_col``.
    Emits one row per closed session: (user, session_id = start,
    session_end, n_events).

    ``flush_open_sessions=False`` (default): GroupStateTimeout.NoTimeout —
    an idle user's final open session is only emitted when a LATER event
    from that user arrives (and its state is held until then).  This is
    the faithful at-most-state shape when no watermark is available.

    ``flush_open_sessions=True``: EventTimeTimeout — a watermark of ``gap``
    seconds is applied on ``time_col`` and each open session registers a
    timeout at ``last + gap``; once the watermark passes it, the session is
    emitted as closed and its state row is freed.  This is the shape a
    long-lived deployment wants: state size stays bounded by the number of
    *currently active* users instead of all users ever seen.

    Caveat (documented): within one micro-batch events are sorted by event
    time; across batches, late events older than the open session's last
    timestamp extend n_events but not ordering — the watermark bounds that
    lateness in the timeout mode."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{user_col} string, session_id long, session_end long, n_events long"
    )
    state_schema = "start long, last long, n long"

    def fn(key, pdfs, state):
        import pandas as pd

        if flush_open_sessions and state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(key[0], start, last, n)],
                columns=[user_col, "session_id", "session_end", "n_events"],
            )
            return
        times: list[int] = []
        for pdf in pdfs:
            times.extend(int(t) for t in pdf[time_col])
        times.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed = []
        for t in times:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap:
                closed.append((key[0], start, last, n))
                start, last, n = t, t, 1
            else:
                last = max(last, t)
                n += 1
        if start is not None:
            state.update((start, last, n))
            if flush_open_sessions:
                # fire once the event-time watermark passes session close
                state.setTimeoutTimestamp((last + gap) * 1000 + 1)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[user_col, "session_id", "session_end", "n_events"],
            )

    if flush_open_sessions:
        events = events.withColumn(
            "__event_ts", F.timestamp_seconds(F.col(time_col))
        ).withWatermark("__event_ts", f"{gap} seconds")
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    return events.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )
