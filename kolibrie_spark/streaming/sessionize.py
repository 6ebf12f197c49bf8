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


def sessionize_stream(
    events: DataFrame, user_col: str, time_col: str, gap: int
) -> DataFrame:
    """events: a STREAMING DataFrame. Emits one row per closed session:
    (user, session_id = start, session_end, n_events). The currently-open
    session stays in state until a later event exceeds ``gap``.

    Caveat (documented): within one micro-batch events are sorted by event
    time; across batches, late events older than the open session's last
    timestamp extend n_events but not ordering — add a watermark upstream
    to bound lateness, like the structured RSP path."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{user_col} string, session_id long, session_end long, n_events long"
    )
    state_schema = "start long, last long, n long"

    def fn(key, pdfs, state):
        import pandas as pd

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
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[user_col, "session_id", "session_end", "n_events"],
            )

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
