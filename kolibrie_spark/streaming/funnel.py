"""Streaming funnel tracking — the live twin of
``operators/analytics.funnel``.

Batch funnel semantics (per user, t_{i+1} = earliest step-(i+1) event
STRICTLY after t_i) are a pure fold over the user's time-ordered event
history, which makes the streaming version a natural
``applyInPandasWithState`` operator: state per user is the current
vector of step times (one row, N longs — NOT the event history), each
micro-batch folds its events in event-time order, and the user's funnel
row is re-emitted whenever it advances.

Caveat (same contract as the batch twin): an event can only advance the
funnel if it arrives after the prior step has been absorbed — within a
micro-batch, ordering is restored by the sort; across micro-batches, a
LATE step-2 event that precedes an already-absorbed step-1 time still
advances (its ts is compared against t1, not arrival order), but a late
step-1 event cannot retroactively lower t1 once set unless it is
earlier — the fold re-checks and lowers t1, then REPLAYS nothing: later
steps keep their times (monotone-advance approximation, documented).
For exact late-data semantics run the batch funnel over the closed
window; this operator is the low-latency dashboard path.

At scale: state = |users| x (N+1) longs, shuffled once per micro-batch
on the user key — the standard stateful-streaming recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def funnel_stream(
    events: DataFrame,
    user_col: str,
    time_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """events: STREAMING frame with long ``time_col``. Emits, per
    micro-batch and user whose funnel advanced, the current
    ``(user, t1..tN)`` row (update-in-place stream; latest row per user
    wins downstream)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    from pyspark.sql.streaming.state import GroupStateTimeout

    n = len(steps)
    t_cols = ", ".join(f"t{i + 1} long" for i in range(n))
    out_schema = f"uid string, {t_cols}"
    state_schema = ", ".join(f"t{i + 1} long" for i in range(n))

    def fn(key, pdfs, state):
        import pandas as pd

        ts = list(state.get) if state.exists else [None] * n
        before = tuple(ts)
        evs = []
        for pdf in pdfs:
            evs.extend(zip((int(t) for t in pdf[time_col]), pdf[type_col]))
        evs.sort(key=lambda e: e[0])
        for t, ty in evs:
            if ty == steps[0] and (ts[0] is None or t < ts[0]):
                ts[0] = t
                continue
            for i in range(1, n):
                if (
                    ty == steps[i]
                    and ts[i] is None
                    and ts[i - 1] is not None
                    and t > ts[i - 1]
                ):
                    ts[i] = t
                    break
        if tuple(ts) != before:
            state.update(tuple(ts))
            yield pd.DataFrame(
                [(key[0], *ts)],
                columns=["uid"] + [f"t{i + 1}" for i in range(n)],
            )

    return events.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
