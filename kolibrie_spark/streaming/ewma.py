"""Streaming EWMA — the live twin of ``operators/scd.ewma_last``.

State per key is TWO numbers (count, level) regardless of event volume
(the recurrence s_i = alpha*v_i + (1-alpha)*s_{i-1} is a fold, so the
streaming operator carries exactly the fold accumulator). Each
micro-batch folds its events in event-time order into the level and
emits the updated (key, n_obs, ewma) row — update-mode semantics, one
shuffle per batch on the key.

Equivalence contract (replay-tested): feeding the batches of a finite
history through this operator yields, for every key, the SAME final
(n_obs, ewma) as the batch ``ewma_last`` over the whole history —
provided batch boundaries respect event-time order per key (the same
caveat sessionize_stream documents for late data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ewma_stream(
    events: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """events: a STREAMING DataFrame. Emits (key, n_obs, ewma) per updated
    key per micro-batch (update mode downstream)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    a1 = float(alpha)
    a0 = float(1.0 - alpha)
    out_schema = f"{key_col} string, n_obs long, ewma double"
    state_schema = "n long, level double"

    def fn(key, pdfs, state):
        import pandas as pd

        n, level = state.get if state.exists else (0, None)
        rows = []
        for pdf in pdfs:
            rows.append(pdf[[time_col, value_col]])
        batch = pd.concat(rows) if rows else None
        if batch is not None and len(batch):
            batch = batch.dropna(subset=[value_col]).sort_values(
                by=[time_col, value_col], kind="mergesort"
            )
            for v in batch[value_col].astype(float):
                level = v if level is None else a1 * v + a0 * level
                n += 1
        state.update((n, level))
        if n:
            yield pd.DataFrame([(key[0], n, level)],
                               columns=[key_col, "n_obs", "ewma"])

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
