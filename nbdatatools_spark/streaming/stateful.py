"""Custom stateful streaming operator via applyInPandasWithState (SURVEY §7.8
streaming extension).

``running_user_stats`` maintains per-user running aggregates (event count,
value sum, last-seen timestamp) across micro-batches with GroupState — the
pattern for any reference-style incremental tracker (the merkle chunk-state
BitSet of streaming_and_caching.md:15-37 is the same shape: keyed progress
state updated by arriving chunks, emitted on change).

Works on a streaming DataFrame grouped by user; emits one row per updated
user per batch. Timeouts expire idle users (GroupStateTimeout.ProcessingTimeTimeout).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events BIGINT, sum_value DOUBLE, last_ts TIMESTAMP"
OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, sum_value DOUBLE, last_ts TIMESTAMP"
)


def _update_user(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, s, last = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        s += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last = batch_max if last is None or batch_max > last else last
    state.update((n, s, last))
    state.setTimeoutDuration(60 * 60 * 1000)  # expire idle users after 1h
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [s], "last_ts": [last]}
    )


def running_user_stats(events):
    """events (streaming or batch-grouped) -> incremental per-user stats."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
