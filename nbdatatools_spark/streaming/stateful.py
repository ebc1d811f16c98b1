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


def running_decayed_sum(
    events,
    decay: float = 0.5,
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple = ("ts", "event_id"),
):
    """Streaming EWMA: per-key exponentially-decayed value sum maintained
    incrementally across micro-batches (state recurrence s ← v + decay·s —
    the online form of operators.temporal.exp_decayed_sum's Σ v_i·d^(n-i);
    with in-order arrival the final state equals the batch operator).

    State per key is two scalars (count, ewma) — bounded regardless of
    stream length, the O(1)-per-key shape GroupState is for. Events are
    folded in ``order_cols`` order WITHIN each micro-batch; cross-batch
    order is the source's (file/offset) order, as with any streaming
    recurrence.
    """
    if not 0.0 < decay <= 1.0:
        raise ValueError(f"decay must be in (0, 1], got {decay}")
    order = list(order_cols)

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (k,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            if pdf.empty:
                continue
            for v in pdf.sort_values(order)[value_col]:
                s = float(v) + decay * s
                n += 1
        state.update((n, s))
        state.setTimeoutDuration(60 * 60 * 1000)
        yield pd.DataFrame({"key": [k], "n_events": [n], "decayed_sum": [s]})

    out_schema = "key BIGINT, n_events BIGINT, decayed_sum DOUBLE"
    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="n BIGINT, ewma DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def running_zscore_flags(events, z_threshold: float = 3.0, min_n: int = 5):
    """Online anomaly flagging: per-key running moments (count, sum, sum of
    squares) over event values; each arriving event is scored against the
    state BEFORE it is absorbed (a point can't vouch for itself), and
    events with ``|z| > z_threshold`` after ``min_n`` observations flag as
    anomalies. State is three scalars per key — bounded at any stream
    length, the EWMA/stats discipline.

    The within-batch pass is VECTORIZED: prior counts/means/variances for
    every event come from numpy prefix sums over the (ts, event_id)-sorted
    batch — no per-row Python, the mapInPandas kernel discipline. Emits one
    row per event: (user_id, event_id, value, z, is_anomaly); a drained
    availableNow stream equals the batch expanding-window computation
    (parity-tested).
    """
    import numpy as np

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n0, s0, ss0 = state.get if state.exists else (0, 0.0, 0.0)
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            state.update((n0, s0, ss0))
            state.setTimeoutDuration(60 * 60 * 1000)
            yield pd.DataFrame(
                [], columns=["user_id", "event_id", "value", "z", "is_anomaly"]
            )
            return
        allp = pd.concat(frames).sort_values(["ts", "event_id"])
        x = allp["value"].to_numpy(dtype=np.float64)
        m = len(x)
        csum = np.concatenate(([0.0], np.cumsum(x)[:-1]))
        csq = np.concatenate(([0.0], np.cumsum(x * x)[:-1]))
        n_prior = n0 + np.arange(m, dtype=np.float64)
        sum_prior = s0 + csum
        ss_prior = ss0 + csq
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_prior = np.where(n_prior > 0, sum_prior / n_prior, 0.0)
            var_prior = np.where(
                n_prior > 0, ss_prior / n_prior - mean_prior * mean_prior, 0.0
            )
        var_prior = np.maximum(var_prior, 0.0)
        std = np.sqrt(var_prior)
        ok = (n_prior >= min_n) & (std > 0)
        z = np.where(ok, (x - mean_prior) / np.where(std > 0, std, 1.0), 0.0)
        z = np.round(z, 6)
        flags = ok & (np.abs(z) > z_threshold)
        state.update((n0 + m, float(s0 + x.sum()), float(ss0 + (x * x).sum())))
        state.setTimeoutDuration(60 * 60 * 1000)
        yield pd.DataFrame(
            {
                "user_id": np.full(m, user_id, dtype=np.int64),
                "event_id": allp["event_id"].to_numpy(dtype=np.int64),
                "value": x,
                "z": z,
                "is_anomaly": flags,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id BIGINT, event_id BIGINT, value DOUBLE, z DOUBLE, is_anomaly BOOLEAN",
        stateStructType="n BIGINT, s DOUBLE, ss DOUBLE",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def running_page_hinkley(
    events,
    key_col: str = "event_type",
    value_col: str = "value",
    order_cols: tuple = ("ts", "event_id"),
    delta: float = 0.5,
    lambda_: float = 10.0,
):
    """Streaming Page-Hinkley mean-shift detector per key — the online
    form of ``operators.temporal.page_hinkley``'s closed-form batch
    build, maintained incrementally across micro-batches:

        n += 1; s += x; xbar = s/n
        m += x - xbar - delta;  m_min = min(m_min, m)
        ph = m - m_min;  alarm when ph > lambda

    State per key is FOUR scalars (n, sum, m, m_min) — bounded however
    long the stream runs, the running_decayed_sum GroupState shape.
    Values fold in ``order_cols`` order within each micro-batch; with
    in-order arrival the final (n, m, ph) equals the batch operator on
    the same rows to float-sum rounding (pinned by
    tests/test_stream_page_hinkley.py).

    Emits ``(key, n, running_mean, m_t, ph, is_alarm)`` per key per
    micro-batch.
    """
    if lambda_ <= 0:
        raise ValueError(f"lambda_ must be positive, got {lambda_}")
    order = list(order_cols)

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (k,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, s, m, m_min = state.get if state.exists else (0, 0.0, 0.0, 0.0)
        for pdf in pdfs:
            if pdf.empty:
                continue
            for v in pdf.sort_values(order)[value_col]:
                x = float(v)
                n += 1
                s += x
                m += round(x - s / n - delta, 9)
                if m < m_min:
                    m_min = m
        state.update((n, s, m, m_min))
        state.setTimeoutDuration(60 * 60 * 1000)
        ph = m - m_min
        yield pd.DataFrame(
            {
                "key": [k],
                "n": [n],
                "running_mean": [s / n if n else 0.0],
                "m_t": [m],
                "ph": [ph],
                "is_alarm": [ph > lambda_],
            }
        )

    out_schema = (
        "key STRING, n BIGINT, running_mean DOUBLE, m_t DOUBLE, "
        "ph DOUBLE, is_alarm BOOLEAN"
    )
    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="n BIGINT, s DOUBLE, m DOUBLE, m_min DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
