"""Streaming ordered-funnel tracker (the streaming twin of
operators/analytics.py:funnel) via ``applyInPandasWithState``.

Per user, a tiny state machine advances through ``STEPS`` as
qualifying events arrive: step k counts only when its event lands
STRICTLY AFTER the completion of step k-1 (same first-touch semantics
as the batch operator). One append row is emitted per stage
advancement: (user_id, step, step_name, ts).

Streaming semantics / scale posture:
- Events are processed in event-time order WITHIN each microbatch
  (sorted); cross-batch disorder is covered up to the watermark delay
  the caller sets — an event older than an already-consumed later
  event is gone, which is the watermark contract every streaming
  operator here shares.
- State per user is two scalars (stage index, last completion time) —
  O(active users), not O(events).
- Event-time timeout garbage-collects users idle longer than
  ``_TTL_MS`` so unbounded user spaces cannot grow state forever
  (wall-clock timeouts would need no-data microbatches to poll; event
  time only advances with data, so replays stay deterministic).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STEPS = ("view", "click", "purchase")
OUTPUT_SCHEMA = "user_id long, step int, step_name string, ts timestamp"
STATE_SCHEMA = "stage int, t_prev_ms long"

_TTL_MS = 24 * 3600 * 1000  # drop state for users idle > 1 day of event time


def _advance(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    stage, t_prev_ms = state.get if state.exists else (0, -1)
    out = []
    last_seen_ms = t_prev_ms
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values("ts", kind="mergesort")
        for ts, etype in zip(pdf["ts"], pdf["event_type"]):
            ts_ms = pd.Timestamp(ts).value // 1_000_000
            last_seen_ms = max(last_seen_ms, ts_ms)
            if stage >= len(STEPS):
                break
            if etype == STEPS[stage] and ts_ms > t_prev_ms:
                stage += 1
                t_prev_ms = ts_ms
                out.append(
                    {
                        "user_id": user_id,
                        "step": stage,
                        "step_name": etype,
                        "ts": ts,
                    }
                )
    state.update((stage, t_prev_ms))
    state.setTimeoutTimestamp(max(last_seen_ms, 0) + _TTL_MS)
    if out:
        yield pd.DataFrame(out)


def funnel_stream(events, watermark_delay: str = "0 seconds"):
    """events: streaming DataFrame with (ts timestamp, user_id long,
    event_type string). Appends one row per per-user stage advance."""
    return (
        events.withWatermark("ts", watermark_delay)
        .select("ts", "user_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _advance,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


__all__ = ["funnel_stream", "STEPS", "OUTPUT_SCHEMA", "STATE_SCHEMA"]
