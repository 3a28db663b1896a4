"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2h/§2i: the escape hatch when built-in windows can't
express the state machine).

``running_user_stats`` keeps an arbitrary per-user accumulator across
microbatches — event count, value sum — and emits a final ``closed``
row when the user goes quiet for ``gap`` of *event time*, i.e. a
"user session summary" that built-in ``session_window`` cannot produce
when the per-group logic needs custom accumulation or emission rules.

Timeouts are **event-time** (watermark-driven), not processing-time:
wall-clock timeouts force the engine to run no-data microbatches
forever to poll for expiry — non-deterministic, untestable, and at
scale a continuous drip of empty batches per trigger. Event-time
expiry only advances when data does, so replays are deterministic and
an idle stream costs nothing.

State lives per group key in the state store (checkpointed,
recoverable); each invocation sees one group's batch rows as pandas
DataFrames — Arrow-batched like every Python boundary in this engine.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, closed boolean"
STATE_SCHEMA = "n long, total double"

_GAP_MS = 30_000  # close a user's session after 30 s of event-time silence


def _track(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, total = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "sum_value": total, "closed": True}]
        )
        return
    n, total = state.get if state.exists else (0, 0.0)
    max_ts_ms = 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        batch_max = pdf["ts"].max()
        if pd.notna(batch_max):
            max_ts_ms = max(max_ts_ms, pd.Timestamp(batch_max).value // 1_000_000)
    state.update((n, total))
    # Expire once the watermark passes last-seen + gap; the engine fires
    # the timed-out branch above in the first batch after that point.
    state.setTimeoutTimestamp(max_ts_ms + _GAP_MS)
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "sum_value": total, "closed": False}]
    )


def running_user_stats(events, watermark_delay: str = "0 seconds"):
    """events: streaming DataFrame with (ts timestamp, user_id long,
    value double). Emits a running per-user row each batch and a final
    ``closed`` row once the watermark passes last activity + 30 s."""
    return (
        events.withWatermark("ts", watermark_delay)
        .select("ts", "user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


__all__ = ["running_user_stats", "OUTPUT_SCHEMA", "STATE_SCHEMA"]
