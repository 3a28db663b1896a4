"""Streaming exact-dedup via ``transformWithStateInPandas`` — the
Spark 4 arbitrary-state API (StatefulProcessor + typed state
variables), successor to ``applyInPandasWithState`` (stateful.py keeps
the classic API for parity; this module is the forward path).

SURVEY.md §2h/§2i context: the reference's idempotent ingest
(``ON CONFLICT DO NOTHING``, load.py:146) is exactly streaming
first-writer-wins dedup. Built-in ``dropDuplicatesWithinWatermark``
covers the common case; this operator is the custom-state variant for
when per-key logic must also ACCUMULATE (here: how many duplicates
each key absorbed — the observability the reference's merge rowcount
gave, per key instead of per run).

Scale design: state is one small ValueState row per key, hash-
partitioned across executors by ``groupBy(key)``; TTL bounds the
store, so unbounded key spaces (content hashes over an endless
document stream) cannot grow state forever. TTL eviction is
processing-time by design — it is a *memory bound*, not a semantic
window (the semantic event-time bound is ``dropDuplicatesWithin
Watermark``'s job). RocksDB state store + changelog checkpointing is
the production config; the operator itself is store-agnostic.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

# The TWS driver worker is a FRESH python process that unpickles the
# StatefulProcessor; it does not inherit the driver's sys.path, so a
# by-reference pickle of this class would fail to import. By-value
# registration ships the class definition inside the pickle itself —
# no PYTHONPATH contract with the cluster.
cloudpickle.register_pickle_by_value(sys.modules[__name__])

OUTPUT_SCHEMA = "key string, first_id long, n_dups long, is_first boolean"
_STATE_SCHEMA = "first_id long, n_dups long"


class _DedupProcessor(StatefulProcessor):
    """First row per key passes (is_first=true); later rows emit a
    running duplicate count. State: (first_id, n_dups) per key."""

    def __init__(self, ttl_ms: int | None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState("seen", _STATE_SCHEMA, self._ttl_ms)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if self._seen.exists():
            first_id, n_dups = self._seen.get()
            is_first = False
        else:
            first_id, n_dups, is_first = None, 0, True
        batch_n = 0
        batch_first = None
        for pdf in rows:
            if len(pdf):
                m = int(pdf["row_id"].min())
                batch_first = m if batch_first is None else min(batch_first, m)
            batch_n += len(pdf)
        if is_first:
            # min row_id, not "first seen": the post-shuffle batch order
            # within a group is arbitrary, so min is the only
            # deterministic definition of the first writer.
            first_id = batch_first
            n_dups += batch_n - 1
        else:
            n_dups += batch_n
        self._seen.update((first_id, n_dups))
        yield pd.DataFrame(
            [{"key": k, "first_id": first_id, "n_dups": n_dups, "is_first": is_first}]
        )

    def close(self) -> None:
        pass


def dedup_stream(df, key_col: str, id_col: str, ttl_ms: int | None = None):
    """df: streaming DataFrame. Emits one row per (key, microbatch)
    with first-writer id and cumulative duplicate count. ``ttl_ms``
    bounds state for unbounded key spaces (expired keys re-admit —
    the deliberate memory/completeness trade at 100 TB)."""
    from pyspark.sql import functions as F

    keyed = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).cast("long").alias("row_id"),
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        _DedupProcessor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="ProcessingTime",
    )


def dedup_stream_classic(df, key_col: str, id_col: str, ttl_ms: int | None = None):
    """``applyInPandasWithState`` twin of ``dedup_stream`` — identical
    per-key state machine (first_id = min row_id ever seen, cumulative
    n_dups) and identical TTL semantics (processing-time state
    eviction; expired keys re-admit as fresh firsts).

    Exists because the TWS state-server protocol needs protobuf, which
    some images lack: the classic API keeps the SAME dedup/TTL
    semantics executable (and therefore testable) everywhere, and is
    the drop-in for pre-4.0 clusters. TTL maps to
    ``GroupStateTimeout.ProcessingTimeTimeout`` + ``setTimeoutDuration``
    — like TWS's ttl it is a MEMORY BOUND, not a semantic window, so
    the timed-out branch evicts silently (no emission)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ttl = ttl_ms

    def _dedup(key, pdfs, state: GroupState):
        (k,) = key
        if state.hasTimedOut:
            state.remove()  # memory bound: evict silently, key re-admits
            return
        if state.exists:
            first_id, n_dups = state.get
            is_first = False
        else:
            first_id, n_dups, is_first = None, 0, True
        batch_n = 0
        batch_first = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["row_id"].min())
                batch_first = m if batch_first is None else min(batch_first, m)
            batch_n += len(pdf)
        if is_first:
            # min row_id, not "first seen": the post-shuffle batch order
            # within a group is arbitrary, so min is the only
            # deterministic definition of the first writer.
            first_id = batch_first
            n_dups += batch_n - 1
        else:
            n_dups += batch_n
        state.update((first_id, n_dups))
        if ttl is not None:
            state.setTimeoutDuration(ttl)
        yield pd.DataFrame(
            [{"key": k, "first_id": first_id, "n_dups": n_dups, "is_first": is_first}]
        )

    keyed = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).cast("long").alias("row_id"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _dedup,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


__all__ = ["dedup_stream", "dedup_stream_classic", "OUTPUT_SCHEMA"]
