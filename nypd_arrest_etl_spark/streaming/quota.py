"""Streaming per-domain admission quota (the streaming twin of
operators/web.py:cap_per_domain) via ``applyInPandasWithState``.

A crawl-ingest stream must bound how many documents any one
registrable domain contributes to the corpus — and it must do so AT
ADMISSION TIME, not in a nightly batch re-cap, or the over-quota
documents still cost the full downstream pipeline (dedup, quality,
tokenize) before being thrown away.

Semantics: quota is per (domain, event-time day) — the real-world
crawl budget shape. A document is admitted iff its domain has admitted
fewer than ``cap`` documents on that day; admission order is event
time (ties broken by doc_id) WITHIN each microbatch, first-arrived
across microbatches — the streaming-native counterpart of the batch
operator's explicit order_by. Re-keying by day gives bounded state for
free: a (domain, day) group goes cold once the watermark passes the
day's end, and the event-time timeout removes it.

Scale posture:
- State per (domain, day) is ONE integer — O(active domains), not
  O(documents).
- The stateful exchange is hash-partitioned on (domain, day): a hot
  domain is one group but its state transition is O(batch rows) with
  an early exit once the quota fills; the day component also spreads
  a persistent mega-domain across time rather than one eternal key.
- Admission decisions are deterministic under replay: the in-batch
  sort and the counter state make re-processing a microbatch admit
  the same rows (exactly-once pairs with the transactional sinks).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "domain string, day date, doc_id long, ts timestamp, n_admitted int"
)
STATE_SCHEMA = "admitted int"

_DAY_MS = 24 * 3600 * 1000
# Keep a filled day's counter around one extra day of event time past
# the day's end before GC: late rows inside the watermark must still
# see the exhausted quota, not a fresh counter.
_TTL_SLACK_MS = _DAY_MS


def _make_admit(cap: int):
    def _admit(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        domain, day = key
        if state.hasTimedOut:
            state.remove()
            return
        (admitted,) = state.get if state.exists else (0,)
        out = []
        # The group's microbatch arrives as an ITERATOR of Arrow-sized
        # chunks (~10k rows each). A hot (domain, day) group — the exact
        # case this operator exists to bound — spans several chunks, and
        # sorting each chunk independently would admit in unstable
        # chunk order, not global event-time order, breaking
        # deterministic replay. Concatenate first, sort ONCE; memory is
        # bounded by the group's per-batch rows, which the cap loop
        # iterates anyway (r9 ADVICE, quota.py:67).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "doc_id"], kind="mergesort"
            )
            for ts, doc_id in zip(pdf["ts"], pdf["doc_id"]):
                if admitted >= cap:
                    break
                admitted += 1
                out.append(
                    {
                        "domain": domain,
                        "day": day,
                        "doc_id": doc_id,
                        "ts": ts,
                        "n_admitted": admitted,
                    }
                )
        state.update((admitted,))
        day_end_ms = (
            pd.Timestamp(day).value // 1_000_000 + _DAY_MS
        )
        state.setTimeoutTimestamp(day_end_ms + _TTL_SLACK_MS)
        if out:
            yield pd.DataFrame(out)

    return _admit


def domain_cap_stream(
    docs: DataFrame,
    cap: int,
    url_col: str = "url",
    ts_col: str = "ts",
    id_col: str = "doc_id",
    watermark_delay: str = "0 seconds",
    domain_key=None,
) -> DataFrame:
    """docs: streaming DataFrame with (ts timestamp, doc_id long,
    url string). Appends one row per ADMITTED document with its
    (domain, day) quota ordinal; over-quota documents are dropped at
    the operator, before any downstream work sees them.

    The domain key derives from the same normalize/host/registrable
    column expressions as the batch operator, so batch re-caps and the
    streaming admission agree on what "one domain" means. Pass
    ``domain_key`` (any Column expression, e.g. a PSL-exact
    ``registrable`` column joined upstream) to override the default
    last-two-labels key where multi-label public suffixes matter
    (r9 ADVICE: without it every *.co.uk site shares one bucket).
    """
    from nypd_arrest_etl_spark.operators.web import registrable_domain, url_host

    dom = (
        domain_key
        if domain_key is not None
        else registrable_domain(url_host(F.col(url_col)))
    )
    # Project FIRST, watermark the projected column: a rename after
    # withWatermark can drop the event-time tag, and EventTimeTimeout
    # requires it.
    keyed = docs.select(
        dom.alias("domain"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.to_date(ts_col).alias("day"),
        F.col(id_col).alias("doc_id"),
    ).withWatermark("ts", watermark_delay)
    return keyed.groupBy("domain", "day").applyInPandasWithState(
        _make_admit(cap),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


__all__ = ["domain_cap_stream", "OUTPUT_SCHEMA", "STATE_SCHEMA"]
