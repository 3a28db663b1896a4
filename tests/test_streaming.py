"""Structured Streaming surface: incremental ETL (checkpoint resume,
idempotent merge), tumbling windows, session windows."""

import json
import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nypd_arrest_etl_spark.streaming import (
    sessionized_stream,
    stream_etl,
    tumbling_counts_stream,
)

# Long-running suite (streaming drains / live servers / storage-format
# e2e / property fuzz / soak): excluded from the default gate run by
# pytest.ini's `-m "not slow"`; run with -m "" or SPARK_GRAFT_FULL_TESTS=1.
pytestmark = pytest.mark.slow



def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_etl_incremental_and_idempotent(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    _write_jsonl(
        src / "batch1.json",
        [
            {"arrest_key": "S1", "arrest_date": "2024-01-05", "law_cat_cd": "F"},
            {"arrest_key": "S2", "arrest_date": "2024-01-06", "law_cat_cd": "M"},
            # duplicate key within the stream -> dropped by state dedup
            {"arrest_key": "S1", "arrest_date": "2024-01-07", "law_cat_cd": "V"},
        ],
    )
    q = stream_etl(spark, str(src), target, ckpt)
    q.awaitTermination(120)
    got = {r["arrest_key"] for r in spark.read.parquet(target).collect()}
    assert got == {"S1", "S2"}

    # second trigger: only the NEW file is read (checkpoint offsets);
    # re-sent key S2 is anti-joined away by the merge.
    _write_jsonl(
        src / "batch2.json",
        [
            {"arrest_key": "S2", "arrest_date": "2024-01-06", "law_cat_cd": "M"},
            {"arrest_key": "S3", "arrest_date": "2024-02-01", "law_cat_cd": "I"},
        ],
    )
    q = stream_etl(spark, str(src), target, ckpt)
    q.awaitTermination(120)
    final = spark.read.parquet(target)
    assert {r["arrest_key"] for r in final.collect()} == {"S1", "S2", "S3"}
    assert final.count() == 3


def test_stream_etl_overwrite_partitions_strategy(spark, tmp_path):
    """foreachBatch + merge_overwrite_partitions: each microbatch
    rewrites only its touched year partitions; replay inserts nothing
    and cross-year keys stay deduped across microbatches."""
    import os

    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    _write_jsonl(
        src / "b1.json",
        [
            {"arrest_key": "P1", "arrest_date": "2023-03-05", "law_cat_cd": "F"},
            {"arrest_key": "P2", "arrest_date": "2024-01-06", "law_cat_cd": "M"},
        ],
    )
    q = stream_etl(spark, str(src), target, ckpt, merge_strategy="overwrite_partitions")
    q.awaitTermination(120)
    assert {d for d in os.listdir(target) if d.startswith("arrest_year=")} == {
        "arrest_year=2023",
        "arrest_year=2024",
    }

    _write_jsonl(
        src / "b2.json",
        [
            # re-sent key with a DIFFERENT year: full-key anti-join rejects
            {"arrest_key": "P1", "arrest_date": "2024-06-01", "law_cat_cd": "F"},
            {"arrest_key": "P3", "arrest_date": "2024-02-01", "law_cat_cd": "I"},
        ],
    )
    q = stream_etl(spark, str(src), target, ckpt, merge_strategy="overwrite_partitions")
    q.awaitTermination(120)
    final = spark.read.parquet(target)
    assert {r["arrest_key"] for r in final.collect()} == {"P1", "P2", "P3"}
    assert final.count() == 3
    assert final.filter("arrest_key = 'P1' AND arrest_year = 2024").count() == 0


EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def _events_stream(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        {"ts": "2024-03-01T10:05:00Z", "event_type": "click", "value": 1.0, "user_id": 1},
        {"ts": "2024-03-01T10:45:00Z", "event_type": "click", "value": 2.0, "user_id": 1},
        {"ts": "2024-03-01T11:10:00Z", "event_type": "view", "value": 3.0, "user_id": 1},
        # >30 min gap for user 2 -> two sessions
        {"ts": "2024-03-01T10:00:00Z", "event_type": "click", "value": 4.0, "user_id": 2},
        {"ts": "2024-03-01T12:00:00Z", "event_type": "view", "value": 5.0, "user_id": 2},
    ]
    _write_jsonl(src / "e1.json", rows)
    return spark.readStream.schema(EVENTS_SCHEMA).json(str(src))


def test_tumbling_counts_stream(spark, tmp_path):
    agg = tumbling_counts_stream(_events_stream(spark, tmp_path))
    q = (
        agg.writeStream.format("memory")
        .queryName("t_tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].isoformat(), r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM t_tumbling").collect()
    }
    assert got[("2024-03-01T10:00:00", "click")] == (3, 7.0)
    assert got[("2024-03-01T11:00:00", "view")] == (1, 3.0)
    assert got[("2024-03-01T12:00:00", "view")] == (1, 5.0)


def test_sessionized_stream(spark, tmp_path):
    sess = sessionized_stream(_events_stream(spark, tmp_path))
    q = (
        sess.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM t_sessions").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["n_events"])
    # user 1: 10:05 | 40-min gap | 10:45, 11:10 -> two sessions (1 + 2)
    assert sorted(by_user[1]) == [1, 2]
    # user 2: 10:00 and 12:00 -> two singleton sessions
    assert sorted(by_user[2]) == [1, 1]


def test_watermark_drops_late_events_in_append_mode(spark, tmp_path):
    """Append mode emits a window only once its end passes the
    watermark, and events arriving behind the watermark are dropped —
    the formal replacement for the reference's assumption that old
    data never changes."""
    src = tmp_path / "late"
    src.mkdir()
    stream = spark.readStream.schema(EVENTS_SCHEMA).json(str(src))
    agg = tumbling_counts_stream(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .start()
    )
    try:
        _write_jsonl(
            src / "b1.json",
            [
                {"ts": "2024-03-01T10:05:00Z", "event_type": "click", "value": 1.0, "user_id": 1},
                {"ts": "2024-03-01T10:45:00Z", "event_type": "click", "value": 2.0, "user_id": 1},
            ],
        )
        q.processAllAvailable()  # watermark advances to 10:45 - 2h = 08:45
        _write_jsonl(
            src / "b2.json",
            [
                # window [07:00, 08:00) ends before watermark 08:45 ->
                # dropped (drop is by window end, not raw event time)
                {"ts": "2024-03-01T07:10:00Z", "event_type": "click", "value": 99.0, "user_id": 1},
                # advances watermark to 11:00, finalizing the 10:00 window
                {"ts": "2024-03-01T13:00:00Z", "event_type": "view", "value": 3.0, "user_id": 1},
            ],
        )
        q.processAllAvailable()
        # one more empty-ish batch lets the 10:00 window emit
        _write_jsonl(
            src / "b3.json",
            [{"ts": "2024-03-01T13:30:00Z", "event_type": "view", "value": 4.0, "user_id": 1}],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["window_start"].isoformat(): (r["n"], r["sum_value"])
            for r in spark.sql("SELECT * FROM t_late").collect()}
    # 10:00 window finalized WITHOUT the dropped 99.0 late event
    assert rows.get("2024-03-01T10:00:00") == (2, 3.0)
    # the dropped event never materialized an 07:00 window
    assert "2024-03-01T07:00:00" not in rows
    # 13:00 window not yet final (watermark 11:30 < 14:00)
    assert "2024-03-01T13:00:00" not in rows


def test_incremental_rollup_matches_full_recompute(spark, tmp_path):
    """Continuous aggregate: after two incremental triggers the stored
    rollup equals a from-scratch batch aggregation, and a re-trigger
    with no new data changes nothing (idempotent)."""
    from nypd_arrest_etl_spark.streaming.rollup import rollup_stream

    src = tmp_path / "roll_src"
    src.mkdir()
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "roll_ckpt")

    b1 = [
        {"ts": "2024-03-01T10:05:00Z", "event_type": "click", "value": 1.0, "user_id": 1},
        {"ts": "2024-03-01T10:50:00Z", "event_type": "click", "value": 2.0, "user_id": 2},
        {"ts": "2024-03-02T09:00:00Z", "event_type": "view", "value": 3.0, "user_id": 1},
    ]
    b2 = [
        # adds into an EXISTING window (10:00 on 03-01) and a new day
        {"ts": "2024-03-01T10:59:00Z", "event_type": "click", "value": 4.0, "user_id": 3},
        {"ts": "2024-03-03T01:00:00Z", "event_type": "view", "value": 5.0, "user_id": 1},
    ]

    def run():
        q = rollup_stream(
            spark,
            spark.readStream.schema(EVENTS_SCHEMA).json(str(src)),
            rollup,
            ckpt,
        )
        q.awaitTermination(120)

    _write_jsonl(src / "b1.json", b1)
    run()
    _write_jsonl(src / "b2.json", b2)
    run()
    run()  # no new data: nothing changes

    got = {
        (str(r["day"]), r["window_start"].isoformat(), r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.read.parquet(rollup).collect()
    }
    assert got[("2024-03-01", "2024-03-01T10:00:00", "click")] == (3, 7.0)
    assert got[("2024-03-02", "2024-03-02T09:00:00", "view")] == (1, 3.0)
    assert got[("2024-03-03", "2024-03-03T01:00:00", "view")] == (1, 5.0)
    assert len(got) == 3


def test_apply_in_pandas_with_state_accumulates(spark, tmp_path):
    """Custom stateful operator: per-user accumulators survive across
    microbatches in the state store, and sessions close deterministically
    when the event-time watermark passes last activity + gap."""
    from nypd_arrest_etl_spark.streaming.stateful import running_user_stats

    src = tmp_path / "stateful"
    src.mkdir()
    stream = spark.readStream.schema(EVENTS_SCHEMA).json(str(src))
    out = running_user_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_state")
        .outputMode("append")
        .start()
    )
    try:
        _write_jsonl(
            src / "s1.json",
            [
                {"ts": "2024-03-01T10:00:00Z", "event_type": "click", "value": 1.0, "user_id": 1},
                {"ts": "2024-03-01T10:01:00Z", "event_type": "click", "value": 2.0, "user_id": 1},
                {"ts": "2024-03-01T10:00:30Z", "event_type": "view", "value": 5.0, "user_id": 2},
            ],
        )
        q.processAllAvailable()
        _write_jsonl(
            src / "s2.json",
            [{"ts": "2024-03-01T10:02:00Z", "event_type": "click", "value": 4.0, "user_id": 1}],
        )
        q.processAllAvailable()
        # advance the watermark far past user 2's (10:00:30 + 30s) expiry
        _write_jsonl(
            src / "s3.json",
            [{"ts": "2024-03-01T10:05:00Z", "event_type": "click", "value": 9.0, "user_id": 3}],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = [
        (r["user_id"], r["n_events"], r["sum_value"], r["closed"])
        for r in spark.sql("SELECT * FROM t_state").collect()
    ]
    # batch 1 running rows
    assert (1, 2, 3.0, False) in rows and (2, 1, 5.0, False) in rows
    # batch 2: user 1's state carried over (2 + 1 events, 3.0 + 4.0)
    assert (1, 3, 7.0, False) in rows
    # batch 3: watermark (10:02) passed user 2's expiry (10:01) -> closed;
    # the post-batch watermark bump to 10:05 then closes user 1 (10:02:30)
    assert (2, 1, 5.0, True) in rows
    assert (1, 3, 7.0, True) in rows
    # user 3 (10:05 + 30s expiry) is still ahead of the watermark -> open
    assert (3, 1, 9.0, False) in rows
    assert not any(u == 3 and closed for (u, _n, _s, closed) in rows)


def test_interval_join_stream_pairs_within_bound(spark, tmp_path):
    """Stream-stream interval join: clicks pair with same-user events
    landing within [click_ts, click_ts + 10 min]; outside-window and
    cross-user events never pair. State is watermark-bounded."""
    from nypd_arrest_etl_spark.streaming.pipeline import interval_join_stream

    src_l, src_r = tmp_path / "clicks", tmp_path / "views"
    src_l.mkdir(), src_r.mkdir()
    _write_jsonl(
        src_l / "l.json",
        [
            {"ts": "2024-03-01T10:00:00Z", "event_type": "click", "value": 1.0, "user_id": 1},
            {"ts": "2024-03-01T11:00:00Z", "event_type": "click", "value": 2.0, "user_id": 2},
        ],
    )
    _write_jsonl(
        src_r / "r.json",
        [
            # within 10 min of user 1's click -> pairs
            {"ts": "2024-03-01T10:07:00Z", "event_type": "view", "value": 3.0, "user_id": 1},
            # 20 min after user 1's click -> outside bound
            {"ts": "2024-03-01T10:20:00Z", "event_type": "view", "value": 4.0, "user_id": 1},
            # within bound but wrong user -> no pair
            {"ts": "2024-03-01T10:05:00Z", "event_type": "view", "value": 5.0, "user_id": 9},
            # before the click -> no pair
            {"ts": "2024-03-01T10:59:00Z", "event_type": "view", "value": 6.0, "user_id": 2},
        ],
    )
    left = spark.readStream.schema(EVENTS_SCHEMA).json(str(src_l))
    right = spark.readStream.schema(EVENTS_SCHEMA).json(str(src_r))
    joined = interval_join_stream(left, right, upper="10 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName("t_interval_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM t_interval_join").collect()
    got = {(r["user_id"], r["right_ts"].isoformat()) for r in rows}
    assert got == {(1, "2024-03-01T10:07:00")}


def test_transform_with_state_dedup_stream(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 arbitrary-state API):
    first-writer-wins dedup with per-key duplicate accounting that
    survives across microbatches in the state store.

    The TWS state-server protocol needs protobuf, which this container
    lacks (no-install environment) — skip there; the operator is the
    forward path on any standard Spark 4 deployment."""
    import pytest

    pytest.importorskip("google.protobuf")
    from nypd_arrest_etl_spark.streaming.tws import dedup_stream

    src = tmp_path / "tws"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("doc", T.StringType()),
            T.StructField("row_id", T.LongType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(str(src))
    out = dedup_stream(stream, key_col="doc", id_col="row_id")
    q = (
        out.writeStream.format("memory")
        .queryName("t_tws")
        .outputMode("append")
        .start()
    )
    try:
        _write_jsonl(
            src / "b1.json",
            [
                {"doc": "A", "row_id": 1},
                {"doc": "A", "row_id": 2},
                {"doc": "B", "row_id": 3},
            ],
        )
        q.processAllAvailable()
        _write_jsonl(
            src / "b2.json",
            [{"doc": "A", "row_id": 4}, {"doc": "C", "row_id": 5}],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        (r["key"], r["is_first"]): (r["first_id"], r["n_dups"])
        for r in spark.sql("SELECT * FROM t_tws").collect()
    }
    # batch 1: A first seen at row 1 with one in-batch dup; B clean
    assert rows[("A", True)] == (1, 1)
    assert rows[("B", True)] == (3, 0)
    # batch 2: A's state carried over -> cumulative 2 dups, first_id kept
    assert rows[("A", False)] == (1, 2)
    assert rows[("C", True)] == (5, 0)


def test_dedup_stream_classic_matches_tws_semantics(spark, tmp_path):
    """applyInPandasWithState twin of the TWS dedup processor: the SAME
    state machine and assertions as test_transform_with_state_dedup_
    stream, executable without the protobuf-dependent TWS state server
    — so the dedup/TTL semantics are exercised in this image too."""
    from nypd_arrest_etl_spark.streaming.tws import dedup_stream_classic

    src = tmp_path / "classic"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("doc", T.StringType()),
            T.StructField("row_id", T.LongType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(str(src))
    out = dedup_stream_classic(stream, key_col="doc", id_col="row_id")
    q = (
        out.writeStream.format("memory")
        .queryName("t_classic")
        .outputMode("append")
        .start()
    )
    try:
        _write_jsonl(
            src / "b1.json",
            [
                {"doc": "A", "row_id": 1},
                {"doc": "A", "row_id": 2},
                {"doc": "B", "row_id": 3},
            ],
        )
        q.processAllAvailable()
        _write_jsonl(
            src / "b2.json",
            [{"doc": "A", "row_id": 4}, {"doc": "C", "row_id": 5}],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        (r["key"], r["is_first"]): (r["first_id"], r["n_dups"])
        for r in spark.sql("SELECT * FROM t_classic").collect()
    }
    # batch 1: A first seen at row 1 with one in-batch dup; B clean
    assert rows[("A", True)] == (1, 1)
    assert rows[("B", True)] == (3, 0)
    # batch 2: A's state carried over -> cumulative 2 dups, first_id kept
    assert rows[("A", False)] == (1, 2)
    assert rows[("C", True)] == (5, 0)


def test_dedup_stream_classic_ttl_evicts_and_readmits(spark, tmp_path):
    """TTL semantics: a key idle past the processing-time TTL is
    evicted (memory bound) and RE-ADMITS as a fresh first — the
    deliberate memory/completeness trade for unbounded key spaces.

    Driven as discrete availableNow runs over one checkpoint: a
    continuously-running query with ProcessingTimeTimeout schedules
    no-data poll batches forever (processAllAvailable never settles —
    the wall-clock-timer hazard stateful.py's docstring documents), so
    the test advances time BETWEEN runs and lets the next data batch
    fire the expired timer."""
    import time as _time

    from nypd_arrest_etl_spark.streaming.tws import dedup_stream_classic

    src = tmp_path / "classic_ttl"
    src.mkdir()
    ckpt = str(tmp_path / "classic_ttl_ckpt")
    sink = str(tmp_path / "classic_ttl_out")
    schema = T.StructType(
        [
            T.StructField("doc", T.StringType()),
            T.StructField("row_id", T.LongType()),
        ]
    )

    def run_batch():
        # memory sink can't recover a checkpoint; the parquet file sink
        # can, so discrete availableNow runs share state through ckpt
        stream = spark.readStream.schema(schema).json(str(src))
        out = dedup_stream_classic(stream, key_col="doc", id_col="row_id", ttl_ms=500)
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_jsonl(src / "b1.json", [{"doc": "A", "row_id": 1}])
    run_batch()
    _time.sleep(2.0)  # let A's 500 ms TTL expire in wall-clock
    # an unrelated batch advances processing time -> A's timer fires
    _write_jsonl(src / "b2.json", [{"doc": "B", "row_id": 2}])
    run_batch()
    # A returns: state gone, so it must re-admit as a fresh first
    _write_jsonl(src / "b3.json", [{"doc": "A", "row_id": 3}])
    run_batch()

    a_rows = sorted(
        (r["first_id"], r["is_first"], r["n_dups"])
        for r in spark.read.parquet(sink).collect()
        if r["key"] == "A"
    )
    # two fresh firsts, no carried state: (1, True, 0) then (3, True, 0)
    assert a_rows == [(1, True, 0), (3, True, 0)]


def test_funnel_stream_advances_across_batches(spark, tmp_path):
    """Streaming funnel: stage machine persists per user across
    microbatches; out-of-order events before the last completion do
    not advance; idle users are GC'd by event-time timeout."""
    from nypd_arrest_etl_spark.streaming.funnel import funnel_stream

    src = tmp_path / "funnel"
    src.mkdir()
    stream = spark.readStream.schema(EVENTS_SCHEMA).json(str(src))
    q = (
        funnel_stream(stream)
        .writeStream.format("memory")
        .queryName("t_funnel")
        .outputMode("append")
        .start()
    )
    try:
        _write_jsonl(
            src / "b1.json",
            [
                # u1 view+click in one batch, delivered out of order
                {"ts": "2024-03-01T10:01:00Z", "event_type": "click", "user_id": 1},
                {"ts": "2024-03-01T10:00:00Z", "event_type": "view", "user_id": 1},
                # u2: purchase BEFORE any view -> must not advance
                {"ts": "2024-03-01T10:00:00Z", "event_type": "purchase", "user_id": 2},
            ],
        )
        q.processAllAvailable()
        _write_jsonl(
            src / "b2.json",
            [
                {"ts": "2024-03-01T10:05:00Z", "event_type": "purchase", "user_id": 1},
                {"ts": "2024-03-01T10:06:00Z", "event_type": "view", "user_id": 2},
                # u1 late view BEFORE its click completion -> ignored
                {"ts": "2024-03-01T10:00:30Z", "event_type": "view", "user_id": 1},
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        (r["user_id"], r["step"]): r["step_name"]
        for r in spark.sql("select * from t_funnel").collect()
    }
    assert rows == {
        (1, 1): "view",
        (1, 2): "click",
        (1, 3): "purchase",
        (2, 1): "view",
    }


def test_stream_etl_txn_strategy_snapshot_versions(spark, tmp_path):
    """foreachBatch + manifest txn merge: microbatches become manifest
    versions; a concurrent batch-side merge between triggers cannot
    duplicate a key the stream later re-sends."""
    from nypd_arrest_etl_spark.sinks import manifest as M

    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    _write_jsonl(
        src / "b1.json",
        [
            {"arrest_key": "T1", "arrest_date": "2024-01-05", "law_cat_cd": "F"},
            {"arrest_key": "T2", "arrest_date": "2024-01-06", "law_cat_cd": "M"},
        ],
    )
    q = stream_etl(spark, str(src), target, ckpt, merge_strategy="txn")
    q.awaitTermination(120)
    snap = M.snapshot(target)
    assert snap is not None and snap.version == 0
    assert {r["arrest_key"] for r in snap.read(spark).collect()} == {"T1", "T2"}

    # a concurrent NON-stream writer commits T3 between triggers
    other = spark.createDataFrame(
        [("T3",)], "arrest_key string"
    )
    base = snap.read(spark)
    extra = base.filter("arrest_key = 'T1'").drop("arrest_key").limit(1).crossJoin(other)
    M.merge_insert_if_absent_txn(spark, extra.select(base.columns), target)

    # stream re-sends T3 (plus new T4): anti-join vs the LATEST snapshot
    # rejects T3 even though the stream never wrote it
    _write_jsonl(
        src / "b2.json",
        [
            {"arrest_key": "T3", "arrest_date": "2024-02-01", "law_cat_cd": "I"},
            {"arrest_key": "T4", "arrest_date": "2024-02-02", "law_cat_cd": "V"},
        ],
    )
    q = stream_etl(spark, str(src), target, ckpt, merge_strategy="txn")
    q.awaitTermination(120)
    final = M.snapshot(target).read(spark)
    keys = [r["arrest_key"] for r in final.collect()]
    assert sorted(keys) == ["T1", "T2", "T3", "T4"]


DOCS_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
    ]
)


def test_domain_cap_stream_binds_across_batches_and_days(spark, tmp_path):
    """Streaming per-domain quota: the counter persists across
    microbatches (cap binds cumulatively), two hosts of one
    registrable domain share one quota, and a new event-time day opens
    a fresh budget."""
    from nypd_arrest_etl_spark.streaming.quota import domain_cap_stream

    src = tmp_path / "docs"
    src.mkdir()
    stream = spark.readStream.schema(DOCS_SCHEMA).json(str(src))
    q = (
        domain_cap_stream(stream, cap=2)
        .writeStream.format("memory")
        .queryName("t_quota")
        .outputMode("append")
        .start()
    )
    try:
        _write_jsonl(
            src / "b1.json",
            [
                # 3 big.com docs in one batch, out of ts order -> the two
                # EARLIEST admit; www/cdn hosts fold into one domain
                {"ts": "2024-03-01T10:02:00Z", "doc_id": 3, "url": "https://www.big.com/3"},
                {"ts": "2024-03-01T10:00:00Z", "doc_id": 1, "url": "https://cdn.big.com/1"},
                {"ts": "2024-03-01T10:01:00Z", "doc_id": 2, "url": "https://big.com/2"},
                {"ts": "2024-03-01T10:00:30Z", "doc_id": 10, "url": "https://small.org/10"},
            ],
        )
        q.processAllAvailable()
        _write_jsonl(
            src / "b2.json",
            [
                # same day: big.com quota already exhausted
                {"ts": "2024-03-01T11:00:00Z", "doc_id": 4, "url": "https://big.com/4"},
                # next day: fresh budget
                {"ts": "2024-03-02T09:00:00Z", "doc_id": 5, "url": "https://big.com/5"},
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        r["doc_id"]: (r["domain"], str(r["day"]), r["n_admitted"])
        for r in spark.sql("select * from t_quota").collect()
    }
    assert rows == {
        1: ("big.com", "2024-03-01", 1),
        2: ("big.com", "2024-03-01", 2),
        10: ("small.org", "2024-03-01", 1),
        5: ("big.com", "2024-03-02", 1),
    }


def test_domain_cap_stream_replay_is_deterministic(spark, tmp_path):
    """A fresh checkpoint replay of the same input admits the same
    doc_ids (in-batch sort + counter state make admission a pure
    function of the input)."""
    from nypd_arrest_etl_spark.streaming.quota import domain_cap_stream

    src = tmp_path / "docs"
    src.mkdir()
    _write_jsonl(
        src / "b1.json",
        [
            {"ts": "2024-03-01T10:00:00Z", "doc_id": i, "url": f"https://d.net/{i}"}
            for i in (7, 3, 9, 1)
        ],
    )

    def run(qn):
        stream = spark.readStream.schema(DOCS_SCHEMA).json(str(src))
        q = (
            domain_cap_stream(stream, cap=2)
            .writeStream.format("memory")
            .queryName(qn)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return sorted(r["doc_id"] for r in spark.sql(f"select * from {qn}").collect())

    assert run("t_q_a") == run("t_q_b") == [1, 3]


def test_quota_admit_sorts_across_arrow_chunks():
    """r9 ADVICE (quota.py:67): a hot (domain, day) group arrives as
    MULTIPLE Arrow chunks; admission must follow GLOBAL event-time
    order, not per-chunk order. Drives _admit directly with a fake
    GroupState and two interleaved chunks."""
    import pandas as pd

    from nypd_arrest_etl_spark.streaming.quota import _make_admit

    class FakeState:
        hasTimedOut = False
        exists = False

        def __init__(self):
            self.value = None

        @property
        def get(self):
            return self.value

        def update(self, v):
            self.value = v
            self.exists = True

        def setTimeoutTimestamp(self, ts):
            self.timeout = ts

        def remove(self):
            self.value = None

    day = pd.Timestamp("2024-03-01")
    ts = [pd.Timestamp("2024-03-01T00:00:00") + pd.Timedelta(minutes=m)
          for m in range(6)]
    # chunk order deliberately NOT time order: chunk1 holds the LATER
    # events (minutes 3,4,5), chunk2 the earlier ones (0,1,2)
    chunk1 = pd.DataFrame({"ts": ts[3:], "doc_id": [103, 104, 105]})
    chunk2 = pd.DataFrame({"ts": ts[:3], "doc_id": [100, 101, 102]})
    state = FakeState()
    out = list(_make_admit(3)(("d.com", day), iter([chunk1, chunk2]), state))
    admitted = pd.concat(out)["doc_id"].tolist()
    # global event-time order admits the three EARLIEST docs
    assert admitted == [100, 101, 102]
    assert state.value == (3,)
