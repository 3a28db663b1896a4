"""Structured Streaming surface (SURVEY.md §2h).

The reference approximates streaming with a weekly cron + high-watermark
predicate + offset checkpoint + idempotent key merge
(/root/reference/.github/workflows/etl.yml:5-7,
/root/reference/scripts/extract.py:42-95, load.py:146). Structured
Streaming formalizes that exact contract:

| reference mechanism              | here                                 |
|----------------------------------|--------------------------------------|
| weekly re-pull cron              | ``trigger(availableNow=True)``       |
| ``$where arrest_date > hwm``     | source offset tracking + watermark   |
| checkpoint file (offset resume)  | ``option("checkpointLocation", ...)``|
| ``ON CONFLICT DO NOTHING``       | ``foreachBatch`` + key anti-join     |

Scale notes: the file source lists only new files per trigger (no
rescan); dedup state is bounded by the event-time watermark, not the
unbounded key space; the merge inside ``foreachBatch`` is the same
anti-join the batch path uses, so a microbatch replayed after a crash
inserts zero rows (exactly-once effect on the target table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from nypd_arrest_etl_spark.operators.clean import clean
from nypd_arrest_etl_spark.operators.merge import (
    merge_into_parquet,
    merge_overwrite_partitions,
)
from nypd_arrest_etl_spark.schema import RAW_SCHEMA


def stream_etl(
    spark: SparkSession,
    source_dir: str,
    target_path: str,
    checkpoint_dir: str,
    fmt: str = "json",
    available_now: bool = True,
    dedup_watermark: str = "30 days",
    merge_strategy: str = "append",
) -> StreamingQuery:
    """Incremental ETL as a stream: new files under ``source_dir`` are
    cleaned and merged insert-if-absent into the Parquet target.

    ``available_now=True`` gives the reference's batch cadence (process
    everything new, then stop) with streaming's bookkeeping; ``False``
    runs continuously per trigger.

    Within-stream duplicate arrests are dropped by key with state
    bounded by ``dedup_watermark`` over the arrest date: an arrest key
    re-sent more than the watermark after its first appearance would
    not be caught here — but the foreachBatch merge anti-joins the
    target, so it still cannot land twice. The watermark only bounds
    memory, never correctness.

    ``merge_strategy`` picks the physical merge inside foreachBatch:
    ``"append"`` (merge_into_parquet — simplest, accumulates files),
    ``"overwrite_partitions"`` (merge_overwrite_partitions — each
    microbatch rewrites/compacts only the year partitions it touches;
    the long-running incremental shape), or ``"txn"``
    (sinks.manifest.merge_insert_if_absent_txn — versioned-manifest
    commits, safe when OTHER writers merge into the same table
    concurrently with the stream; readers get snapshot isolation).
    All are idempotent per microbatch, so a replayed batch after a
    crash inserts zero rows.
    """
    if merge_strategy not in ("append", "overwrite_partitions", "txn"):
        raise ValueError(f"unknown merge_strategy {merge_strategy!r}")
    raw = (
        spark.readStream.schema(RAW_SCHEMA).format(fmt).load(source_dir)
        if fmt != "csv"
        else spark.readStream.schema(RAW_SCHEMA).option("header", True).csv(source_dir)
    )
    cleaned = (
        clean(raw)
        .withColumn("__event_ts", F.col("arrest_date").cast("timestamp"))
        .withWatermark("__event_ts", dedup_watermark)
        .dropDuplicatesWithinWatermark(["arrest_key"])
        .drop("__event_ts")
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if merge_strategy == "overwrite_partitions":
            merge_overwrite_partitions(
                batch_df.sparkSession, batch_df, target_path, partition_by="arrest_year"
            )
        elif merge_strategy == "txn":
            from nypd_arrest_etl_spark.sinks.manifest import merge_insert_if_absent_txn

            merge_insert_if_absent_txn(batch_df.sparkSession, batch_df, target_path)
        else:
            merge_into_parquet(batch_df.sparkSession, batch_df, target_path)

    writer = (
        cleaned.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def tumbling_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of plans.queries.q_tumbling_hourly: per-window,
    per-type counts/sums with late data dropped past the watermark.

    Returns an unstarted streaming DataFrame; callers pick sink +
    output mode (append emits finalized windows only)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionized_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming sessionization via ``session_window`` — the native
    stateful twin of the batch lag/running-sum sessionizer
    (plans.queries.q_sessionize). Sessions close when no event arrives
    within ``gap``; watermark finalizes and emits them."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), user_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each LEFT event pairs with RIGHT
    events for the same key whose timestamp lands in
    ``[left_ts, left_ts + upper]`` — the streaming twin of the batch
    bounded range join (operators/temporal.py).

    Both sides are watermarked, and the join condition bounds the
    right side's event time relative to the left's, which is what lets
    the engine EXPIRE buffered rows: state held per side is
    ``watermark + upper`` of event time, independent of stream length.
    An unbounded condition (or missing watermark) would buffer forever
    — Spark rejects it in append mode for exactly that reason.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    return lw.join(
        rw,
        F.expr(
            f"l.{key} = r.{key} AND "
            f"r.{right_ts} >= l.{left_ts} AND "
            f"r.{right_ts} <= l.{left_ts} + interval {upper}"
        ),
    ).select(
        F.col(f"l.{key}").alias(key),
        F.col(f"l.{left_ts}").alias("left_ts"),
        F.col(f"r.{right_ts}").alias("right_ts"),
        F.col("l.event_type").alias("left_type"),
        F.col("r.event_type").alias("right_type"),
    )
