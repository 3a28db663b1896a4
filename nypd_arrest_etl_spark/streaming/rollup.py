"""Continuous aggregate: a materialized time-window rollup maintained
incrementally from a stream (the 'hypertable rollup' pattern).

Counts/sums are additive, so each microbatch contributes partial
aggregates that merge into the stored rollup by re-aggregating only
the affected day partitions — dynamic partition overwrite touches
nothing else. A full recompute over 100 TB of history is replaced by
work proportional to the trigger's new data.

Exactly-once: foreachBatch is at-least-once, so a replayed batch would
double-add. The applied batch id is recorded in ``_meta.json`` inside
the rollup directory and replays of already-applied batches are
skipped — the add-merge becomes idempotent.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

ROLLUP_COLS = ("day", "window_start", "event_type", "n", "sum_value")


def _meta_path(rollup_path: str) -> str:
    return os.path.join(rollup_path, "_meta.json")


def _last_applied(rollup_path: str) -> int:
    try:
        with open(_meta_path(rollup_path)) as f:
            return int(json.load(f)["last_batch_id"])
    except (OSError, ValueError, KeyError):
        return -1


def _batch_rollup(batch: DataFrame, window: str) -> DataFrame:
    return (
        batch.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").cast("date").alias("day"),
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def merge_rollup(
    spark: SparkSession, partial: DataFrame, rollup_path: str
) -> None:
    """Add-merge partial aggregates into the stored rollup, rewriting
    only the affected day partitions (dynamic partition overwrite)."""
    partial = partial.persist()
    try:
        if os.path.exists(rollup_path):
            days = [r["day"] for r in partial.select("day").distinct().collect()]
            if not days:
                return
            existing = spark.read.parquet(rollup_path).filter(F.col("day").isin(days))
            partial = existing.unionByName(partial)
        merged = (
            partial.groupBy("day", "window_start", "event_type")
            .agg(F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value"))
        )
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day")
            .parquet(rollup_path)
        )
    finally:
        partial.unpersist()


def rollup_stream(
    spark: SparkSession,
    events: DataFrame,
    rollup_path: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain the rollup from a streaming events DataFrame
    (schema: ts timestamp, event_type string, value double, ...)."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_applied(rollup_path):
            return  # replayed batch: already merged, skip (idempotent)
        merge_rollup(batch.sparkSession, _batch_rollup(batch, window), rollup_path)
        os.makedirs(rollup_path, exist_ok=True)
        with open(_meta_path(rollup_path), "w") as f:
            json.dump({"last_batch_id": batch_id}, f)

    writer = (
        events.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(apply_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
