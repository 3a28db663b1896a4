"""Incremental corpus curation over the transactional table format.

The 100 TB curation loop a training pipeline actually runs: raw
documents land in a manifest table (ingest writers append/merge
concurrently); curation tails that table BY VERSION OFFSET — the
`manifest_table` streaming source emits each committed file exactly
once and skips data-preserving rewrite commits — dedupes every
microbatch against EVERYTHING already curated, and commits survivors
to a curated manifest table with the serializable insert-if-absent
merge keyed on the canonical content fingerprint.

End-to-end exactly-once without a transactional sink contract: if a
microbatch replays after a crash (foreachBatch's at-least-once), the
fingerprint-keyed merge re-inserts nothing — idempotent replay is the
dedup semantics itself. The curated table IS the state store: no
streaming state to size or expire, history dedup cost is the merge's
key-range-pruned anti-join (file-skipped on a fingerprint-clustered
table), and a backfill is just restarting the stream from offset 0
with the same checkpoint semantics.

Reference scope: the reference pipeline's extract→transform→load loop
(`/root/reference/scripts/etl.py:20-57`) is this shape with a single
writer and a Postgres target; this module is the corpus-scale twin
over the repo's own table format.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from nypd_arrest_etl_spark.operators.dedup import canonical_fingerprint
from nypd_arrest_etl_spark.sinks.manifest import merge_insert_if_absent_txn
from nypd_arrest_etl_spark.sources.table_stream import register_manifest_table


def curate_incremental(
    spark: SparkSession,
    raw_table: str,
    curated_table: str,
    checkpoint: str,
    text_col: str = "text",
    keep_if: Column | None = None,
):
    """Run one availableNow pass of the incremental curation pipeline.

    Each microbatch: optional quality predicate ``keep_if`` (a pure
    column expression — evaluated batch-side, so rejected docs never
    touch the curated table or its merge scan), canonical content
    fingerprint, serializable first-writer-wins merge on the
    fingerprint. Returns the streaming query (caller awaits it).
    """
    register_manifest_table(spark)

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        batch = batch_df if keep_if is None else batch_df.filter(keep_if)
        fingerprinted = batch.withColumn(
            "fingerprint", canonical_fingerprint(text_col)
        )
        merge_insert_if_absent_txn(
            spark, fingerprinted, curated_table, key="fingerprint"
        )

    return (
        spark.readStream.format("manifest_table")
        .option("path", raw_table)
        .load()
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
