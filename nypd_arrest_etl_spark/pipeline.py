"""End-to-end pipeline API (SURVEY.md §3.4).

The reference's three file-materialization stages
(extract -> data/raw_data.json -> transform -> data/transformed_data.json
-> load; /root/reference/scripts/etl.py:20-57) collapse into one lazy
DAG: scan -> clean -> merge -> write. Each stage stays independently
callable (``extract``/``transform``/``load``) for parity with the
reference's per-stage entry points (§3.2); composition is plain
DataFrame-in/DataFrame-out.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from nypd_arrest_etl_spark.operators.clean import clean
from nypd_arrest_etl_spark.operators.merge import merge_into_parquet
from nypd_arrest_etl_spark.sources.files import (
    high_watermark,
    incremental_filter,
    read_csv,
    read_jsonl,
)


@dataclass
class EtlResult:
    """Stage metrics, mirroring the reference's [{'total_records': n}]
    propagation (etl.py:49-53)."""

    inserted: int = 0
    details: dict = field(default_factory=dict)


def extract(spark: SparkSession, source_path: str, fmt: str = "jsonl") -> DataFrame:
    """Scan with the required-column contract (S3/S4/S5)."""
    reader = {"jsonl": read_jsonl, "json": read_jsonl, "csv": read_csv}[fmt]
    return reader(spark, source_path)


transform = clean  # stage alias: transform(df) -> cleaned DataFrame


def load(
    spark: SparkSession,
    df: DataFrame,
    target_path: str,
    partition_by: str | None = None,
) -> EtlResult:
    """First-writer-wins upsert into the Parquet-backed target."""
    n = merge_into_parquet(
        spark, df, target_path, key="arrest_key", partition_by=partition_by
    )
    return EtlResult(inserted=n)


def run_etl(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    fmt: str = "jsonl",
    incremental: bool = True,
    partitioned: bool = False,
) -> EtlResult:
    """The full pipeline as one lazy DAG (reference: etl.py:20-57).

    The incremental high-watermark predicate (S2; reference pushes
    `$where arrest_date > hwm` into the Socrata API, extract.py:60-64)
    is applied on the *parsed* DateType column — correct for raw inputs
    that mix ISO and epoch-millis dates. On a date-partitioned source
    the same predicate partition-prunes the scan.
    """
    raw = extract(spark, source_path, fmt=fmt)
    # Observation metrics ride the same lazy DAG (computed during the
    # write action — zero extra scans or jobs), replacing the
    # reference's per-stage counters (etl.py:49-53) and dropped-row
    # log (transform.py:100-104) with engine-native observability.
    obs_scan = Observation("etl.scan")
    raw = raw.observe(obs_scan, F.count(F.lit(1)).alias("n_scanned"))
    cleaned = transform(raw)
    obs_clean = Observation("etl.clean")
    cleaned = cleaned.observe(obs_clean, F.count(F.lit(1)).alias("n_cleaned"))
    if incremental:
        hwm = high_watermark(spark, target_path, "arrest_date")
        cleaned = incremental_filter(cleaned, hwm, "arrest_date")
    part = "arrest_year" if partitioned else None
    result = load(spark, cleaned, target_path, partition_by=part)
    scanned = obs_scan.get["n_scanned"]
    kept = obs_clean.get["n_cleaned"]
    result.details.update(
        {"scanned": scanned, "cleaned": kept, "dropped_invalid": scanned - kept}
    )
    return result


def main(argv: list[str] | None = None) -> int:
    """CLI parity with the reference's stage entry points (etl.py:59-67,
    §3.2): ``python -m nypd_arrest_etl_spark.pipeline SRC TARGET``.
    Env config mirrors the reference's dotenv switches: USE_CSV=true
    selects the CSV scan (etl.py:24-36), PARTITIONED=true writes the
    year-partitioned layout."""
    import argparse
    import os

    from nypd_arrest_etl_spark.session import get_spark

    p = argparse.ArgumentParser(prog="nypd_arrest_etl_spark.pipeline")
    p.add_argument("source")
    p.add_argument("target")
    p.add_argument("--fmt", choices=["jsonl", "json", "csv"],
                   default="csv" if os.environ.get("USE_CSV", "").lower() == "true" else "jsonl")
    p.add_argument("--full", action="store_true", help="disable the incremental watermark")
    p.add_argument("--partitioned", action="store_true",
                   default=os.environ.get("PARTITIONED", "").lower() == "true")
    args = p.parse_args(argv)

    spark = get_spark(app_name="nypd-arrest-etl")
    res = run_etl(
        spark,
        args.source,
        args.target,
        fmt=args.fmt,
        incremental=not args.full,
        partitioned=args.partitioned,
    )
    print({"inserted": res.inserted, **res.details})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
