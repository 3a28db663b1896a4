#!/usr/bin/env python3
"""Minimal public repro: Spark 4.1 Python DataSource plan reuse
returns WRONG RESULTS for a filterless query on a previously
filtered DataFrame when the source implements ``pushFilters``.

Self-contained — only pyspark; no external services. Suitable for
filing upstream as-is.

    python tools/repro_python_source_plan_reuse.py
    exit 2  -> bug reproduces (filterless count == filtered count)
    exit 0  -> fixed (counts correct)

What happens (verified on pyspark 4.1.2): the planner re-runs
``pushFilters`` for every FILTERED query on a Python data source,
but a FILTERLESS query on the same loaded DataFrame object reuses
the most recently planned scan — including its pushed predicate.
``df.filter(c > 5).count(); df.count()`` returns the filtered count
twice: the partitions and pickled reader are cached JVM-side per
relation and only refreshed when there are filters to push.

Downstream consequence: any Python source implementing
``pushFilters`` silently under-counts shared DataFrames, which is
why this repo's sources (pg_source.py, rest.py, table_stream.py)
make pushdown OPT-IN per load. tests/test_pgwire.py carries
``test_pgwire_pushdown_plan_reuse_canary`` pinned to the wrong
result; when a Spark upgrade makes THIS script exit 0, the canary
fails and the pushdown default can flip.
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    GreaterThan,
    InputPartition,
)
from pyspark.sql.types import IntegerType, StructField, StructType

N_ROWS = 10
THRESHOLD = 5  # rows with k > 5: 4 of them


class TinyReader(DataSourceReader):
    def __init__(self):
        self.lo = None  # pushed lower bound, None = full scan

    def pushFilters(self, filters):  # noqa: N802 (API name)
        for f in filters:
            if isinstance(f, GreaterThan) and f.attribute == ("k",):
                self.lo = f.value
                continue
            yield f  # anything else stays Spark-side

    def partitions(self):
        return [InputPartition(0)]

    def read(self, partition):
        for k in range(N_ROWS):
            if self.lo is None or k > self.lo:
                yield (k,)


class TinySource(DataSource):
    @classmethod
    def name(cls):
        return "tiny_pushdown"

    def schema(self):
        return StructType([StructField("k", IntegerType())])

    def reader(self, schema):
        return TinyReader()


def main() -> int:
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("python-source-plan-reuse-repro")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .getOrCreate()
    )
    try:
        spark.dataSource.register(TinySource)
        df = spark.read.format("tiny_pushdown").load()

        filtered = df.filter(F.col("k") > THRESHOLD).count()
        unfiltered = df.count()  # SAME DataFrame object, no filter

        fresh = spark.read.format("tiny_pushdown").load().count()

        print(f"filtered count   (k > {THRESHOLD}): {filtered}  (expect 4)")
        print(f"unfiltered count (same df):  {unfiltered}  (expect {N_ROWS})")
        print(f"fresh load count:            {fresh}  (expect {N_ROWS})")

        if filtered != 4 or fresh != N_ROWS:
            print("UNEXPECTED: baseline counts wrong — different bug?")
            return 3
        if unfiltered != N_ROWS:
            print(
                "REPRODUCED: the filterless query reused the filtered "
                "scan (pushed predicate leaked into df.count())"
            )
            return 2
        print("FIXED: filterless query re-planned correctly")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
