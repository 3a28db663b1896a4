"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (plus the
LLM-data-pipeline extensions), as (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-runnable ANSI SQL twins; omitted only for
ops whose semantics aren't SQL-expressible (hash-based LSH sketches,
streaming state) — those get the driver's rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nypd_arrest_etl_spark.plans.queries import RELATIONAL  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from nypd_arrest_etl_spark.plans.queries import q_pricing_summary

    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def _registry() -> dict[str, tuple]:
    reg = dict(RELATIONAL)
    try:
        from nypd_arrest_etl_spark.plans.llm_queries import LLM_OPS

        reg.update(LLM_OPS)
    except ImportError:
        pass
    return reg


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _registry().items() if sql is not None}
