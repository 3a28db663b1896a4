from nypd_arrest_etl_spark.sinks.jdbc import (
    build_merge_sql,
    merge_via_jdbc_staging,
    merge_via_staging,
    retry,
    write_jdbc_staging,
)

__all__ = [
    "build_merge_sql",
    "merge_via_jdbc_staging",
    "merge_via_staging",
    "retry",
    "write_jdbc_staging",
]
