from nypd_arrest_etl_spark.sinks.jdbc import (
    build_merge_sql,
    merge_via_jdbc_staging,
    merge_via_staging,
    retry,
    write_jdbc_staging,
)
from nypd_arrest_etl_spark.sinks.pgwire import (
    PgWireClient,
    merge_via_pgwire,
    read_postgres,
    stage_dataframe,
)

__all__ = [
    "build_merge_sql",
    "merge_via_jdbc_staging",
    "merge_via_staging",
    "merge_via_pgwire",
    "retry",
    "write_jdbc_staging",
    "PgWireClient",
    "read_postgres",
    "stage_dataframe",
]
