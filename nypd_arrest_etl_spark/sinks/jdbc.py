"""JDBC sink parity (SURVEY.md §2b K2-K5): staging write + set-based
merge into PostgreSQL, for users keeping the reference's target store.

The engine's own storage is partitioned Parquet (operators/merge.py);
this module exists for drop-in parity with the reference's load stage
(/root/reference/scripts/load.py:86-223):

- K2 bulk load  -> ``df.write.jdbc`` with ``batchsize`` (one
  connection per partition writing in parallel — the reference used a
  single serial COPY connection).
- K3 staging DDL -> overwrite-mode staging table per run (not per
  100k-row chunk; one atomic set-based merge replaces the reference's
  per-chunk loop).
- K4 merge      -> the same ``INSERT ... SELECT ... ON CONFLICT DO
  NOTHING`` statement, with the reference's inline CASE domain guards
  (load.py:128-139), executed once on the driver.
- K5 retry      -> exponential-backoff decorator (3 attempts, 4-10 s,
  mirroring the reference's tenacity policy) around the driver-side
  connection; executor-side write retries are Spark task retries.

No JDBC driver jar ships in this test image, so the literal
``df.write.jdbc`` path degrades with a clear error if the driver is
absent — but the staged-merge drive itself runs against a REAL
PostgreSQL server through the stdlib wire client in
:mod:`nypd_arrest_etl_spark.sinks.pgwire` (``merge_via_pgwire``:
per-partition COPY staging + the same merge statement; live
integration in tests/test_pgwire.py), and through DuckDB's SQL engine
as the driverless twin (tests/test_jdbc_sink.py).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame

from nypd_arrest_etl_spark.schema import LAW_CAT_VALID, PERP_SEX_VALID, TARGET_COLUMNS


def retry(attempts: int = 3, base_wait: float = 4.0, max_wait: float = 10.0):
    """Exponential backoff: waits min(base_wait * 2^i, max_wait)."""

    def deco(fn):
        def wrapped(*args, **kwargs):
            last = None
            for i in range(attempts):
                try:
                    return fn(*args, **kwargs)
                except Exception as exc:  # noqa: BLE001 (driver-side net edge)
                    last = exc
                    if i + 1 < attempts:
                        time.sleep(min(base_wait * (2**i), max_wait))
            raise last

        return wrapped

    return deco


def _quoted(vals) -> str:
    return ", ".join(f"'{v}'" for v in vals)


def build_merge_sql(
    target_table: str = "nypd_arrests",
    staging_table: str = "nypd_arrests_staging",
    key: str = "arrest_key",
) -> str:
    """The reference's merge statement (load.py:112-159) with its
    inline domain guards, generated over the 18 target columns."""
    select_cols = []
    for c in TARGET_COLUMNS:
        if c == "law_cat_cd":
            select_cols.append(
                f"CASE WHEN UPPER({c}) IN ({_quoted(LAW_CAT_VALID)}) "
                f"THEN UPPER({c}) ELSE 'U' END AS {c}"
            )
        elif c == "perp_sex":
            select_cols.append(
                f"CASE WHEN UPPER({c}) IN ({_quoted(PERP_SEX_VALID)}) "
                f"THEN UPPER({c}) ELSE 'U' END AS {c}"
            )
        else:
            select_cols.append(c)
    cols = ", ".join(TARGET_COLUMNS)
    sel = ",\n       ".join(select_cols)
    return (
        f"INSERT INTO {target_table} ({cols})\n"
        f"SELECT {sel}\nFROM {staging_table}\n"
        f"ON CONFLICT ({key}) DO NOTHING"
    )


def write_jdbc_staging(
    df: DataFrame,
    url: str,
    staging_table: str = "nypd_arrests_staging",
    batchsize: int = 10_000,
    properties: dict | None = None,
) -> None:
    """K2/K3: overwrite the staging table from executor partitions in
    parallel. ``batchsize`` controls rows per JDBC batch insert."""
    (
        df.write.mode("overwrite")
        .option("batchsize", str(batchsize))
        .option("truncate", "true")
        .jdbc(url, staging_table, properties=properties or {})
    )


def merge_via_staging(
    df: DataFrame,
    stage,
    execute,
    target_table: str = "nypd_arrests",
    staging_table: str = "nypd_arrests_staging",
    key: str = "arrest_key",
) -> int:
    """Engine-agnostic K2+K4 core: ``stage(df, staging_table)``
    materializes the batch into the staging table; ``execute(sql) ->
    rowcount`` runs the merge statement transactionally on the target
    engine. Returns the inserted rowcount (reference metric,
    load.py:151-155). The JDBC/Postgres path and the DuckDB
    integration test (tests/test_jdbc_sink.py) drive the SAME merge
    statement through this seam — only the wire differs."""
    stage(df, staging_table)

    @retry()
    def _merge() -> int:
        return execute(build_merge_sql(target_table, staging_table, key))

    return _merge()


def merge_via_jdbc_staging(
    df: DataFrame,
    url: str,
    target_table: str = "nypd_arrests",
    staging_table: str = "nypd_arrests_staging",
    key: str = "arrest_key",
    properties: dict | None = None,
) -> int:
    """Full K2+K4 path over JDBC: stage the batch, then one driver-side
    merge. Requires a JDBC driver jar on the Spark classpath and a
    reachable server; raises the underlying error otherwise."""

    def _stage(d: DataFrame, table: str) -> None:
        write_jdbc_staging(d, url, table, properties=properties)

    def _execute(sql: str) -> int:
        jvm = df.sparkSession._jvm
        props = jvm.java.util.Properties()
        for k, v in (properties or {}).items():
            props.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(url, props)
        try:
            stmt = conn.createStatement()
            n = stmt.executeUpdate(sql)
            conn.commit()
            return n
        finally:
            conn.close()

    return merge_via_staging(
        df, _stage, _execute, target_table, staging_table, key
    )


_PG_TYPES = {
    "string": "VARCHAR",
    "date": "DATE",
    "int": "INTEGER",
    "double": "FLOAT",
}


def build_target_ddl(target_table: str = "nypd_arrests") -> str:
    """DDL bootstrap twin of the reference's setup_db.py:31-65:
    CREATE TABLE IF NOT EXISTS over the 18-column target schema,
    derived from schema.py's TARGET_SCHEMA (single source of truth —
    the reference redeclares its DDL by hand in two places,
    setup_db.py:33-54 and load.py:53-75)."""
    from nypd_arrest_etl_spark.schema import TARGET_SCHEMA

    cols = []
    for f in TARGET_SCHEMA.fields:
        pg = _PG_TYPES[f.dataType.simpleString()]
        line = f"    {f.name} {pg}"
        if f.name == "arrest_key":
            line += " PRIMARY KEY"
        elif not f.nullable:
            line += " NOT NULL"
        cols.append(line)
    body = ",\n".join(cols)
    return f"CREATE TABLE IF NOT EXISTS {target_table} (\n{body}\n)"
