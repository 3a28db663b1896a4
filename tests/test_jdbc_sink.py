"""JDBC sink parity: merge-SQL generation + retry policy (no Postgres
server in this image, so execution paths are not integration-tested)."""

import pytest

from nypd_arrest_etl_spark.schema import TARGET_COLUMNS
from nypd_arrest_etl_spark.sinks import build_merge_sql, retry


def test_merge_sql_shape():
    sql = build_merge_sql()
    assert sql.startswith("INSERT INTO nypd_arrests (arrest_key, arrest_date")
    assert "ON CONFLICT (arrest_key) DO NOTHING" in sql
    # the reference's inline domain guards (load.py:128-139)
    assert "CASE WHEN UPPER(law_cat_cd) IN ('F', 'M', 'V', 'I')" in sql
    assert "CASE WHEN UPPER(perp_sex) IN ('M', 'F')" in sql
    # all 18 columns, in target order
    for c in TARGET_COLUMNS:
        assert c in sql


def test_merge_sql_custom_tables():
    sql = build_merge_sql("tgt", "stg", key="arrest_key")
    assert "INSERT INTO tgt" in sql and "FROM stg" in sql


def test_retry_recovers_then_raises():
    calls = {"n": 0}

    @retry(attempts=3, base_wait=0.0, max_wait=0.0)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 3

    @retry(attempts=2, base_wait=0.0, max_wait=0.0)
    def always_down():
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        always_down()


def test_target_ddl_covers_all_18_columns():
    from nypd_arrest_etl_spark.schema import TARGET_SCHEMA
    from nypd_arrest_etl_spark.sinks.jdbc import build_target_ddl

    ddl = build_target_ddl()
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS nypd_arrests")
    for f in TARGET_SCHEMA.fields:
        assert f.name in ddl
    assert "arrest_key VARCHAR PRIMARY KEY" in ddl
    assert "arrest_date DATE NOT NULL" in ddl
    assert "arrest_precinct INTEGER" in ddl and "latitude FLOAT" in ddl
    # DuckDB accepts the same ANSI DDL — executable guarantee
    import duckdb

    con = duckdb.connect()
    con.sql(ddl)
    cols = {r[0] for r in con.execute("DESCRIBE nypd_arrests").fetchall()}
    assert cols == {f.name for f in TARGET_SCHEMA.fields}
