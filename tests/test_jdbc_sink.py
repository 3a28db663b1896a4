"""JDBC sink parity: merge-SQL generation + retry policy, plus a full
staging -> merge -> rowcount integration drive through DuckDB's SQL
engine (no Postgres server in this image; DuckDB executes the same
DDL and INSERT ... ON CONFLICT DO NOTHING statements transactionally,
so everything except the JDBC wire itself is exercised for real)."""

import pytest

from nypd_arrest_etl_spark.schema import TARGET_COLUMNS
from nypd_arrest_etl_spark.sinks import build_merge_sql, merge_via_staging, retry

# Long-running suite (streaming drains / live servers / storage-format
# e2e / property fuzz / soak): excluded from the default gate run by
# pytest.ini's `-m "not slow"`; run with -m "" or SPARK_GRAFT_FULL_TESTS=1.
pytestmark = pytest.mark.slow



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


def _duckdb_stage_and_execute(con):
    """The two effectful edges of merge_via_staging, wired to DuckDB:
    stage() lands the Spark batch as the staging table (Arrow transfer,
    standing in for the JDBC partition writes); execute() runs the
    merge statement inside an explicit transaction and returns the
    inserted rowcount — the same contract executeUpdate gives."""

    def stage(df, staging_table):
        pdf = df.toPandas()  # noqa: F841 - referenced by duckdb below
        # Postgres applies ON CONFLICT row-by-row, so in-batch duplicate
        # keys collapse first-wins server-side (the reference depends on
        # this, load.py:146). DuckDB's constraint checker instead rejects
        # duplicates WITHIN one INSERT, so the wire stand-in collapses
        # them at stage time — same observable first-wins result.
        con.execute(
            f"CREATE OR REPLACE TABLE {staging_table} AS "
            "SELECT DISTINCT ON (arrest_key) * FROM pdf"
        )

    def execute(sql):
        con.execute("BEGIN")
        try:
            n = con.execute(sql).fetchone()[0]
            con.execute("COMMIT")
        except Exception:
            con.execute("ROLLBACK")
            raise
        return n

    return stage, execute


def test_merge_via_staging_end_to_end_duckdb(spark):
    """Full K2+K3+K4 drive (reference load.py:169-223): DDL bootstrap,
    stage a dirty cleaned batch, run the merge, and assert the inserted
    rowcounts match the engine's own parquet merge path (EtlResult
    parity, load.py:151-155) across initial load, overlapping batch,
    and idempotent re-run — plus the merge-time domain guards."""
    import duckdb

    from nypd_arrest_etl_spark.operators.clean import clean
    from nypd_arrest_etl_spark.operators.merge import merge_into_parquet
    from nypd_arrest_etl_spark.sinks.jdbc import build_target_ddl

    raw1 = spark.createDataFrame(
        [
            ("k1", "2023-01-05", "f", "m"),
            ("k2", "2023-01-06", "NONE", "x"),   # both guards fire -> 'U'
            ("k1", "2023-01-05", "f", "m"),      # in-batch duplicate key
        ],
        "ARREST_KEY string, ARREST_DATE string, LAW_CAT_CD string, PERP_SEX string",
    )
    raw2 = spark.createDataFrame(
        [
            ("k2", "2023-01-06", "v", "f"),      # conflicts with existing key
            ("k3", "2023-01-07", "i", "f"),      # fresh key
        ],
        "ARREST_KEY string, ARREST_DATE string, LAW_CAT_CD string, PERP_SEX string",
    )
    batches = [clean(raw1), clean(raw2), clean(raw2)]  # 3rd = idempotent re-run

    con = duckdb.connect()
    con.execute(build_target_ddl())
    stage, execute = _duckdb_stage_and_execute(con)

    import tempfile

    tgt = tempfile.mkdtemp() + "/tbl"
    duck_counts, parquet_counts = [], []
    for batch in batches:
        duck_counts.append(merge_via_staging(batch, stage, execute))
        parquet_counts.append(merge_into_parquet(spark, batch, tgt, key="arrest_key"))
    assert duck_counts == [2, 1, 0]
    assert duck_counts == parquet_counts  # EtlResult rowcount parity

    rows = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT arrest_key, law_cat_cd, perp_sex FROM nypd_arrests"
        ).fetchall()
    }
    assert set(rows) == {"k1", "k2", "k3"}
    assert rows["k1"] == ("F", "M")
    assert rows["k2"] == ("U", "U")  # guards fired at merge time
    # first-writer-wins: the later ('V','F') k2 batch changed nothing
    assert rows["k3"] == ("I", "F")


def test_merge_via_staging_retries_transient_failure(spark):
    """The retry decorator wraps the merge execution: a transient
    engine failure on the first attempt must not double-insert."""
    import duckdb

    from nypd_arrest_etl_spark.operators.clean import clean
    from nypd_arrest_etl_spark.sinks.jdbc import build_target_ddl

    con = duckdb.connect()
    con.execute(build_target_ddl())
    stage, execute = _duckdb_stage_and_execute(con)
    fails = {"left": 1}

    def flaky_execute(sql):
        if fails["left"]:
            fails["left"] -= 1
            raise ConnectionError("transient")
        return execute(sql)

    batch = clean(
        spark.createDataFrame(
            [("k9", "2023-02-01", "f", "m")],
            "ARREST_KEY string, ARREST_DATE string, LAW_CAT_CD string, PERP_SEX string",
        )
    )
    # retry() waits 4s+ between attempts by default; patch a fast one in
    import nypd_arrest_etl_spark.sinks.jdbc as J

    orig = J.retry
    J.retry = lambda attempts=3, base_wait=0.0, max_wait=0.0: orig(3, 0.0, 0.0)
    try:
        n = merge_via_staging(batch, stage, flaky_execute)
    finally:
        J.retry = orig
    assert n == 1
    assert con.execute("SELECT count(*) FROM nypd_arrests").fetchone()[0] == 1


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
