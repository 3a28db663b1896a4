"""File-source contracts (S3/S4/S5)."""

from nypd_arrest_etl_spark.operators.clean import clean
from nypd_arrest_etl_spark.sources.files import read_csv


def test_csv_partial_columns_bind_by_name(spark, tmp_path):
    """Regression: an explicit CSV schema binds by position — a
    column-subset CSV must still land values in the right columns."""
    p = tmp_path / "arrests.csv"
    p.write_text(
        "arrest_key,arrest_date,law_cat_cd,arrest_boro\nC1,2025-03-01,m,K\n"
    )
    out = clean(read_csv(spark, str(p))).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["law_cat_cd"] == "M"
    assert r["arrest_boro"] == "BROOKLYN"
    assert r["pd_cd"] == "UNKNOWN"


def test_orc_round_trip_preserves_schema_and_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark.sources.files import read_orc, write_orc

    df = spark.createDataFrame(
        [("K1", "2024-01-05", 40.8), ("K2", "2024-01-06", None)],
        "arrest_key string, arrest_date string, latitude double",
    )
    p = str(tmp_path / "orc_t")
    write_orc(df, p)
    back = read_orc(spark, p)
    assert back.schema == df.schema
    assert back.count() == 2
    # predicate pushdown reaches the ORC scan
    plan = back.filter(F.col("arrest_key") == "K1")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "arrest_key" in plan


def test_jsonl_case_folded_duplicate_keys_first_wins(spark, tmp_path):
    """A row carrying BOTH casings of a key must not fail the job and
    must bind the FIRST occurrence (JSON key order) — matching the
    reference's lowercase-column precedence (transform.py:68-76).
    Works on any SparkSession: no mapKeyDedupPolicy conf required."""
    import json

    from nypd_arrest_etl_spark.sources.files import read_jsonl

    p = tmp_path / "dup.jsonl"
    p.write_text(
        json.dumps({"arrest_key": "low", "ARREST_KEY": "UP", "arrest_date": "2024-01-01"}) + "\n"
        + json.dumps({"ARREST_KEY": "only-upper", "arrest_date": "2024-01-02"}) + "\n"
    )
    rows = {r["arrest_date"]: r["arrest_key"] for r in read_jsonl(spark, str(p)).collect()}
    assert rows["2024-01-01"] == "low"
    assert rows["2024-01-02"] == "only-upper"


def test_xml_roundtrip_and_required_columns(spark, tmp_path):
    from nypd_arrest_etl_spark.sources.files import read_xml, write_xml

    src = spark.createDataFrame(
        [("X1", "2024-01-05", "F"), ("X2", "2024-01-06", "M")],
        "arrest_key string, arrest_date string, law_cat_cd string",
    )
    p = str(tmp_path / "arrests_xml")
    write_xml(src, p)
    back = read_xml(spark, p)
    assert {r["arrest_key"] for r in back.collect()} == {"X1", "X2"}
    assert set(("arrest_key", "arrest_date")) <= set(back.columns)


def test_xml_missing_required_column_fails_loudly(spark, tmp_path):
    import pytest

    from nypd_arrest_etl_spark.sources.files import read_xml, write_xml

    src = spark.createDataFrame([("no-key-here",)], "something string")
    p = str(tmp_path / "bad_xml")
    write_xml(src, p)
    with pytest.raises(Exception, match="arrest_key|required"):
        read_xml(spark, p)
