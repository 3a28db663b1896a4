"""Golden tests for the T1-T12 clean pipeline against the observable
semantics of the reference transform stage (FIXTURES.md F1/F2)."""

import json

import pytest

from nypd_arrest_etl_spark.operators.clean import clean
from nypd_arrest_etl_spark.schema import RAW_SCHEMA, TARGET_COLUMNS
from nypd_arrest_etl_spark.sources.files import MissingRequiredColumns, read_jsonl

DIRTY_ROWS = [
    # clean row, borough code, lowercase law_cat
    {
        "arrest_key": "K1",
        "arrest_date": "2025-06-01",
        "pd_cd": "101",
        "pd_desc": "assault 3",
        "ky_cd": "344",
        "ofns_desc": "Assault",
        "law_code": "PL 1200001",
        "law_cat_cd": "f",
        "arrest_boro": "B",
        "arrest_precinct": "40",
        "jurisdiction_code": "0",
        "age_group": "25-44",
        "perp_sex": "m",
        "perp_race": "Black",
        "x_coord_cd": "1006543",
        "y_coord_cd": "234567",
        "latitude": "40.81",
        "longitude": "-73.92",
    },
    # ISO timestamp date, unmapped borough, invalid law_cat -> U
    {
        "arrest_key": "K2",
        "arrest_date": "2025-06-02T00:00:00.000",
        "law_cat_cd": "9",
        "arrest_boro": "X",
        "perp_sex": "Z",
        "latitude": "garbage",
        "arrest_precinct": "abc",
    },
    # epoch-millis date rescue (2025-06-01T00:00:00Z = 1748736000000)
    {"arrest_key": "K3", "arrest_date": "1748736000000", "law_cat_cd": "NONE"},
    # null key -> dropped
    {"arrest_key": None, "arrest_date": "2025-06-01"},
    # whitespace-only key -> dropped
    {"arrest_key": "   ", "arrest_date": "2025-06-01"},
    # unparseable date -> dropped
    {"arrest_key": "K4", "arrest_date": "not-a-date"},
    # extra lon_lat column must be dropped; 'nan' artifact scrubbed
    {
        "arrest_key": "K5",
        "arrest_date": "2025-06-03",
        "pd_desc": "nan",
        "lon_lat": "POINT (-73.9 40.8)",
        "arrest_boro": "Q",
    },
]


@pytest.fixture(scope="module")
def dirty_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("raw") / "raw.jsonl"
    with open(p, "w") as f:
        for row in DIRTY_ROWS:
            f.write(json.dumps(row) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def cleaned(spark, dirty_path):
    df = clean(read_jsonl(spark, dirty_path))
    rows = {r["arrest_key"]: r.asDict() for r in df.collect()}
    return df, rows


def test_schema_and_order(cleaned):
    df, _ = cleaned
    assert df.columns == TARGET_COLUMNS


def test_required_key_filter(cleaned):
    _, rows = cleaned
    # null key, blank key, unparseable-date rows are gone
    assert set(rows) == {"K1", "K2", "K3", "K5"}


def test_clean_row_end_to_end(cleaned):
    _, rows = cleaned
    r = rows["K1"]
    assert str(r["arrest_date"]) == "2025-06-01"
    assert r["law_cat_cd"] == "F"  # lowercase f -> F
    assert r["arrest_boro"] == "BRONX"  # B -> Bronx -> BRONX (map then upper)
    assert r["perp_sex"] == "M"
    assert r["arrest_precinct"] == 40
    assert r["latitude"] == pytest.approx(40.81)
    assert r["pd_desc"] == "ASSAULT 3"


def test_domain_guards_and_defaults(cleaned):
    _, rows = cleaned
    r = rows["K2"]
    assert str(r["arrest_date"]) == "2025-06-02"  # ISO timestamp prefix
    assert r["law_cat_cd"] == "U"  # invalid '9' -> U
    assert r["perp_sex"] == "U"  # invalid 'Z' -> U
    assert r["arrest_boro"] == "X"  # unmapped passthrough, uppercased
    assert r["latitude"] == 0.0  # garbage -> null -> 0.0 default
    assert r["arrest_precinct"] == -1  # garbage -> null -> -1 default
    assert r["pd_cd"] == "UNKNOWN"  # missing -> UNKNOWN


def test_epoch_millis_rescue(cleaned):
    _, rows = cleaned
    r = rows["K3"]
    assert str(r["arrest_date"]) == "2025-06-01"
    assert r["law_cat_cd"] == "U"  # 'NONE' -> U


def test_nan_scrub_and_lon_lat_drop(cleaned):
    df, rows = cleaned
    assert "lon_lat" not in df.columns
    assert rows["K5"]["pd_desc"] == "UNKNOWN"  # 'nan' -> null -> default
    assert rows["K5"]["arrest_boro"] == "QUEENS"


def test_uppercase_headers_renamed(spark, tmp_path):
    p = tmp_path / "upper.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"ARREST_KEY": "U1", "ARREST_DATE": "2025-01-05"}) + "\n")
    df = spark.read.json(str(p))  # inferred schema with UPPER headers
    out = clean(df).collect()
    assert len(out) == 1 and out[0]["arrest_key"] == "U1"


def test_missing_required_column_raises(spark, tmp_path):
    import pyspark.sql.types as T

    p = tmp_path / "bad.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"arrest_key": "X"}) + "\n")
    schema = T.StructType([T.StructField("arrest_key", T.StringType())])
    with pytest.raises(MissingRequiredColumns):
        read_jsonl(spark, str(p), schema=schema)


def test_blank_key_filter_matches_python_strip_semantics(spark):
    """The reference filters blanks with pandas .str.strip()
    (transform.py:100-104), which treats \\x1c-\\x1f, NEL, and NBSP as
    whitespace; Spark's trim() strips only ' '. Keys that Python-strip
    to empty must be dropped (hypothesis found '\\x1f' surviving in
    round 8); keys with any real character survive."""
    from nypd_arrest_etl_spark.operators.clean import clean

    rows = [
        ("\x1f", "2024-01-05"),        # information separator: blank
        ("\xa0\t \x85", "2024-01-05"),  # NBSP/tab/NEL mix: blank
        (" k1 ", "2024-01-05"),         # real key survives
        ("\x1fk2", "2024-01-05"),       # control char + content survives
    ]
    df = spark.createDataFrame(rows, "ARREST_KEY string, ARREST_DATE string")
    keys = {r["arrest_key"] for r in clean(df).collect()}
    assert keys == {" k1 ", "\x1fk2"}
