"""Schemas for the NYPD arrests pipeline.

Target schema mirrors the reference DDL
(/root/reference/scripts/setup_db.py:33-54): 18 columns, string-heavy,
with ``arrest_key`` unique and ``arrest_date`` non-null. The raw
(in-flight) schema is permissive all-strings — the reference infers it
from whatever JSON the Socrata API returns
(/root/reference/scripts/extract.py:115-116) with only ``arrest_key``
and ``arrest_date`` required (extract.py:118-122).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Columns in target order (load.py:182-192 reindexes to exactly these).
TARGET_COLUMNS = [
    "arrest_key",
    "arrest_date",
    "pd_cd",
    "pd_desc",
    "ky_cd",
    "ofns_desc",
    "law_code",
    "law_cat_cd",
    "arrest_boro",
    "arrest_precinct",
    "jurisdiction_code",
    "age_group",
    "perp_sex",
    "perp_race",
    "x_coord_cd",
    "y_coord_cd",
    "latitude",
    "longitude",
]

TARGET_SCHEMA = T.StructType(
    [
        T.StructField("arrest_key", T.StringType(), nullable=False),
        T.StructField("arrest_date", T.DateType(), nullable=False),
        T.StructField("pd_cd", T.StringType()),
        T.StructField("pd_desc", T.StringType()),
        T.StructField("ky_cd", T.StringType()),
        T.StructField("ofns_desc", T.StringType()),
        T.StructField("law_code", T.StringType()),
        T.StructField("law_cat_cd", T.StringType()),  # domain {F,M,V,I,U}
        T.StructField("arrest_boro", T.StringType()),
        T.StructField("arrest_precinct", T.IntegerType()),
        T.StructField("jurisdiction_code", T.StringType()),
        T.StructField("age_group", T.StringType()),
        T.StructField("perp_sex", T.StringType()),  # domain {M,F,U}
        T.StructField("perp_race", T.StringType()),
        T.StructField("x_coord_cd", T.StringType()),
        T.StructField("y_coord_cd", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
    ]
)

# Raw scan schema: everything as nullable string (dates may arrive as
# ISO strings or epoch-millis; lat/lon may carry garbage). The one
# nested source column (`lon_lat`, a Socrata geo-point) is read as a
# string and dropped by the clean stage (transform.py:95-97).
RAW_COLUMNS = TARGET_COLUMNS + ["lon_lat"]

RAW_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), nullable=True) for c in RAW_COLUMNS]
)

# Required on every scanned batch (extract.py:118-122, import_csv.py:37-41).
REQUIRED_COLUMNS = ("arrest_key", "arrest_date")

# Per-column null-fill defaults (transform.py:129-146).
FILL_DEFAULTS_STR = {
    "pd_cd": "UNKNOWN",
    "pd_desc": "UNKNOWN",
    "ky_cd": "UNKNOWN",
    "ofns_desc": "UNKNOWN",
    "law_code": "UNKNOWN",
    "law_cat_cd": "U",
    "arrest_boro": "Unknown",
    "jurisdiction_code": "UNKNOWN",
    "age_group": "UNKNOWN",
    "perp_sex": "U",
    "perp_race": "UNKNOWN",
    "x_coord_cd": "UNKNOWN",
    "y_coord_cd": "UNKNOWN",
}
FILL_DEFAULTS_NUM = {"arrest_precinct": -1, "latitude": 0.0, "longitude": 0.0}

# Borough code -> full name (transform.py:20-26); unmapped pass through.
BORO_MAP = {
    "B": "Bronx",
    "K": "Brooklyn",
    "M": "Manhattan",
    "Q": "Queens",
    "S": "Staten Island",
}

# law_cat_cd valid domain (transform.py:27-35, load.py:128-131).
LAW_CAT_VALID = ("F", "M", "V", "I")
# perp_sex valid domain (load.py:136-139).
PERP_SEX_VALID = ("M", "F")

# Columns uppercased by the clean stage (transform.py:152-159) — note
# this runs AFTER borough mapping, so boroughs land as 'BRONX' etc.
UPPER_COLUMNS = [
    "pd_desc",
    "ofns_desc",
    "law_code",
    "law_cat_cd",
    "arrest_boro",
    "age_group",
    "perp_sex",
    "perp_race",
    "pd_cd",
    "ky_cd",
    "jurisdiction_code",
]
