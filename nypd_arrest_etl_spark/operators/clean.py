"""The cleaning pipeline: reference transforms T1-T12 as one lazy
column-expression chain (SURVEY.md §2c; /root/reference/scripts/
transform.py:48-172 and load.py:112-159 are the behavioral spec).

Everything here is narrow (no shuffle): at 100 TB this stage is a
single map over input partitions fused by whole-stage codegen, and
Catalyst pushes the required-key filter (T5) into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nypd_arrest_etl_spark import schema as S
from nypd_arrest_etl_spark.functions import (
    dict_map,
    domain_guard,
    non_blank,
    parse_date_with_epoch_fallback,
    scrub_nan_strings,
)


def normalize_columns(df: DataFrame) -> DataFrame:
    """T1: lowercase headers; synthesize missing expected columns as null.

    (Reference synthesizes '' — transform.py:68-76; we keep null and
    apply the same observable default at fill time.) T4: drop the
    nested ``lon_lat`` extra (transform.py:95-97) and anything else
    outside the expected set (load.py:182-192 reindex semantics).
    """
    lower = {c.lower(): c for c in df.columns}
    cols = []
    for name in S.TARGET_COLUMNS:
        if name in lower:
            cols.append(F.col(f"`{lower[name]}`").alias(name))
        else:
            cols.append(F.lit(None).cast("string").alias(name))
    return df.select(*cols)


def clean(df: DataFrame) -> DataFrame:
    """Full T1-T12 pipeline: raw (all-string, dirty) -> target schema.

    Observable semantics match the reference end-to-end:
    - required-key filter drops null/blank arrest_key/arrest_date (T5)
    - date parse with epoch-millis rescue; unparseable dates dropped
      (reference: NaT -> dropna on arrest_date, transform.py:106-118)
    - numeric coercion with null-on-garbage (T7)
    - per-column defaults (T8), borough map then UPPER (T9/T10 order!)
    - domain guards for law_cat_cd / perp_sex (T3 + T11)
    """
    df = normalize_columns(df)

    # T2: scrub stringified-nan artifacts to proper nulls.
    str_cols = [c for c in S.TARGET_COLUMNS if c not in ("latitude", "longitude", "arrest_precinct", "arrest_date")]
    df = df.withColumns({c: scrub_nan_strings(c) for c in str_cols})

    # T5: required-key filter (pushed into scan by Catalyst).
    df = df.filter(non_blank("arrest_key") & non_blank("arrest_date"))

    # T6: date parse w/ epoch-millis fallback; unparseable -> dropped.
    df = df.withColumn("arrest_date", parse_date_with_epoch_fallback("arrest_date"))
    df = df.filter(F.col("arrest_date").isNotNull())

    # T7: numeric coercion — try_cast nulls garbage (ANSI-safe),
    # matching pandas to_numeric(errors='coerce').
    df = df.withColumns(
        {
            "arrest_precinct": F.col("arrest_precinct").try_cast("double").try_cast("int"),
            "latitude": F.col("latitude").try_cast("double"),
            "longitude": F.col("longitude").try_cast("double"),
        }
    )

    # T3: law_cat_cd domain guard ('' / NONE / unknown -> 'U').
    df = df.withColumn(
        "law_cat_cd", domain_guard("law_cat_cd", S.LAW_CAT_VALID, "U")
    )
    # T11 (merge-time guard in the reference): perp_sex domain.
    df = df.withColumn("perp_sex", domain_guard("perp_sex", S.PERP_SEX_VALID, "U"))

    # T8: null-fill defaults (single dict, mirrors transform.py:129-146).
    df = df.fillna(S.FILL_DEFAULTS_STR).fillna(S.FILL_DEFAULTS_NUM)

    # T9 then T10: borough map THEN uppercase (order is observable:
    # 'B' -> 'Bronx' -> 'BRONX'; unmapped values pass through).
    df = df.withColumn("arrest_boro", dict_map("arrest_boro", S.BORO_MAP))
    df = df.withColumns({c: F.upper(F.col(c)) for c in S.UPPER_COLUMNS})

    # T12: project to target order.
    return df.select(*S.TARGET_COLUMNS)
