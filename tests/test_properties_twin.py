"""Hypothesis PARITY properties: each row-level transform (T2/T3/T6/
T9/T10 — the ones VERDICT r8 #4 prescribed after the round-8
``non_blank`` find) evaluated against a pandas twin implementing the
reference's observable semantics (transform.py:79-160), fuzzing the
spaces the handcrafted fixtures never reach: unicode, case/whitespace
noise, and epoch boundary values.

Every divergence found while building this suite was either FIXED
(T6: negative / fractional epoch millis now rescued like the
reference's ``float(value)/1000``; '2024-01-05junk' no longer parses
— the old ``substring(1,10)`` accepted it, the reference nulls it)
or is PINNED below as a documented intentional difference with the
reason stated at the assertion site."""

import datetime as dt

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nypd_arrest_etl_spark.functions import (
    dict_map,
    domain_guard,
    non_blank,
    parse_date_with_epoch_fallback,
    scrub_nan_strings,
)
from nypd_arrest_etl_spark.schema import (

    BORO_MAP,
    FILL_DEFAULTS_STR,
    LAW_CAT_VALID,
    PERP_SEX_VALID,
)

# Long-running suite (streaming drains / live servers / storage-format
# e2e / property fuzz / soak): excluded from the default gate run by
# pytest.ini's `-m "not slow"`; run with -m "" or SPARK_GRAFT_FULL_TESTS=1.
pytestmark = pytest.mark.slow


SETTINGS = dict(max_examples=15, deadline=None)

# full unicode minus surrogates (unencodable) — deliberately wider
# than the fixtures' ASCII
unicode_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=10
)
# case/whitespace fuzz around the domain values (VERDICT: T3/T9)
domainish = st.one_of(
    unicode_text,
    st.sampled_from(
        [v.lower() for v in LAW_CAT_VALID]
        + list(LAW_CAT_VALID)
        + list(BORO_MAP)
        + [" f", "f ", "\tV", "m\n", "B ", " K", "ß", "ı", "ﬀ", "None", "nan"]
    ),
)


def _eval(spark, values, expr):
    df = spark.createDataFrame([(v,) for v in values], "c string")
    return [r["out"] for r in df.select(expr.alias("out")).collect()]


# ---------------------------------------------------------------------------
# T2 — 'nan' scrub on unicode (reference: astype(str).replace('nan',''))
# ---------------------------------------------------------------------------


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(), unicode_text), min_size=1, max_size=8))
def test_t2_nan_scrub_twin_on_unicode(spark, values):
    """Twin: pandas renders a missing value as the string 'nan' and
    replaces it with '' (transform.py:84); every OTHER string passes
    through byte-identical. Parity for all strings outside the
    artifact set; the artifact set itself is the PINNED difference:
    the repo nulls {'nan','None',''} uniformly and applies the T8
    default, where raw pandas leaves '' (its later fillna is a no-op
    on a post-astype(str) column) — documented at
    functions/__init__.py::scrub_nan_strings."""
    default = FILL_DEFAULTS_STR["pd_desc"]
    import pyspark.sql.functions as F

    outs = _eval(
        spark, values, F.coalesce(scrub_nan_strings("c"), F.lit(default))
    )
    twin = pd.Series(values, dtype="object").astype(str).replace("nan", "")
    for v, got, ref in zip(values, outs, twin):
        if v is None or v in ("nan", "None", ""):
            assert got == default  # pinned: uniform null-artifact policy
            assert ref in ("", "None")
        else:
            assert got == ref == v, (v, got, ref)


# ---------------------------------------------------------------------------
# T3/T11 — domain guards under case/whitespace/unicode fuzz
# (reference: x.upper() in mapping else 'U' — transform.py:89-91)
# ---------------------------------------------------------------------------


@settings(**SETTINGS)
@given(st.lists(domainish, min_size=1, max_size=10))
def test_t3_law_cat_guard_twin(spark, values):
    outs = _eval(spark, values, domain_guard("c", LAW_CAT_VALID, "U"))
    twin = [
        v.upper() if v.upper() in set(LAW_CAT_VALID) else "U" for v in values
    ]
    assert outs == twin, list(zip(values, outs, twin))


@settings(**SETTINGS)
@given(st.lists(domainish, min_size=1, max_size=10))
def test_t11_perp_sex_guard_twin(spark, values):
    outs = _eval(spark, values, domain_guard("c", PERP_SEX_VALID, "U"))
    twin = [
        v.upper() if v.upper() in set(PERP_SEX_VALID) else "U" for v in values
    ]
    assert outs == twin


# ---------------------------------------------------------------------------
# T9/T10 — borough map then uppercase
# (reference: map(BOROUGH_MAPPING).fillna(original) then .str.upper())
# ---------------------------------------------------------------------------


@settings(**SETTINGS)
@given(st.lists(domainish, min_size=1, max_size=10))
def test_t9_t10_boro_map_then_upper_twin(spark, values):
    import pyspark.sql.functions as F

    outs = _eval(spark, values, F.upper(dict_map("c", BORO_MAP)))
    s = pd.Series(values, dtype="object")
    twin = s.map(BORO_MAP).fillna(s).str.upper()
    assert outs == list(twin), list(zip(values, outs, list(twin)))


# ---------------------------------------------------------------------------
# T5 — required-key blank filter (Python str.strip() semantics; the
# round-8 find, kept as a regression property)
# ---------------------------------------------------------------------------


@settings(**SETTINGS)
@given(
    st.lists(
        st.one_of(
            unicode_text,
            st.text(
                alphabet="\x1c\x1d\x1e\x1f\x85\xa0 \t\n 　a",
                min_size=0,
                max_size=6,
            ),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_t5_non_blank_twin_python_strip(spark, values):
    outs = _eval(spark, values, non_blank("c"))
    twin = [v.strip() != "" for v in values]
    assert outs == twin, list(zip(values, outs, twin))


# ---------------------------------------------------------------------------
# T6 — date parse + epoch-millis rescue at the boundaries
# (reference: to_datetime(errors='coerce'), rescue float(v)/1000)
# ---------------------------------------------------------------------------


def _twin_parse_date(v: str):
    """The reference's observable date semantics (transform.py:106-118
    with the rescue applied to the ORIGINAL value — its own .loc bug
    would apply it to NaT; SURVEY §2c specifies original-value rescue,
    same as the repo's bench twin)."""
    d = pd.to_datetime(v, errors="coerce", format="%Y-%m-%d")
    if not pd.isna(d):
        return d.date()
    d = pd.to_datetime(v, errors="coerce", format="ISO8601")
    if not pd.isna(d):
        return d.date()
    try:
        f = float(v)
    except (TypeError, ValueError):
        return None
    try:
        return pd.to_datetime(f / 1000.0, unit="s", utc=True).date()
    except (ValueError, OverflowError):
        return None


epoch_like = st.one_of(
    # 11+ integer digits, optional sign/fraction: the rescued space.
    # '+'-signed and trailing-dot spellings included — the r9 review
    # caught the regex omitting '+' while the docstring claimed parity
    # with the reference's float(v)/1000
    st.integers(min_value=10_000_000_000, max_value=4_000_000_000_000).map(str),
    st.integers(min_value=10_000_000_000, max_value=4_000_000_000_000).map(
        lambda v: f"+{v}"
    ),
    st.integers(min_value=-4_000_000_000_000, max_value=-10_000_000_000).map(str),
    st.integers(min_value=10_000_000_000, max_value=4_000_000_000_000).map(
        lambda v: f"{v}."
    ),
    st.tuples(
        st.integers(min_value=10_000_000_000, max_value=4_000_000_000_000),
        st.integers(min_value=0, max_value=999),
    ).map(lambda t: f"{t[0]}.{t[1]}"),
)


@settings(**SETTINGS)
@given(st.lists(epoch_like, min_size=1, max_size=8))
def test_t6_epoch_rescue_twin_signed_and_fractional(spark, values):
    """Negative (pre-1970) and fractional epoch millis parse exactly
    like the reference's float(v)/1000 — the round-9 fix (the old
    digits-only regex nulled both)."""
    outs = _eval(spark, values, parse_date_with_epoch_fallback("c"))
    for v, got in zip(values, outs):
        assert got == _twin_parse_date(v), (v, got, _twin_parse_date(v))


@settings(**SETTINGS)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=-9_999_999_999, max_value=9_999_999_999).map(str),
            st.sampled_from(["1e13", "0x10", "inf", "nan", "junk", ""]),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_t6_short_numerics_pinned_not_rescued(spark, values):
    """PINNED intentional difference: numerics under 11 integer digits
    (and non-decimal spellings) are NOT rescued — the reference would
    read '42' as 42 ms and emit 1970-01-01 for every small integer,
    which is a data bug, not a semantic worth matching. The guard is
    the documented epoch-seconds-ambiguity rule."""
    outs = _eval(spark, values, parse_date_with_epoch_fallback("c"))
    assert all(o is None for o in outs), list(zip(values, outs))


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.dates(min_value=dt.date(1700, 1, 1), max_value=dt.date(2200, 12, 31)),
            st.sampled_from(["", "T12:34:56", "T00:00:00.000", " 23:59:59"]),
        ).map(lambda t: t[0].isoformat() + t[1]),
        min_size=1,
        max_size=8,
    )
)
def test_t6_iso_forms_twin(spark, values):
    """ISO dates and ISO timestamps (SoQL's floating-timestamp shape)
    parse to the same date as pandas."""
    outs = _eval(spark, values, parse_date_with_epoch_fallback("c"))
    for v, got in zip(values, outs):
        assert got == _twin_parse_date(v), (v, got)


def test_t6_pinned_divergences_documented(spark):
    """The two pinned T6 differences, asserted exactly so a behavior
    drift reopens the discussion:
    1. trailing junk AFTER a space/T separator is treated as a time
       part and ignored (Spark's cast grammar; SoQL never emits it,
       pandas would null it);
    2. millis beyond pandas' ns range (1677-09-21..2262-04-11) but
       inside Spark's date range still parse — the engine doesn't
       inherit the 64-bit-ns ceiling (beyond Spark's own ~year-9999
       range the rescue nulls instead of raising).
    Junk glued DIRECTLY to the date (no separator) nulls in both
    engines since the r9 fix, as do bare 'yyyy' strings ('1000' must
    not become year 1000)."""
    outs = _eval(
        spark,
        ["2024-01-05 junk", "99999999999999", "2024-01-05junk",
         "1000", "9999999999999999"],
        parse_date_with_epoch_fallback("c"),
    )
    assert outs[0] == dt.date(2024, 1, 5)      # (1) — twin gives None
    assert _twin_parse_date("2024-01-05 junk") is None
    want = dt.datetime.fromtimestamp(
        99_999_999_999_999 / 1000.0, dt.timezone.utc
    ).date()
    assert outs[1] == want                     # (2) — twin overflows to None
    assert _twin_parse_date("99999999999999") is None
    assert outs[2] is None                      # fixed: both engines null
    assert outs[3] is None                      # fixed: bare year nulls
    assert outs[4] is None                      # out of Spark range: null


# ---------------------------------------------------------------------------
# T7 — numeric coercion twin (to_numeric(errors='coerce'))
# ---------------------------------------------------------------------------


@settings(**SETTINGS)
@given(
    st.lists(
        st.one_of(
            unicode_text,
            st.floats(allow_nan=False, allow_infinity=False, width=32).map(str),
            st.integers(min_value=-10**6, max_value=10**6).map(str),
            st.sampled_from(["1e3", " 7 ", "+5", "-0", "0.5e-2", "junk", ""]),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_t7_numeric_coercion_twin(spark, values):
    """try_cast('double') matches pandas to_numeric(errors='coerce')
    on decimal/scientific spellings and garbage alike (both trim
    whitespace, both accept signs/exponents, both null junk). Known
    spelling difference: pandas accepts '0x10' (int literal parser);
    neither appears in the data and the strategy omits hex."""
    import pyspark.sql.functions as F

    outs = _eval(spark, values, F.col("c").try_cast("double"))
    twin = pd.to_numeric(pd.Series(values, dtype="object"), errors="coerce")
    for v, got, ref in zip(values, outs, twin):
        if pd.isna(ref):
            assert got is None, (v, got)
        else:
            assert got == pytest.approx(float(ref), nan_ok=True), (v, got, ref)
