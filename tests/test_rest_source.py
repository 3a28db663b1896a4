"""Socrata-style REST DataSource: pagination partitioning, SoQL
predicate pushdown, offline fixture transport.

The fixture manifest maps exact request URLs to canned responses;
requesting any URL absent from the manifest raises. Pushdown tests
exploit that: the manifest for the filtered case ONLY contains the
``$where``-qualified URLs, so if Spark failed to push the predicate,
the source would request an unfiltered URL and the scan would fail.
"""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nypd_arrest_etl_spark.sources.rest import build_url, register_socrata

BASE = "https://example.test/resource/8h9b-rp9u.json"

ROWS = [
    {"arrest_key": f"K{i}", "arrest_date": f"2024-01-{i + 1:02d}", "pd_cd": str(100 + i)}
    for i in range(5)
]


def _manifest(tmp_path, entries):
    d = tmp_path / "fixtures"
    d.mkdir(exist_ok=True)
    (d / "manifest.json").write_text(json.dumps(entries))
    return str(d)


def _page_url(offset, limit, where=None):
    params = {}
    if where:
        params["$where"] = where
    params.update({"$order": ":id", "$limit": limit, "$offset": offset})
    return build_url(BASE, params)


def _count_url(where=None):
    params = {"$select": "count(1)"}
    if where:
        params["$where"] = where
    return build_url(BASE, params)


@pytest.fixture()
def socrata(spark):
    register_socrata(spark)
    return spark


def test_paginated_scan_unions_all_pages(socrata, tmp_path):
    fixtures = _manifest(
        tmp_path,
        {
            _count_url(): [{"count_1": "5"}],
            _page_url(0, 2): ROWS[0:2],
            _page_url(2, 2): ROWS[2:4],
            _page_url(4, 2): ROWS[4:5],
        },
    )
    df = (
        socrata.read.format("socrata")
        .option("url", BASE)
        .option("batchSize", 2)
        .option("fixtureDir", fixtures)
        .load()
    )
    got = df.select("arrest_key", "arrest_date", "pd_cd").collect()
    assert {r["arrest_key"] for r in got} == {f"K{i}" for i in range(5)}
    assert df.rdd.getNumPartitions() == 3  # one per page


def test_predicate_pushdown_reaches_the_api(socrata, tmp_path):
    # Catalyst pushes the implied null guard alongside the comparison
    where = "arrest_date IS NOT NULL AND arrest_date > '2024-01-03'"
    fixtures = _manifest(
        tmp_path,
        {
            # ONLY $where-qualified URLs exist: unpushed scans fail loudly
            _count_url(where): [{"count_1": "2"}],
            _page_url(0, 50000, where): ROWS[3:5],
        },
    )
    df = (
        socrata.read.format("socrata")
        .option("url", BASE)
        .option("pushdown", "true")
        .option("fixtureDir", fixtures)
        .load()
        .filter(F.col("arrest_date") > "2024-01-03")
    )
    assert {r["arrest_key"] for r in df.collect()} == {"K3", "K4"}


def test_like_pushdown(socrata, tmp_path):
    """startswith/endswith/contains compile to SoQL `like` patterns."""
    where = "arrest_key IS NOT NULL AND arrest_key like '%4'"
    fixtures = _manifest(
        tmp_path,
        {
            _count_url(where): [{"count_1": "1"}],
            _page_url(0, 50000, where): ROWS[4:5],
        },
    )
    df = (
        socrata.read.format("socrata")
        .option("url", BASE)
        .option("pushdown", "true")
        .option("fixtureDir", fixtures)
        .load()
        .filter(F.col("arrest_key").endswith("4"))
    )
    assert [r["arrest_key"] for r in df.collect()] == ["K4"]


def test_unsupported_filter_still_correct(socrata, tmp_path):
    """A non-pushable predicate (an expression over the column, which
    never reaches pushFilters as a simple attribute filter) is
    evaluated by Spark after an unfiltered scan — results identical,
    just no source pruning."""
    null_guard = "arrest_key IS NOT NULL"  # Catalyst still pushes this
    fixtures = _manifest(
        tmp_path,
        {
            _count_url(null_guard): [{"count_1": "5"}],
            _page_url(0, 50000, null_guard): ROWS,
        },
    )
    df = (
        socrata.read.format("socrata")
        .option("url", BASE)
        .option("pushdown", "true")
        .option("fixtureDir", fixtures)
        .load()
        .filter(F.substring(F.col("arrest_key"), 2, 1) == "4")
    )
    assert [r["arrest_key"] for r in df.collect()] == ["K4"]


def test_feeds_clean_pipeline(socrata, tmp_path):
    from nypd_arrest_etl_spark.operators.clean import clean

    # clean()'s required-key filters push null guards into the scan;
    # match on URL substrings instead of enumerating the exact $where.
    fixtures = _manifest(
        tmp_path,
        {
            "match:count%281%29": [{"count_1": "1"}],
            "match:%24offset=0": [
                {
                    "arrest_key": "R1",
                    "arrest_date": "2024-02-01",
                    "arrest_boro": "K",
                    "law_cat_cd": "f",
                    "lon_lat": {"type": "Point", "coordinates": [-73.9, 40.8]},
                }
            ],
        },
    )
    raw = (
        socrata.read.format("socrata")
        .option("url", BASE)
        .option("pushdown", "true")
        .option("fixtureDir", fixtures)
        .load()
    )
    row = clean(raw).collect()[0]
    assert row["arrest_boro"] == "BROOKLYN"
    assert row["law_cat_cd"] == "F"
    assert "lon_lat" not in row.asDict()


def test_streaming_reads_pages_as_offsets(socrata, tmp_path):
    """readStream pulls one page per microbatch; offsets land in the
    checkpoint so a restart resumes where the last run stopped —
    the reference's resume-from-offset checkpoint, formalized."""
    fixtures = _manifest(
        tmp_path,
        {
            _page_url(0, 2): ROWS[0:2],
            _page_url(2, 2): ROWS[2:4],
            _page_url(4, 2): ROWS[4:5],
            _page_url(5, 2): [],  # caught up
        },
    )
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            socrata.readStream.format("socrata")
            .option("url", BASE)
            .option("batchSize", 2)
            .option("fixtureDir", fixtures)
            .load()
            .select("arrest_key")
            .writeStream.format("parquet")  # recoverable sink
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q

    drain()
    got = {r["arrest_key"] for r in socrata.read.parquet(out).collect()}
    assert got == {f"K{i}" for i in range(5)}

    # caught-up trigger on the same checkpoint: read() returns an
    # empty result at an UNCHANGED offset — the wrapper validates it
    # by calling next() on it, which crashed (TypeError) when read
    # returned a bare list instead of an iterator
    q2 = drain()
    assert q2.exception() is None
    assert socrata.read.parquet(out).count() == 5, "caught-up drain changed rows"


def test_in_filter_compiles_to_soql():
    """Regression: the `In` dataclass field is `value` (a sequence);
    accessing `.values` raised AttributeError the moment Catalyst
    pushed an IN-list into the source."""
    from pyspark.sql.datasource import In

    from nypd_arrest_etl_spark.sources.rest import _filter_to_soql

    assert _filter_to_soql(In(("law_cat_cd",), ("F", "M"))) == (
        "law_cat_cd in ('F', 'M')"
    )


def test_pushdown_replan_rebuilds_where_from_scratch():
    """r9 (same fix as the pgwire reader): a second pushFilters call on
    one reader instance rebuilds $where from the user predicate + THIS
    call's filters — a cumulative fold would keep the first query's
    clauses ANDed in and silently drop rows."""
    from pyspark.sql.datasource import GreaterThan

    from nypd_arrest_etl_spark.sources.rest import SocrataPushdownReader
    from nypd_arrest_etl_spark.schema import RAW_SCHEMA

    r = SocrataPushdownReader(
        RAW_SCHEMA,
        {"url": "https://example.test/resource/x.json", "where": "a > 1"},
    )
    r.pushFilters([GreaterThan(("arrest_precinct",), 7)])
    first = r.where
    assert "a > 1" in first and "7" in first
    r.pushFilters([GreaterThan(("arrest_precinct",), 3)])
    assert "7" not in r.where and "3" in r.where and "a > 1" in r.where
    r.pushFilters([])
    assert r.where == "a > 1"
