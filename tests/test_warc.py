"""WARC ingestion source (sources/warc.py): pure-Python record layer
round-trips, malformed-input tolerance, and the registered DataSource
read path (partition-per-file, mixed record types, HTTP envelope
parsing)."""

import gzip
import io
import os

import pytest

from nypd_arrest_etl_spark.sources.warc import (
    iter_warc_records,
    parse_http_response,
    register_warc,
    write_warc,
)

RECS = [
    {"warc_type": "warcinfo", "body": b"software: test\r\n"},
    {
        "url": "http://ex.com/1",
        "date": "2020-01-01T00:00:01Z",
        "body": "héllo".encode(),
        "http_headers": [("Content-Type", "text/html"), ("X-Doc", "1")],
    },
    {"url": "http://ex.com/2", "date": "2020-01-01T00:00:02Z",
     "warc_type": "request"},
    {"url": "http://ex.com/2", "date": "2020-01-01T00:00:02Z",
     "body": b"second", "http_status": 404},
]


def test_roundtrip_gzip_multimember(tmp_path):
    p = str(tmp_path / "a.warc.gz")
    assert write_warc(p, RECS) == 4
    # spec annex layout: one gzip member per record
    raw = open(p, "rb").read()
    assert raw.count(b"\x1f\x8b\x08") >= 4
    with gzip.open(p, "rb") as fh:
        got = list(iter_warc_records(fh))
    assert [r["warc-type"] for r in got] == [
        "warcinfo", "response", "request", "response"]
    assert got[1]["warc-target-uri"] == "http://ex.com/1"
    status, headers, body = parse_http_response(got[1]["body"])
    assert (status, body) == (200, "héllo".encode())
    assert headers["x-doc"] == "1"


def test_roundtrip_plain_warc(tmp_path):
    p = str(tmp_path / "a.warc")
    write_warc(p, RECS)
    with open(p, "rb") as fh:
        assert len(list(iter_warc_records(fh))) == 4


def test_truncated_tail_ends_iteration(tmp_path):
    p = str(tmp_path / "a.warc")
    write_warc(p, RECS)
    raw = open(p, "rb").read()
    # cut mid-way through the LAST record's block
    cut = raw[: raw.rindex(b"second") + 3]
    got = list(iter_warc_records(io.BytesIO(cut)))
    assert len(got) == 3  # the truncated record is dropped, not raised


def test_lost_sync_stops_cleanly():
    junk = b"this is not warc\r\nWARC/1.1\r\n"
    assert list(iter_warc_records(io.BytesIO(junk))) == []


def test_parse_http_response_edge_cases():
    # non-HTTP block passes through
    s, h, b = parse_http_response(b"plain bytes")
    assert (s, h, b) == (None, {}, b"plain bytes")
    # duplicate header: first value wins
    blk = b"HTTP/1.1 301 Moved\r\nLocation: /a\r\nLocation: /b\r\n\r\nx"
    s, h, b = parse_http_response(blk)
    assert (s, h["location"], b) == (301, "/a", b"x")
    # garbled status line
    s, _, _ = parse_http_response(b"HTTP/1.1 nope\r\n\r\n")
    assert s is None


def test_datasource_reads_mixed_records(spark, tmp_path):
    p = str(tmp_path / "a.warc.gz")
    write_warc(p, RECS)
    register_warc(spark)
    df = spark.read.format("warc").option("path", str(tmp_path)).load()
    rows = {(r.warc_type, r.url): r for r in df.collect()}
    resp = rows[("response", "http://ex.com/1")]
    assert resp.http_status == 200
    assert resp.http_content_type == "text/html"
    assert resp.http_headers["x-doc"] == "1"
    assert bytes(resp.body) == "héllo".encode()
    assert str(resp.fetch_ts).startswith("2020-01-01 00:00:01")
    req = rows[("request", "http://ex.com/2")]
    assert req.http_status is None and req.http_headers == {}
    info = rows[("warcinfo", None)]
    assert bytes(info.body) == b"software: test\r\n"
    assert resp.file == "a.warc.gz"


def test_datasource_partition_per_file(spark, tmp_path):
    for i in range(3):
        write_warc(str(tmp_path / f"p{i}.warc.gz"),
                   [{"url": f"http://ex.com/{i}", "body": b"x"}])
    register_warc(spark)
    df = spark.read.format("warc").option("path", str(tmp_path)).load()
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 3
    # deterministic file->partition assignment (sorted paths)
    files = [r.file for r in df.select("file").distinct().collect()]
    assert sorted(files) == ["p0.warc.gz", "p1.warc.gz", "p2.warc.gz"]


def test_datasource_types_option_filters_at_decode(spark, tmp_path):
    p = str(tmp_path / "a.warc.gz")
    write_warc(p, RECS)
    register_warc(spark)
    df = (
        spark.read.format("warc")
        .option("path", str(tmp_path))
        .option("types", "response")
        .load()
    )
    got = df.collect()
    assert len(got) == 2
    assert {r.warc_type for r in got} == {"response"}
    both = (
        spark.read.format("warc")
        .option("path", str(tmp_path))
        .option("types", "response, warcinfo")
        .load()
    )
    assert both.count() == 3


def test_datasource_missing_path_raises(spark, tmp_path):
    register_warc(spark)
    df = spark.read.format("warc").option(
        "path", str(tmp_path / "nothing")).load()
    with pytest.raises(Exception, match="matched no files"):
        df.count()


def test_fixture_builder_marker_skips_regen(spark, tmp_path):
    from nypd_arrest_etl_spark.sources.warc import build_warc_fixture

    out = str(tmp_path / "cap")
    build_warc_fixture(spark, "/root/testdata/sf0.001", out, n_files=2)
    first = {f: os.path.getmtime(os.path.join(out, f))
             for f in os.listdir(out) if f.endswith(".gz")}
    assert first, "fixture wrote no files"
    build_warc_fixture(spark, "/root/testdata/sf0.001", out, n_files=2)
    second = {f: os.path.getmtime(os.path.join(out, f))
              for f in os.listdir(out) if f.endswith(".gz")}
    assert first == second  # _done marker short-circuited the rewrite
