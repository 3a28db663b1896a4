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


# ---------------------------------------------------------------------------
# HTTP body transfer/content decoding (round 12): chunked framing and
# gzip/deflate payloads are what real CommonCrawl `response` records
# carry; raw framing or compressed bytes must never reach the
# text/quality/dedup chain undetected.
# ---------------------------------------------------------------------------

from nypd_arrest_etl_spark.sources.warc import decode_http_body  # noqa: E402


def test_decode_chunked_with_extensions_and_trailers():
    body = (
        b"4;ext=1\r\nWiki\r\n"
        b"5\r\npedia\r\n"
        b"E\r\n in\r\n\r\nchunks.\r\n"
        b"0\r\nTrailer: ignored\r\n\r\n"
    )
    payload, ok = decode_http_body(
        body, {"transfer-encoding": "chunked"}
    )
    assert (payload, ok) == (b"Wikipedia in\r\n\r\nchunks.", True)


def test_decode_chunked_truncated_mid_chunk_keeps_prefix():
    body = b"4\r\nWiki\r\n20\r\npedia"  # second chunk cut short
    payload, ok = decode_http_body(body, {"transfer-encoding": "chunked"})
    assert ok is False
    assert payload == b"Wikipedia"  # clean chunks + partial tail kept


def test_decode_chunked_lost_sync_flags_false():
    body = b"4\r\nWiki\r\nNOTHEX\r\nx"
    payload, ok = decode_http_body(body, {"transfer-encoding": "chunked"})
    assert (payload, ok) == (b"Wiki", False)


def test_decode_gzip_roundtrip_and_multimember():
    one = gzip.compress(b"hello ") + gzip.compress(b"world")
    payload, ok = decode_http_body(one, {"content-encoding": "gzip"})
    assert (payload, ok) == (b"hello world", True)
    # x-gzip alias
    payload, ok = decode_http_body(
        gzip.compress(b"alias"), {"content-encoding": "x-gzip"}
    )
    assert (payload, ok) == (b"alias", True)


def test_decode_gzip_truncated_keeps_partial():
    import hashlib

    # incompressible payload so a truncated member still yields a
    # non-empty decodable prefix (stored deflate blocks)
    body = b"".join(
        hashlib.sha256(bytes([i])).digest() for i in range(200)
    )
    full = gzip.compress(body, 6)
    payload, ok = decode_http_body(
        full[: len(full) // 2], {"content-encoding": "gzip"}
    )
    assert ok is False
    assert payload and body.startswith(payload)
    # pure garbage: nothing decoded, still flagged, never raises
    payload, ok = decode_http_body(b"\xff\xfe\x00", {"content-encoding": "gzip"})
    assert (payload, ok) == (b"", False)


def test_decode_deflate_zlib_wrapped_and_raw():
    import zlib

    payload, ok = decode_http_body(
        zlib.compress(b"wrapped"), {"content-encoding": "deflate"}
    )
    assert (payload, ok) == (b"wrapped", True)
    raw = zlib.compressobj(wbits=-15)
    data = raw.compress(b"rawdeflate") + raw.flush()
    payload, ok = decode_http_body(data, {"content-encoding": "deflate"})
    assert (payload, ok) == (b"rawdeflate", True)


def test_decode_unknown_coding_keeps_bytes_flags_false():
    payload, ok = decode_http_body(b"brbytes", {"content-encoding": "br"})
    assert (payload, ok) == (b"brbytes", False)
    # identity is a no-op, not unknown
    payload, ok = decode_http_body(b"x", {"transfer-encoding": "identity"})
    assert (payload, ok) == (b"x", True)


def test_decode_chunked_around_gzip():
    import io as _io

    inner = gzip.compress("déjà vu".encode())
    framed = b"".join(
        b"%x\r\n%s\r\n" % (len(c), c)
        for c in (inner[:7], inner[7:])
    ) + b"0\r\n\r\n"
    payload, ok = decode_http_body(
        framed,
        {"transfer-encoding": "chunked", "content-encoding": "gzip"},
    )
    assert (payload, ok) == ("déjà vu".encode(), True)
    del _io


def test_datasource_decodes_all_body_shapes(spark, tmp_path):
    recs = [
        {"url": "http://ex.com/plain", "body": b"plain body"},
        {"url": "http://ex.com/gz", "body": b"gzipped body",
         "gzip_content": True},
        {"url": "http://ex.com/ch", "body": b"chunked body" * 200,
         "chunked": True},
        {"url": "http://ex.com/chgz", "body": "chunked+gzip ünïcode".encode(),
         "chunked": True, "gzip_content": True},
    ]
    p = str(tmp_path / "enc.warc.gz")
    write_warc(p, recs)
    # the on-disk HTTP payloads are genuinely encoded, not pass-through
    with gzip.open(p, "rb") as fh:
        raw = {r["warc-target-uri"]: r["body"] for r in iter_warc_records(fh)}
    assert b"Content-Encoding: gzip" in raw["http://ex.com/gz"]
    assert b"Transfer-Encoding: chunked" in raw["http://ex.com/ch"]
    assert b"Content-Length" not in raw["http://ex.com/ch"]
    register_warc(spark)
    df = spark.read.format("warc").option("path", p).load()
    rows = {r.url: r for r in df.collect()}
    assert bytes(rows["http://ex.com/plain"].body) == b"plain body"
    assert bytes(rows["http://ex.com/gz"].body) == b"gzipped body"
    assert bytes(rows["http://ex.com/ch"].body) == b"chunked body" * 200
    assert bytes(rows["http://ex.com/chgz"].body) == (
        "chunked+gzip ünïcode".encode()
    )
    assert all(r.body_decoded for r in rows.values())
    assert rows["http://ex.com/gz"].http_headers["content-encoding"] == "gzip"
    assert (
        rows["http://ex.com/ch"].http_headers["transfer-encoding"] == "chunked"
    )


def test_datasource_flags_undecodable_body(spark, tmp_path):
    # hand-build a response whose declared gzip body is garbage
    block = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Content-Length: 9\r\n\r\nnot gzip!"
    )
    raw = (
        b"WARC/1.1\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:x>\r\n"
        b"WARC-Target-URI: http://ex.com/bad\r\n"
        b"WARC-Date: 2020-01-01T00:00:00Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: %d\r\n\r\n" % len(block)
    ) + block + b"\r\n\r\n"
    p = tmp_path / "bad.warc"
    p.write_bytes(raw)
    register_warc(spark)
    row = (
        spark.read.format("warc").option("path", str(p)).load().collect()[0]
    )
    assert row.body_decoded is False
    assert row.http_status == 200


def test_fixture_marker_invalidates_on_content_fingerprint(spark, tmp_path):
    from nypd_arrest_etl_spark.sources.warc import build_warc_fixture

    out = str(tmp_path / "cap")
    build_warc_fixture(spark, "/root/testdata/sf0.001", out, n_files=2)
    marker = os.path.join(out, "_done")
    stamp = open(marker).read().strip()
    assert stamp.startswith("v2:") and len(stamp.split(":")) == 4
    first = {f: os.path.getmtime(os.path.join(out, f))
             for f in os.listdir(out) if f.endswith(".gz")}
    # same (rows, files) but a different content fingerprint must
    # force regeneration — the r11 marker reused stale captures here
    parts = stamp.split(":")
    parts[3] = "999"
    with open(marker, "w") as f:
        f.write(":".join(parts))
    import time as _t

    _t.sleep(0.05)
    build_warc_fixture(spark, "/root/testdata/sf0.001", out, n_files=2)
    second = {f: os.path.getmtime(os.path.join(out, f))
              for f in os.listdir(out) if f.endswith(".gz")}
    assert any(second[f] != first.get(f) for f in second)
    assert open(marker).read().strip() == stamp  # true fingerprint restored
