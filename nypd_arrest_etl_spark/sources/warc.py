"""WARC (ISO 28500 / WARC/1.1) ingestion source — the missing first
link of the crawl chain (robots -> quota -> quality -> dedup ->
curate): a registered Python DataSource that reads raw web-capture
files the way a 100 TB CommonCrawl-style pipeline receives them.

Format notes (all public spec, iipc.github.io/warc-specifications):

- a WARC file is a sequence of records; each record is a version line
  (``WARC/1.0`` or ``WARC/1.1``), CRLF-separated named headers, a
  blank line, ``Content-Length`` octets of block, and a CRLF CRLF
  trailer;
- ``.warc.gz`` files compress EACH RECORD as its own gzip member
  (spec annex recommendation) so readers can resynchronize;
  Python's ``gzip`` handles concatenated members natively, so one
  sequential stream decode per file needs no index;
- ``response`` records carry an HTTP/1.1 message as their block:
  status line, headers, blank line, body.

Scale design: ONE input partition per WARC file — the CommonCrawl
layout (thousands of ~1 GB .warc.gz segment files) makes the file the
natural task granularity, the same partition-per-file planning the
manifest table's batch reader uses (table_stream.py). Each task
streams its file with O(record) memory (never whole-file buffering)
and yields Arrow record batches, so rows enter the JVM through the
Arrow path rather than pickled one at a time. Gzip decode is
sequential by nature, which is exactly why the parallel unit is the
file, not the byte range: a 1000-executor cluster reading 100 TB gets
~100k files = ~100k independent tasks.

Reference anchor: the reference's ingest layer reads an already-clean
JSON API (scripts/extract.py:56-72); this source extends the same
layer to raw capture, which that pipeline never sees.
"""

from __future__ import annotations

import glob as _glob
import gzip
import hashlib
import io
import os
from datetime import datetime, timezone

__all__ = [
    "WARC_SCHEMA_DDL",
    "WarcDataSource",
    "iter_warc_records",
    "parse_http_response",
    "register_warc",
    "write_warc",
]

_CRLF = b"\r\n"

# Output schema of the `warc` DataSource (one row per WARC record).
WARC_SCHEMA_DDL = (
    "file string, record_id string, warc_type string, url string, "
    "fetch_ts timestamp, content_type string, http_status int, "
    "http_content_type string, http_headers map<string,string>, "
    "body binary"
)


# ---------------------------------------------------------------------------
# Pure-Python record layer (no Spark): writer + streaming parser.
# Unit-testable without a session; the DataSource and the test
# fixtures are both built on these.
# ---------------------------------------------------------------------------


def _record_id(url: str, date: str, seq: int) -> str:
    """Deterministic urn:uuid-shaped id (spec wants a globally unique
    URI; hashing the identity fields keeps fixtures replayable)."""
    h = hashlib.sha256(f"{url}|{date}|{seq}".encode()).hexdigest()
    return (
        f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def _http_response_block(
    status: int,
    headers: list[tuple[str, str]],
    body: bytes,
) -> bytes:
    head = [f"HTTP/1.1 {status} OK".encode()]
    head += [f"{k}: {v}".encode() for k, v in headers]
    head.append(b"Content-Length: %d" % len(body))
    return _CRLF.join(head) + _CRLF + _CRLF + body


def write_warc(
    path: str,
    records: list[dict],
    gzip_per_record: bool | None = None,
) -> int:
    """Write WARC records to ``path``; returns the record count.

    Each record dict: ``url``, ``date`` (ISO 8601 Z), ``body`` bytes,
    optional ``warc_type`` ('response' default), ``http_status``
    (200), ``http_headers`` (list of (name, value)). For a ``.gz``
    path each record becomes its OWN gzip member per the spec annex —
    which is also what exercises the reader's multi-member handling.
    """
    if gzip_per_record is None:
        gzip_per_record = path.endswith(".gz")
    out = io.BytesIO()
    for seq, rec in enumerate(records):
        wtype = rec.get("warc_type", "response")
        url = rec.get("url", "")
        date = rec.get("date", "2020-01-01T00:00:00Z")
        body = rec.get("body", b"")
        if wtype == "response":
            block = _http_response_block(
                rec.get("http_status", 200),
                rec.get("http_headers", []),
                body,
            )
            ctype = "application/http; msgtype=response"
        elif wtype == "request":
            block = (
                b"GET / HTTP/1.1" + _CRLF + b"Host: x" + _CRLF + _CRLF
            )
            ctype = "application/http; msgtype=request"
        else:
            block = body
            ctype = rec.get("content_type", "application/warc-fields")
        head = [
            b"WARC/1.1",
            b"WARC-Type: " + wtype.encode(),
            b"WARC-Record-ID: " + _record_id(url, date, seq).encode(),
            b"WARC-Date: " + date.encode(),
            b"Content-Type: " + ctype.encode(),
            b"Content-Length: %d" % len(block),
        ]
        if url:
            head.insert(3, b"WARC-Target-URI: " + url.encode())
        raw = _CRLF.join(head) + _CRLF + _CRLF + block + _CRLF + _CRLF
        out.write(gzip.compress(raw, 6) if gzip_per_record else raw)
    data = out.getvalue()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return len(records)


def iter_warc_records(fh) -> "iter":
    """Stream WARC records off a binary file object: yields dicts with
    lower-cased WARC header names plus ``body`` (the raw block bytes).
    O(record) memory — reads exactly Content-Length octets per block.
    A truncated or malformed tail ends iteration instead of raising
    (real crawl segments are sometimes cut mid-record)."""
    while True:
        line = fh.readline()
        if not line:
            return
        if not line.strip():
            continue  # stray padding between records
        if not line.startswith(b"WARC/"):
            return  # lost sync: stop at the malformed tail
        headers: dict[str, str] = {}
        while True:
            hline = fh.readline()
            if not hline:
                return
            hline = hline.rstrip(b"\r\n")
            if not hline:
                break
            if b":" not in hline:
                continue
            k, v = hline.split(b":", 1)
            headers[k.decode("latin-1").strip().lower()] = v.decode(
                "latin-1"
            ).strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        block = fh.read(length)
        if len(block) < length:
            return  # truncated tail
        headers["body"] = block
        yield headers


def parse_http_response(block: bytes):
    """Split an HTTP response block -> (status int | None, headers
    dict (lower-cased, first value wins), body bytes). Non-HTTP
    blocks come back as (None, {}, block)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block.startswith(b"HTTP/"):
        return None, {}, block
    head, body = block[:sep], block[sep + 4:]
    lines = head.split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, {}, block
    headers: dict[str, str] = {}
    for hline in lines[1:]:
        if b":" not in hline:
            continue
        k, v = hline.split(b":", 1)
        k = k.decode("latin-1").strip().lower()
        if k not in headers:
            headers[k] = v.decode("latin-1").strip()
    return status, headers, body


def _parse_warc_date(s: str):
    """WARC-Date is ISO 8601 UTC ('2020-01-01T00:00:00Z', optional
    fractional seconds in 1.1). Returns a tz-aware datetime or None."""
    try:
        return datetime.fromisoformat(s.replace("Z", "+00:00")).astimezone(
            timezone.utc
        )
    except ValueError:
        return None


# ---------------------------------------------------------------------------
# The registered DataSource
# ---------------------------------------------------------------------------


def _expand_paths(path: str) -> list[str]:
    """path may be a file, a directory (all *.warc / *.warc.gz inside),
    or a glob. Sorted for deterministic partition numbering."""
    if os.path.isdir(path):
        found = _glob.glob(os.path.join(path, "*.warc")) + _glob.glob(
            os.path.join(path, "*.warc.gz")
        )
    elif _glob.has_magic(path):
        found = _glob.glob(path)
    else:
        found = [path] if os.path.exists(path) else []
    return sorted(found)


from pyspark.sql.datasource import (  # noqa: E402
    DataSource,
    DataSourceReader,
    InputPartition,
)


class WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.batch_rows = int(options.get("batchrows", "512"))
        # option("types", "response[,request,...]"): filter record
        # types AT DECODE, before any row materializes — an explicit
        # reader option rather than Catalyst pushFilters because of
        # the Spark 4.1 Python-source plan-reuse quirk that made
        # pushdown opt-in everywhere else in this repo (analysis in
        # sources/pg_source.py). A crawl pipeline reads `response`
        # records ~exclusively; request/warcinfo/metadata records are
        # framing overhead it should never pay Arrow transfer for.
        types = options.get("types", "")
        self.types = (
            {t.strip() for t in types.split(",") if t.strip()}
            if types
            else None
        )

    def partitions(self):
        paths = _expand_paths(self.path)
        if not paths:
            raise FileNotFoundError(
                f"warc source matched no files under {self.path!r}"
            )
        return [WarcFilePartition(p) for p in paths]

    def read(self, partition):
        import pyarrow as pa

        fields = [
            pa.field("file", pa.string()),
            pa.field("record_id", pa.string()),
            pa.field("warc_type", pa.string()),
            pa.field("url", pa.string()),
            pa.field("fetch_ts", pa.timestamp("us", tz="UTC")),
            pa.field("content_type", pa.string()),
            pa.field("http_status", pa.int32()),
            pa.field("http_content_type", pa.string()),
            pa.field("http_headers", pa.map_(pa.string(), pa.string())),
            pa.field("body", pa.binary()),
        ]
        schema = pa.schema(fields)
        path = partition.path
        fname = os.path.basename(path)
        opener = gzip.open if path.endswith(".gz") else open
        rows: list[tuple] = []

        def flush():
            cols = list(zip(*rows)) if rows else [[]] * len(fields)
            arrays = [
                pa.array(c, type=f.type) for c, f in zip(cols, fields)
            ]
            return pa.RecordBatch.from_arrays(arrays, schema=schema)

        with opener(path, "rb") as fh:
            for rec in iter_warc_records(fh):
                wtype = rec.get("warc-type", "")
                if self.types is not None and wtype not in self.types:
                    continue
                block = rec["body"]
                ctype = rec.get("content-type", "")
                if wtype == "response" and ctype.startswith(
                    "application/http"
                ):
                    status, hheaders, body = parse_http_response(block)
                else:
                    status, hheaders, body = None, {}, block
                rows.append(
                    (
                        fname,
                        rec.get("warc-record-id"),
                        wtype,
                        rec.get("warc-target-uri"),
                        _parse_warc_date(rec.get("warc-date", "")),
                        ctype,
                        status,
                        hheaders.get("content-type"),
                        list(hheaders.items()),
                        body,
                    )
                )
                if len(rows) >= self.batch_rows:
                    yield flush()
                    rows = []
        if rows:
            yield flush()


class WarcDataSource(DataSource):
    """Registered as ``warc``; requires option ``path`` (file,
    directory, or glob). Optional ``types`` (comma-separated
    WARC-Type allowlist, e.g. ``"response"``) filters records at
    decode so skipped types never materialize as rows. One partition
    per file; Arrow-batched rows; see module docstring for the scale
    argument."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA_DDL

    def reader(self, schema) -> WarcReader:
        return WarcReader(dict(self.options))


def register_warc(spark) -> None:
    spark.dataSource.register(WarcDataSource)


# ---------------------------------------------------------------------------
# Deterministic fixture capture derived from the documents table —
# lets the oracle gate prove the source end-to-end: WARC written from
# documents, read back through the DataSource, compared against SQL
# over the same documents rows.
# ---------------------------------------------------------------------------


def build_warc_fixture(
    spark, sf_dir: str, out_dir: str, n_files: int | None = None
) -> str:
    """Write a WARC capture deterministically derived from
    ``{sf_dir}/documents.parquet``: per document one ``response``
    record (HTTP 200, ``Content-Type: text/html``, ``X-Doc: <doc_id>``
    header, body = the document text, WARC-Date = 2020-01-01T00:00:00Z
    + doc_id seconds); every 16th document also gets a paired
    ``request`` record and each file opens with a ``warcinfo`` record,
    so readers must actually FILTER record types, as on real crawl
    segments. Distributed: ``repartition(n_files)`` + ``mapInPandas``,
    each task writing ONE ``.warc.gz`` with per-record gzip members.
    A ``_done`` marker keyed on (row count, n_files) skips
    regeneration on reruns. Returns ``out_dir``."""
    import pandas as pd  # noqa: F401 (executor-side)
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_rows = docs.count()
    if n_files is None:
        # File count scales with the corpus (CommonCrawl posture:
        # segment files of bounded size, parallelism = files) — the
        # read side's partition count then grows with the data
        # instead of pinning task granularity at the small-SF shape.
        n_files = max(4, n_rows // 25_000)
    marker = os.path.join(out_dir, "_done")
    want = f"{n_rows}:{n_files}"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == want:
                return out_dir
        for old in _expand_paths(out_dir):
            os.remove(old)
    os.makedirs(out_dir, exist_ok=True)

    def _write_part(batches):
        import pandas as pd
        from pyspark import TaskContext

        from datetime import timedelta

        epoch = datetime(2020, 1, 1, tzinfo=timezone.utc)
        recs: list[dict] = [
            {"warc_type": "warcinfo", "body": b"software: fixture\r\n"}
        ]
        for pdf in batches:
            for doc_id, text, source in zip(
                pdf["doc_id"], pdf["text"], pdf["source"]
            ):
                url = f"http://{source}.example/doc/{doc_id}"
                date = (epoch + timedelta(seconds=int(doc_id))).strftime(
                    "%Y-%m-%dT%H:%M:%SZ"
                )
                if int(doc_id) % 16 == 0:
                    recs.append(
                        {"warc_type": "request", "url": url, "date": date}
                    )
                recs.append(
                    {
                        "url": url,
                        "date": date,
                        "body": str(text).encode("utf-8"),
                        "http_headers": [
                            ("Content-Type", "text/html"),
                            ("X-Doc", str(doc_id)),
                        ],
                    }
                )
        n = 0
        if len(recs) > 1:
            pid = TaskContext.get().partitionId()
            n = write_warc(
                os.path.join(out_dir, f"part-{pid:05d}.warc.gz"), recs
            )
        yield pd.DataFrame({"n": [n]})

    written = (
        docs.select("doc_id", "text", "source")
        .repartition(n_files, "doc_id")
        .mapInPandas(_write_part, "n long")
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    with open(marker, "w") as f:
        f.write(want)
    if written is None:
        raise RuntimeError("warc fixture wrote no records")
    return out_dir
