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
    "WarcStreamReader",
    "decode_http_body",
    "iter_warc_records",
    "parse_http_response",
    "register_warc",
    "write_warc",
]

_CRLF = b"\r\n"

# Output schema of the `warc` DataSource (one row per WARC record).
# ``body`` is the DECODED payload for response records (chunked
# framing removed, Content-Encoding decompressed); ``body_decoded``
# is false only when a declared encoding could not be fully removed
# (truncated gzip member, malformed chunk framing, unknown coding) —
# the body then carries the best-effort partial decode so downstream
# text/quality/dedup stages can still gate on the flag.
WARC_SCHEMA_DDL = (
    "file string, record_id string, warc_type string, url string, "
    "fetch_ts timestamp, content_type string, http_status int, "
    "http_content_type string, http_headers map<string,string>, "
    "body binary, body_decoded boolean"
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


def _chunk_frame(payload: bytes, chunk_size: int = 1024) -> bytes:
    """Frame ``payload`` as Transfer-Encoding: chunked (hex size
    lines, terminating 0-chunk, no trailers)."""
    out = []
    for i in range(0, len(payload), chunk_size):
        piece = payload[i : i + chunk_size]
        out.append(b"%x" % len(piece) + _CRLF + piece + _CRLF)
    out.append(b"0" + _CRLF + _CRLF)
    return b"".join(out)


def _http_response_block(
    status: int,
    headers: list[tuple[str, str]],
    body: bytes,
    chunked: bool = False,
    gzip_content: bool = False,
) -> bytes:
    """HTTP/1.1 response message. ``gzip_content`` compresses the
    payload and declares ``Content-Encoding: gzip``; ``chunked``
    frames the (possibly compressed) payload as chunked transfer
    coding and OMITS Content-Length per RFC 9112 §6.2 (a message with
    Transfer-Encoding must not rely on Content-Length). Both together
    produce the real-capture worst case: gzip inside chunk framing."""
    head = [f"HTTP/1.1 {status} OK".encode()]
    head += [f"{k}: {v}".encode() for k, v in headers]
    payload = body
    if gzip_content:
        payload = gzip.compress(payload, 6)
        head.append(b"Content-Encoding: gzip")
    if chunked:
        payload = _chunk_frame(payload)
        head.append(b"Transfer-Encoding: chunked")
    else:
        head.append(b"Content-Length: %d" % len(payload))
    return _CRLF.join(head) + _CRLF + _CRLF + payload


def write_warc(
    path: str,
    records: list[dict],
    gzip_per_record: bool | None = None,
) -> int:
    """Write WARC records to ``path``; returns the record count.

    Each record dict: ``url``, ``date`` (ISO 8601 Z), ``body`` bytes,
    optional ``warc_type`` ('response' default), ``http_status``
    (200), ``http_headers`` (list of (name, value)), ``chunked``
    (frame the response payload as Transfer-Encoding: chunked) and
    ``gzip_content`` (Content-Encoding: gzip the payload) — the two
    real-capture body shapes the reader must undo. For a ``.gz``
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
                chunked=rec.get("chunked", False),
                gzip_content=rec.get("gzip_content", False),
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


def _decode_chunked(body: bytes) -> tuple[bytes, bool]:
    """Remove Transfer-Encoding: chunked framing -> (payload, ok).
    Tolerant the same way the record parser is: a truncated or
    malformed tail returns every cleanly-framed chunk accumulated so
    far with ok=False instead of raising (real captures are cut
    mid-record often enough that tolerance is table stakes). Chunk
    extensions (``;name=value`` after the hex size) and trailer
    fields after the 0-chunk are parsed past per RFC 9112 §7.1."""
    out: list[bytes] = []
    pos = 0
    while True:
        nl = body.find(_CRLF, pos)
        if nl < 0:
            return b"".join(out), False  # cut before a size line
        size_field = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_field, 16)
        except ValueError:
            return b"".join(out), False  # lost chunk sync
        pos = nl + 2
        if size == 0:
            return b"".join(out), True  # trailers (if any) ignored
        piece = body[pos : pos + size]
        out.append(piece)
        if len(piece) < size:
            return b"".join(out), False  # cut mid-chunk
        pos += size
        if body[pos : pos + 2] != _CRLF:
            return b"".join(out), False  # missing chunk-data CRLF
        pos += 2


def _inflate(body: bytes, wbits: int) -> tuple[bytes, bool]:
    """zlib-decompress with the given window bits, looping over
    concatenated members (multi-member gzip bodies are legal and
    CommonCrawl-real). Truncated/corrupt input returns the bytes
    decompressed so far with ok=False."""
    import zlib

    out: list[bytes] = []
    data = body
    while data:
        d = zlib.decompressobj(wbits)
        try:
            out.append(d.decompress(data))
            out.append(d.flush())
        except zlib.error:
            return b"".join(out), False
        if not d.eof:
            return b"".join(out), False  # truncated member
        if d.unused_data == data:
            return b"".join(out), False  # no progress: bail
        data = d.unused_data
    return b"".join(out), True


def _decompress(body: bytes, coding: str) -> tuple[bytes, bool]:
    if coding in ("gzip", "x-gzip"):
        # wbits=47 auto-detects gzip/zlib headers
        return _inflate(body, 47)
    if coding == "deflate":
        # RFC says zlib-wrapped, the wild sends raw deflate too:
        # try wrapped first, fall back to raw on a clean failure
        payload, ok = _inflate(body, 15)
        if ok:
            return payload, True
        payload2, ok2 = _inflate(body, -15)
        return (payload2, True) if ok2 else (payload, False)
    return body, False  # unknown coding: leave bytes, flag it


def decode_http_body(body: bytes, headers: dict) -> tuple[bytes, bool]:
    """Undo the message-body encodings an HTTP response declares ->
    (payload, fully_decoded). Transfer-Encoding codings are removed
    first (right-to-left — ``chunked`` is always outermost per RFC
    9112), then Content-Encoding codings (right-to-left). Supported:
    chunked, identity, gzip/x-gzip, deflate. An unknown coding or a
    decode failure stops the pipeline at that layer and returns the
    best-effort bytes with ok=False — downstream stages gate on the
    ``body_decoded`` column instead of silently ingesting framing or
    compressed bytes (the exact poisoning this layer exists to stop)."""
    ok = True
    te = [
        t.strip().lower()
        for t in headers.get("transfer-encoding", "").split(",")
        if t.strip()
    ]
    for coding in reversed(te):
        if coding == "identity":
            continue
        if coding == "chunked":
            body, step_ok = _decode_chunked(body)
        else:
            body, step_ok = _decompress(body, coding)
        if not step_ok:
            return body, False
    ce = [
        t.strip().lower()
        for t in headers.get("content-encoding", "").split(",")
        if t.strip()
    ]
    for coding in reversed(ce):
        if coding == "identity":
            continue
        body, step_ok = _decompress(body, coding)
        if not step_ok:
            return body, False
    return body, ok


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


def _parse_types_option(options: dict):
    # option("types", "response[,request,...]"): filter record
    # types AT DECODE, before any row materializes — an explicit
    # reader option rather than Catalyst pushFilters because of
    # the Spark 4.1 Python-source plan-reuse quirk that made
    # pushdown opt-in everywhere else in this repo (analysis in
    # sources/pg_source.py). A crawl pipeline reads `response`
    # records ~exclusively; request/warcinfo/metadata records are
    # framing overhead it should never pay Arrow transfer for.
    types = options.get("types", "")
    return (
        {t.strip() for t in types.split(",") if t.strip()}
        if types
        else None
    )


def _read_warc_file(path: str, types, batch_rows: int):
    """One WARC file -> Arrow record batches (the shared task body of
    the batch and streaming readers): streaming O(record)-memory
    parse, record-type filter at decode, HTTP envelope split, body
    transfer/content decoding."""
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
        pa.field("body_decoded", pa.bool_()),
    ]
    schema = pa.schema(fields)
    fname = os.path.basename(path)
    opener = gzip.open if path.endswith(".gz") else open
    rows: list[tuple] = []

    def flush():
        cols = list(zip(*rows)) if rows else [[]] * len(fields)
        arrays = [pa.array(c, type=f.type) for c, f in zip(cols, fields)]
        return pa.RecordBatch.from_arrays(arrays, schema=schema)

    with opener(path, "rb") as fh:
        for rec in iter_warc_records(fh):
            wtype = rec.get("warc-type", "")
            if types is not None and wtype not in types:
                continue
            block = rec["body"]
            ctype = rec.get("content-type", "")
            if wtype == "response" and ctype.startswith(
                "application/http"
            ):
                status, hheaders, body = parse_http_response(block)
                body, decoded = decode_http_body(body, hheaders)
            else:
                status, hheaders, body = None, {}, block
                decoded = True  # nothing declared, nothing to undo
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
                    decoded,
                )
            )
            if len(rows) >= batch_rows:
                yield flush()
                rows = []
    if rows:
        yield flush()


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.batch_rows = int(options.get("batchrows", "512"))
        self.types = _parse_types_option(options)

    def partitions(self):
        paths = _expand_paths(self.path)
        if not paths:
            raise FileNotFoundError(
                f"warc source matched no files under {self.path!r}"
            )
        return [WarcFilePartition(p) for p in paths]

    def read(self, partition):
        yield from _read_warc_file(
            partition.path, self.types, self.batch_rows
        )


from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class WarcStreamReader(DataSourceStreamReader):
    """File-discovery streaming head of the crawl chain: new
    ``.warc.gz`` capture files landing in a directory become exactly
    one microbatch partition each — the same offset discipline as
    ``PgWireStreamReader``, with the watermark being the
    lexicographically-greatest file NAME emitted so far instead of a
    column value. Offset ``{"last": name}`` means "every capture file
    with basename <= name has been emitted"; ``partitions(start,
    end)`` plans one partition per file in ``(start, end]``, and each
    task streams its file through the shared decode path (record
    framing, gzip members, HTTP envelope, chunked/gzip body decode).

    The watermark contract is the CommonCrawl one: capture writers
    emit monotonically-named segment files (``part-00001`` ...) and
    publish them atomically (write temp + rename — ``write_warc``
    does). A file that APPEARS with a name at or below the watermark
    after its batch closed is late data this source will not re-scan
    — the deliberate trade for an O(1) durable offset (a seen-set
    offset replays O(files) state into every checkpoint commit at
    100k-file scale). Start mid-history with
    ``option("startingAfter", name)``."""

    def __init__(self, schema, options: dict):
        self.path = options["path"]
        self.batch_rows = int(options.get("batchrows", "512"))
        self.types = _parse_types_option(options)
        self.starting_after = options.get("startingafter", "")

    def initialOffset(self) -> dict:
        return {"last": self.starting_after}

    def latestOffset(self) -> dict:
        names = [os.path.basename(p) for p in _expand_paths(self.path)]
        last = max(names) if names else ""
        return {"last": max(last, self.starting_after)}

    def partitions(self, start: dict, end: dict):
        lo, hi = start.get("last", ""), end.get("last", "")
        fresh = [
            p
            for p in _expand_paths(self.path)
            if lo < os.path.basename(p) <= hi
        ]
        if not fresh:
            return [WarcFilePartition("")]  # no-data batch marker
        return [WarcFilePartition(p) for p in fresh]

    def read(self, partition):
        if not partition.path:
            return
        yield from _read_warc_file(
            partition.path, self.types, self.batch_rows
        )

    def commit(self, end: dict) -> None:
        # Offsets are durable file names; nothing to clean up.
        pass


class WarcDataSource(DataSource):
    """Registered as ``warc``; requires option ``path`` (file,
    directory, or glob). Optional ``types`` (comma-separated
    WARC-Type allowlist, e.g. ``"response"``) filters records at
    decode so skipped types never materialize as rows. One partition
    per file; Arrow-batched rows; see module docstring for the scale
    argument. ``spark.readStream.format("warc")`` streams NEW capture
    files by file-name watermark (:class:`WarcStreamReader`)."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA_DDL

    def reader(self, schema) -> WarcReader:
        return WarcReader(dict(self.options))

    def streamReader(self, schema) -> WarcStreamReader:
        return WarcStreamReader(schema, dict(self.options))


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
    segments. The HTTP body SHAPE cycles by ``doc_id % 4`` — plain /
    Content-Encoding: gzip / Transfer-Encoding: chunked / chunked
    AROUND gzip — so every oracle run proves the reader's body
    decoding byte-exact on all four real-capture shapes, not just the
    identity one. Distributed: ``repartition(n_files)`` +
    ``mapInPandas``, each task writing ONE ``.warc.gz`` with
    per-record gzip members. A ``_done`` marker keyed on (fixture
    version, row count, n_files, content fingerprint) skips
    regeneration on reruns; the fingerprint (sum of crc32(text) +
    doc_id, one extra column in the count pass) catches an in-place
    regenerated documents table with the same row count, which the
    old (rows, files) key silently reused stale captures for.
    Returns ``out_dir``."""
    import pandas as pd  # noqa: F401 (executor-side)
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    stats = docs.agg(
        F.count(F.lit(1)),
        F.sum(F.crc32(F.col("text").cast("binary")) + F.col("doc_id")),
    ).first()
    n_rows, content_fp = stats[0], stats[1]
    if n_files is None:
        # File count scales with the corpus (CommonCrawl posture:
        # segment files of bounded size, parallelism = files) — the
        # read side's partition count then grows with the data
        # instead of pinning task granularity at the small-SF shape.
        n_files = max(4, n_rows // 25_000)
    marker = os.path.join(out_dir, "_done")
    want = f"v2:{n_rows}:{n_files}:{content_fp}"
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
                shape = int(doc_id) % 4
                recs.append(
                    {
                        "url": url,
                        "date": date,
                        "body": str(text).encode("utf-8"),
                        "http_headers": [
                            ("Content-Type", "text/html"),
                            ("X-Doc", str(doc_id)),
                        ],
                        "gzip_content": shape in (1, 3),
                        "chunked": shape in (2, 3),
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
