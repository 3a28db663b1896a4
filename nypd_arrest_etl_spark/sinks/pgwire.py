"""Pure-stdlib PostgreSQL wire client: the real socket leg of the
JDBC sink (SURVEY.md §2b K2-K5).

The reference loads through psycopg2 (/root/reference/scripts/
load.py:86-159: per-chunk staging INSERTs + ON CONFLICT merge). This
image ships a Postgres SERVER (initdb/pg_ctl) but no client library
and no JDBC driver jar, so the staged-merge drive used to stop at the
engine-agnostic seam (``jdbc.merge_via_staging``) with DuckDB
executing the SQL. This module closes the remaining leg with a
minimal client speaking the documented frontend/backend protocol v3
(PostgreSQL docs, "Frontend/Backend Protocol" — public wire format):

- startup + trust/cleartext/md5/SCRAM-SHA-256 auth (SCRAM is the
  Postgres default since v14 — RFC 7677 client side with mutual
  server-signature verification, pure stdlib pbkdf2/hmac),
- the simple-query subprotocol (``execute``/``query``: one Query
  message, RowDescription/DataRow/CommandComplete/ReadyForQuery in),
- ``COPY ... FROM STDIN`` text-format streaming (CopyInResponse /
  CopyData / CopyDone) — Postgres's bulk-load fast path, what the
  reference's chunked INSERTs should have been.

Scale design mirrors ``df.write.jdbc``: :func:`stage_dataframe` opens
ONE connection PER PARTITION inside ``foreachPartition`` and streams
each partition concurrently via COPY — executor-side parallel load,
no driver collect. The driver holds a single extra connection for
DDL and the set-based merge. :func:`read_postgres` is the matching
SOURCE: the ``spark.read.jdbc(partitionColumn=...)`` model, each
key-range slice streamed by ``COPY ... TO STDOUT`` from an executor
task. Works over unix sockets and TCP; being stdlib-only, it is
picklable config + socket code, so executors need no extra packages.

NOT a general driver: text protocol only (no binary params, no
prepared statements, no TLS — so no SCRAM-SHA-256-PLUS channel
binding; pair with a unix socket, tunnel, or private network). That
surface is exactly what the staged-merge load needs; anything more
belongs to a real driver on a real deployment.
"""

from __future__ import annotations

import datetime
import os
import socket
import struct

from pyspark.sql import DataFrame

__all__ = [
    "PgError",
    "PgWireClient",
    "copy_field",
    "copy_unescape",
    "staging_ddl",
    "stage_dataframe",
    "merge_via_pgwire",
    "read_postgres",
]


class PgError(OSError):
    """Server ErrorResponse, with the protocol's notice fields."""

    def __init__(self, fields: dict[str, str]):
        self.fields = fields
        code = fields.get("C", "?????")
        super().__init__(f"[{code}] {fields.get('M', 'unknown server error')}")


def _parse_notice(payload: bytes) -> dict[str, str]:
    """ErrorResponse/NoticeResponse body: (field-type byte, C string)
    pairs terminated by a zero byte."""
    fields: dict[str, str] = {}
    i = 0
    while i < len(payload) and payload[i] != 0:
        code = chr(payload[i])
        j = payload.index(b"\0", i + 1)
        fields[code] = payload[i + 1 : j].decode("utf-8", "replace")
        i = j + 1
    return fields


def _md5_response(user: str, password: str, salt: bytes) -> bytes:
    """AuthenticationMD5Password answer: the legacy double-MD5 —
    ``'md5' + md5(md5(password+user) + salt)`` as a C string."""
    import hashlib

    inner = hashlib.md5(password.encode() + user.encode()).hexdigest()
    outer = hashlib.md5(inner.encode() + salt).hexdigest()
    return b"md5" + outer.encode() + b"\0"


class _ScramClient:
    """SCRAM-SHA-256 client side (RFC 5802/7677), the auth method
    Postgres has DEFAULTED to since v14 (``password_encryption =
    scram-sha-256``) — without it this client can only reach trust/
    cleartext/md5 deployments. Pure stdlib: the salted password is
    ``pbkdf2_hmac``, the proof is two HMACs and an XOR. Channel
    binding is ``n,,`` (gs2 "client doesn't support") because the
    client has no TLS; servers accept that for SCRAM-SHA-256 (only
    -PLUS requires binding). The username field in the SCRAM exchange
    stays empty per the Postgres convention (the startup-message user
    is authoritative). Passwords go in UTF-8 as-is; SASLprep is a
    no-op for the ASCII passwords this covers."""

    def __init__(self, password: str):
        import base64
        import secrets

        self._password = password.encode()
        self._nonce = base64.b64encode(secrets.token_bytes(18)).decode()
        self._client_first_bare = f"n=,r={self._nonce}"
        self._auth_message: bytes | None = None
        self._salted: bytes | None = None

    def client_first(self) -> bytes:
        return b"n,," + self._client_first_bare.encode()

    def client_final(self, server_first: bytes) -> bytes:
        import base64
        import hashlib
        import hmac

        text = server_first.decode()
        attrs = dict(kv.split("=", 1) for kv in text.split(","))
        if not attrs["r"].startswith(self._nonce):
            raise PgError({"M": "SCRAM server nonce does not extend ours"})
        salt = base64.b64decode(attrs["s"])
        iters = int(attrs["i"])
        self._salted = hashlib.pbkdf2_hmac(
            "sha256", self._password, salt, iters
        )
        client_key = hmac.new(self._salted, b"Client Key", "sha256").digest()
        stored_key = hashlib.sha256(client_key).digest()
        final_bare = f"c=biws,r={attrs['r']}"  # biws = b64("n,,")
        self._auth_message = (
            f"{self._client_first_bare},{text},{final_bare}".encode()
        )
        sig = hmac.new(stored_key, self._auth_message, "sha256").digest()
        proof = bytes(a ^ b for a, b in zip(client_key, sig))
        return (final_bare + ",p=" + base64.b64encode(proof).decode()).encode()

    def verify_server_final(self, server_final: bytes) -> None:
        """MUTUAL auth: a server that doesn't know the salted password
        can't produce v= — skipping this check would accept a spoofed
        server that replayed the salt/iteration parameters."""
        import base64
        import hmac

        attrs = dict(
            kv.split("=", 1) for kv in server_final.decode().split(",")
        )
        server_key = hmac.new(self._salted, b"Server Key", "sha256").digest()
        want = hmac.new(server_key, self._auth_message, "sha256").digest()
        if base64.b64decode(attrs["v"]) != want:
            raise PgError({"M": "SCRAM server signature mismatch"})


class PgWireClient:
    """One Postgres session over protocol v3 (autocommit simple-query
    mode — each ``execute`` is its own transaction unless bracketed by
    explicit BEGIN/COMMIT statements).

    ``host`` starting with ``/`` is a unix-socket DIRECTORY (libpq
    convention: the actual socket is ``.s.PGSQL.<port>`` inside it) or
    a full socket path; anything else is a TCP host.
    """

    def __init__(
        self,
        host: str,
        port: int = 5432,
        user: str = "postgres",
        database: str = "postgres",
        password: str | None = None,
        timeout: float = 30.0,
    ):
        if host.startswith("/"):
            path = (
                host
                if os.path.basename(host).startswith(".s.PGSQL.")
                else os.path.join(host, f".s.PGSQL.{port}")
            )
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.settimeout(timeout)
            self._sock.connect(path)
        else:
            self._sock = socket.create_connection((host, port), timeout=timeout)
        self._closed = False
        try:
            self._startup(user, database, password)
        except BaseException:
            self.close()
            raise

    # -- framing ----------------------------------------------------------

    def _send(self, mtype: bytes, payload: bytes = b"") -> None:
        self._sock.sendall(mtype + struct.pack("!i", len(payload) + 4) + payload)

    def _recv_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise PgError({"M": "server closed the connection mid-message"})
            buf.extend(chunk)
        return bytes(buf)

    def _recv(self) -> tuple[bytes, bytes]:
        head = self._recv_exact(5)
        (length,) = struct.unpack("!i", head[1:5])
        return head[:1], self._recv_exact(length - 4)

    # -- session ----------------------------------------------------------

    def _startup(self, user: str, database: str, password: str | None) -> None:
        params = {"user": user, "database": database, "client_encoding": "UTF8"}
        body = struct.pack("!i", 196608)  # protocol 3.0
        for k, v in params.items():
            body += k.encode() + b"\0" + v.encode() + b"\0"
        body += b"\0"
        self._sock.sendall(struct.pack("!i", len(body) + 4) + body)
        scram = None
        while True:
            t, p = self._recv()
            if t == b"R":
                (code,) = struct.unpack("!i", p[:4])
                if code == 0:  # AuthenticationOk
                    continue
                if code == 3 and password is not None:  # cleartext
                    self._send(b"p", password.encode() + b"\0")
                    continue
                if code == 5 and password is not None:  # MD5Password
                    self._send(b"p", _md5_response(user, password, p[4:8]))
                    continue
                if code == 10 and password is not None:  # SASL mech list
                    mechs = p[4:].split(b"\0")
                    if b"SCRAM-SHA-256" not in mechs:
                        raise PgError(
                            {"M": f"server offers {mechs!r}; client speaks "
                                  "SCRAM-SHA-256 (no channel binding/TLS)"}
                        )
                    scram = _ScramClient(password)
                    first = scram.client_first()
                    self._send(
                        b"p",
                        b"SCRAM-SHA-256\0"
                        + struct.pack("!i", len(first))
                        + first,
                    )
                    continue
                if code == 11 and scram is not None:  # SASLContinue
                    self._send(b"p", scram.client_final(p[4:]))
                    continue
                if code == 12 and scram is not None:  # SASLFinal
                    scram.verify_server_final(p[4:])
                    continue
                raise PgError(
                    {"M": f"unsupported auth request {code} (client speaks "
                          "trust/cleartext/md5/SCRAM-SHA-256"
                          + ("" if password is not None else
                             "; no password was supplied") + ")"}
                )
            if t == b"E":
                raise PgError(_parse_notice(p))
            if t == b"Z":  # ReadyForQuery
                return
            # ParameterStatus / BackendKeyData / NoticeResponse: ignored

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            try:
                self._send(b"X")  # Terminate
            except OSError:
                pass
            self._sock.close()

    def __enter__(self) -> "PgWireClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- simple query -----------------------------------------------------

    @staticmethod
    def _rowcount(tag: str | None) -> int:
        """CommandComplete tag -> affected rows ("INSERT 0 7" -> 7,
        "COPY 3" -> 3, "CREATE TABLE" -> 0)."""
        if tag:
            last = tag.rsplit(" ", 1)[-1]
            if last.isdigit():
                return int(last)
        return 0

    def _drain(self, collect_rows: bool):
        """Read one simple-query response stream to ReadyForQuery.
        Returns (columns, rows, last CommandComplete tag); raises the
        FIRST ErrorResponse after the stream settles (the server always
        finishes with ReadyForQuery, keeping the session usable)."""
        cols: list[str] | None = None
        rows: list[tuple] = []
        tag: str | None = None
        err: dict | None = None
        while True:
            t, p = self._recv()
            if t == b"T" and collect_rows:
                (n,) = struct.unpack("!h", p[:2])
                cols, i = [], 2
                for _ in range(n):
                    j = p.index(b"\0", i)
                    cols.append(p[i:j].decode())
                    i = j + 1 + 18  # fixed per-column descriptor tail
            elif t == b"D" and collect_rows:
                (n,) = struct.unpack("!h", p[:2])
                vals, i = [], 2
                for _ in range(n):
                    (ln,) = struct.unpack("!i", p[i : i + 4])
                    i += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(p[i : i + ln].decode())
                        i += ln
                rows.append(tuple(vals))
            elif t == b"C":
                tag = p[:-1].decode()
            elif t == b"E":
                err = err or _parse_notice(p)
            elif t == b"G":
                # a COPY FROM STDIN run through execute()/query() would
                # otherwise hang waiting for CopyData the caller will
                # never send, wedging the session: fail the copy and
                # surface a pointed error once the stream settles
                self._send(b"f", b"use copy_in() for COPY FROM STDIN\0")
                err = err or {"M": "statement started COPY IN — use copy_in()"}
            elif t == b"H":
                # COPY TO STDOUT: its data ('d') messages fall through
                # to the skip branch; reject once drained
                err = err or {"M": "statement started COPY OUT — use copy_out()"}
            elif t == b"Z":
                if err:
                    raise PgError(err)
                return cols, rows, tag
            # 'N' notices, 'S' parameter changes, 'I' empty query,
            # 'd'/'c' copy-out payload being discarded: skip

    def execute(self, sql: str) -> int:
        """Run ``sql``; return the affected rowcount (the
        ``executeUpdate`` contract ``merge_via_staging`` expects)."""
        self._send(b"Q", sql.encode() + b"\0")
        _, _, tag = self._drain(collect_rows=False)
        return self._rowcount(tag)

    def query(self, sql: str) -> tuple[list[str], list[tuple]]:
        """Run ``sql``; return (column names, rows of text values —
        the protocol's text results; callers cast)."""
        self._send(b"Q", sql.encode() + b"\0")
        cols, rows, _ = self._drain(collect_rows=True)
        return cols or [], rows

    # -- COPY OUT ---------------------------------------------------------

    def copy_out(self, sql: str):
        """Stream a ``COPY ... TO STDOUT`` statement: yields one raw
        text-format row (bytes, no trailing newline) at a time,
        reassembled across CopyData message boundaries — constant
        memory however large the result. Consume FULLY (or close the
        client): abandoning mid-stream leaves the session mid-COPY."""
        self._send(b"Q", sql.encode() + b"\0")
        while True:
            t, p = self._recv()
            if t == b"H":  # CopyOutResponse
                break
            if t == b"E":
                fields = _parse_notice(p)
                self._drain(collect_rows=False)
                raise PgError(fields)
            if t == b"Z":
                raise PgError({"M": f"statement did not start COPY OUT: {sql!r}"})
        buf = bytearray()
        err: dict | None = None
        while True:
            t, p = self._recv()
            if t == b"d":
                buf += p
                start = 0
                while (idx := buf.find(b"\n", start)) != -1:
                    yield bytes(buf[start:idx])
                    start = idx + 1
                del buf[:start]
            elif t == b"E":
                err = err or _parse_notice(p)
            elif t == b"Z":
                if err:
                    raise PgError(err)
                return
            # 'c' CopyDone / 'C' CommandComplete / notices: skip

    # -- COPY IN ----------------------------------------------------------

    def copy_in(self, sql: str, lines) -> int:
        """Stream ``lines`` (iterable of pre-encoded text-format rows,
        WITHOUT trailing newline — see :func:`copy_field`) into a
        ``COPY ... FROM STDIN`` statement. Returns the copied rowcount.
        Rows are batched into ~64 KiB CopyData messages."""
        self._send(b"Q", sql.encode() + b"\0")
        while True:
            t, p = self._recv()
            if t == b"G":  # CopyInResponse
                break
            if t == b"E":
                fields = _parse_notice(p)
                self._drain(collect_rows=False)  # settle to ReadyForQuery
                raise PgError(fields)
            if t == b"Z":
                raise PgError({"M": f"statement did not start COPY IN: {sql!r}"})
        try:
            buf = bytearray()
            for line in lines:
                buf += line.encode() if isinstance(line, str) else line
                buf += b"\n"
                if len(buf) >= 65536:
                    self._send(b"d", bytes(buf))
                    buf.clear()
            if buf:
                self._send(b"d", bytes(buf))
        except BaseException:
            # tell the server the copy is abandoned, keep session sane
            # — but if the SOCKET is what failed, CopyFail/drain raise
            # OSError too; swallow those so the ROOT cause propagates
            try:
                self._send(b"f", b"client-side failure\0")
                self._drain(collect_rows=False)
            except (PgError, OSError):
                pass
            raise
        self._send(b"c")  # CopyDone
        _, _, tag = self._drain(collect_rows=False)
        return self._rowcount(tag)


# -- Spark staging over the wire ------------------------------------------


def copy_field(v) -> str:
    """One value in COPY text format: ``\\N`` for SQL NULL, ``t``/``f``
    booleans, and backslash-escaped delimiter/terminator bytes
    (tab, newline, CR, backslash) per the COPY TEXT spec."""
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    s = v if isinstance(v, str) else str(v)
    return (
        s.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


_PG_TYPES = {
    "string": "TEXT",
    "date": "DATE",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "smallint": "SMALLINT",
    "float": "REAL",
    "double": "DOUBLE PRECISION",
    "boolean": "BOOLEAN",
    # Spark TimestampType is an INSTANT — a naive TIMESTAMP column
    # would re-interpret its wall text in the SERVER's session zone,
    # silently shifting values on any non-UTC server
    "timestamp": "TIMESTAMPTZ",
    "timestamp_ntz": "TIMESTAMP",
}


def pg_type_for(field) -> str:
    """The Postgres DDL type for one Spark StructField — the ONE
    Spark-type -> PG-type seam (staging DDL and the pgwire DataSource
    writer both build tables through it)."""
    simple = field.dataType.simpleString()
    if simple.startswith("decimal("):
        # exact precision/scale carries into the DDL: NUMERIC(p,s)
        return "NUMERIC" + simple[len("decimal") :]
    t = _PG_TYPES.get(simple)
    if t is None:
        raise TypeError(
            f"no COPY/text mapping for column {field.name!r} of type "
            f"{field.dataType.simpleString()!r}"
        )
    return t


def instant_utc_text(v):
    """A Spark TimestampType value as explicit-offset UTC text for
    COPY into TIMESTAMPTZ. Spark hands Python code naive datetimes in
    the WORKER's local zone (``fromInternal`` uses ``fromtimestamp``);
    ``astimezone(utc)`` on a naive value attaches exactly that zone —
    the correct inverse — while normalizing. Emitting the offset makes
    the stored instant independent of the server's session TimeZone.
    Hot path: one call per timestamp cell of every COPYed row."""
    if v is None:
        return None
    return v.astimezone(datetime.timezone.utc).isoformat(sep=" ")


def timestamp_field_indexes(schema) -> frozenset[int]:
    """Positions of instant (TimestampType) columns — the ones whose
    COPY text must go through :func:`instant_utc_text`."""
    return frozenset(
        i
        for i, f in enumerate(schema.fields)
        if f.dataType.simpleString() == "timestamp"
    )


def copy_line(row, n_cols: int, ts_idx: frozenset[int]) -> str:
    """One row as a COPY text line: instants normalized to explicit
    UTC, everything else through :func:`copy_field`."""
    return "\t".join(
        copy_field(instant_utc_text(row[i]) if i in ts_idx else row[i])
        for i in range(n_cols)
    )


def staging_ddl(df: DataFrame, table: str) -> str:
    """CREATE TABLE for a staging target matching ``df``'s schema
    (unconstrained: staging holds the raw batch, the merge statement
    owns dedup and domain guards)."""
    cols = [f"{_ident(f.name)} {pg_type_for(f)}" for f in df.schema.fields]
    return f"CREATE TABLE {_ident(table)} ({', '.join(cols)})"


def stage_dataframe(df: DataFrame, conninfo: dict, staging_table: str) -> None:
    """K2/K3 over the wire: (re)create the staging table driver-side,
    then COPY each Spark partition through its OWN connection inside
    ``foreachPartition`` — the parallel executor-side load
    ``df.write.jdbc`` would do, on Postgres's bulk path instead of
    row INSERTs. ``conninfo`` is a plain picklable dict of
    :class:`PgWireClient` kwargs."""
    with PgWireClient(**conninfo) as c:
        c.execute(f"DROP TABLE IF EXISTS {_ident(staging_table)}")
        c.execute(staging_ddl(df, staging_table))
    cols = list(df.columns)
    ts_idx = timestamp_field_indexes(df.schema)
    copy_sql = (
        f"COPY {_ident(staging_table)} "
        f"({', '.join(_ident(c) for c in cols)}) FROM STDIN"
    )

    def _load(rows) -> None:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return  # empty partition: don't open a connection for nothing
        from itertools import chain

        with PgWireClient(**conninfo) as conn:
            conn.copy_in(
                copy_sql,
                (copy_line(r, len(cols), ts_idx) for r in chain([first], it)),
            )

    df.foreachPartition(_load)


def copy_unescape(s: str) -> str | None:
    """One COPY text field back to its value: ``\\N`` -> SQL NULL,
    backslash escapes unwound (inverse of :func:`copy_field`, plus the
    control escapes the server may emit)."""
    if s == "\\N":
        return None
    if "\\" not in s:
        return s
    out = []
    i, n = 0, len(s)
    esc = {"\\": "\\", "t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f", "v": "\v"}
    while i < n:
        ch = s[i]
        if ch == "\\" and i + 1 < n and s[i + 1] in esc:
            out.append(esc[s[i + 1]])
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


_SPARK_TYPES = {
    "text": "string",
    "character varying": "string",
    "character": "string",
    "integer": "int",
    "bigint": "bigint",
    "smallint": "smallint",
    "real": "float",
    "double precision": "double",
    # "numeric" is handled in fetch_table_fields: constrained
    # NUMERIC(p,s) maps to the exact decimal(p,s); unconstrained
    # NUMERIC falls back to decimal(38,18) (Spark's own JDBC default)
    "boolean": "boolean",
    "date": "date",
    "timestamp without time zone": "timestamp_ntz",
    "timestamp with time zone": "timestamp",
}


def _ident(name: str) -> str:
    """POSTGRES SQL identifier, ALWAYS double-quoted (embedded quotes
    doubled): exact-name semantics with no case folding, and reserved
    words stay column references (an unquoted column named ``user``
    would silently evaluate the SQL function instead — wrong data, no
    error). Callers pass catalog-exact names, the same contract the
    information_schema lookup already imposes. This helper serves ONE
    dialect — the SQL sent over the wire. Spark-side schemas are built
    as a StructType (:func:`_spark_struct`), never as a DDL string, so
    the two engines' quoting rules can't cross-contaminate (the r7
    bug: double-quoted identifiers in a Spark DDL string are a
    ParseException)."""
    return '"' + name.replace('"', '""') + '"'


def _spark_struct(fields: list[tuple[str, str]]):
    """Spark schema for ``read_postgres`` built programmatically —
    field names go in verbatim, no SQL-dialect quoting involved."""
    from pyspark.sql import types as T

    atom = {
        "string": T.StringType(),
        "int": T.IntegerType(),
        "bigint": T.LongType(),
        "smallint": T.ShortType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "boolean": T.BooleanType(),
        "date": T.DateType(),
        "timestamp": T.TimestampType(),
        "timestamp_ntz": T.TimestampNTZType(),
    }

    def one(t: str):
        if t.startswith("decimal("):
            p, s = t[len("decimal(") : -1].split(",")
            return T.DecimalType(int(p), int(s))
        return atom[t]

    return T.StructType(
        [T.StructField(n, one(t), nullable=True) for n, t in fields]
    )


def copy_rows_to_pandas(raw: list[list[str | None]], fields: list[tuple[str, str]]):
    """Parsed COPY-text rows (post :func:`copy_unescape`) into a typed
    pandas frame per the Spark-type tags in ``fields`` — nullable
    extension dtypes for integrals/booleans so NULLs survive without
    a float round-trip."""
    import datetime

    import pandas as pd

    names = [f[0] for f in fields]
    data = {}
    for j, (name, t) in enumerate(fields):
        col = [r[j] for r in raw]
        if t in ("int", "bigint", "smallint"):
            width = {"int": "Int32", "bigint": "Int64", "smallint": "Int16"}[t]
            data[name] = pd.array(
                [None if v is None else int(v) for v in col], dtype=width
            )
        elif t in ("float", "double"):
            data[name] = pd.array(
                [None if v is None else float(v) for v in col],
                dtype="float64" if t == "double" else "float32",
            )
        elif t.startswith("decimal("):
            import decimal

            # exact: COPY text -> Decimal, never through a float.
            # Arrow converts the object column to decimal128(p,s) per
            # the declared schema; an out-of-envelope value (possible
            # only on the unconstrained-NUMERIC fallback) raises there
            # instead of rounding silently.
            data[name] = pd.Series(
                [None if v is None else decimal.Decimal(v) for v in col],
                dtype="object",
            )
        elif t == "boolean":
            data[name] = pd.array(
                [None if v is None else v == "t" for v in col],
                dtype="boolean",
            )
        elif t == "date":
            data[name] = [
                None if v is None else datetime.date.fromisoformat(v)
                for v in col
            ]
        elif t == "timestamp":
            # timestamptz text carries the server's session-TZ offset,
            # which changes across DST — utc=True normalizes (without
            # it, mixed offsets take pandas' object-dtype path today
            # and raise ValueError on pandas 3)
            data[name] = pd.to_datetime(pd.Series(col, dtype="object"), utc=True)
        elif t.startswith("timestamp"):  # timestamp_ntz: naive
            data[name] = pd.to_datetime(pd.Series(col, dtype="object"))
        else:
            data[name] = pd.Series(col, dtype="object")
    return pd.DataFrame(data, columns=names)


def copy_out_pandas_batches(
    conn: PgWireClient, sql: str, fields: list[tuple[str, str]], batch_rows: int = 20_000
):
    """Stream a ``COPY ... TO STDOUT`` statement as typed pandas
    frames of at most ``batch_rows`` rows — the shared scan kernel
    under both ``read_postgres`` (mapInPandas) and the registered
    ``pgwire`` DataSource (arrow batches)."""
    rows: list[list[str | None]] = []
    for line in conn.copy_out(sql):
        rows.append([copy_unescape(f) for f in line.decode().split("\t")])
        if len(rows) >= batch_rows:
            yield copy_rows_to_pandas(rows, fields)
            rows = []
    if rows:
        yield copy_rows_to_pandas(rows, fields)


def fetch_table_fields(
    c: PgWireClient, table: str, columns: list[str] | None = None
) -> list[tuple[str, str]]:
    """``(column, spark_type)`` pairs for ``table`` in the
    connection's current schema, in ordinal order (or the caller's
    projection order when ``columns`` is given — positional consumers
    must not get table ordinal order). NUMERIC(p,s) maps to the exact
    ``decimal(p,s)``; unconstrained NUMERIC (no typmod — Postgres
    stores it with unbounded precision) has no lossless Spark type, so
    it falls back to ``decimal(38,18)``, the same default Spark's JDBC
    source applies; values outside that envelope fail the COPY parse
    loudly rather than rounding silently."""
    cols_sql = (
        "SELECT column_name, data_type, numeric_precision, numeric_scale "
        "FROM information_schema.columns "
        f"WHERE table_name = '{table.replace(chr(39), chr(39) * 2)}' "
        # scope to the connection's schema: a same-named table in
        # another schema would interleave foreign columns into the
        # inferred field list
        "AND table_schema = current_schema() "
        "ORDER BY ordinal_position"
    )
    _, meta = c.query(cols_sql)
    if not meta:
        raise ValueError(f"table {table!r} not found in information_schema")
    fields = []
    for name, dtype, prec, scale in meta:
        if dtype == "numeric":
            p = None if prec is None else int(prec)
            s_ = 0 if scale is None else int(scale)
            # exact mapping only for typmods Spark's DecimalType can
            # express: PG 15+ allows negative scale and scale >
            # precision (numeric(5,-2), numeric(2,5)); those fall back
            # to the same documented envelope as unconstrained NUMERIC
            # instead of building an invalid Spark type
            if p is not None and 0 <= s_ <= p <= 38:
                fields.append((name, f"decimal({p},{s_})"))
            else:
                fields.append((name, "decimal(38,18)"))
        else:
            fields.append((name, _SPARK_TYPES.get(dtype, "string")))
    if columns is not None:
        by_name = {f[0]: f for f in fields}
        missing = [x for x in columns if x not in by_name]
        if missing:
            raise ValueError(f"unknown columns {missing} on {table!r}")
        fields = [by_name[x] for x in columns]
    return fields


def range_clauses(
    c: PgWireClient,
    table: str,
    partition_col: str | None,
    num_partitions: int,
    predicate: str | None,
) -> list[str]:
    """The JDBC-source range split: ``num_partitions`` strided
    [min, max] slices of ``partition_col`` (numeric), first/last
    unbounded, NULL keys riding the first range, the user predicate
    parenthesized into every slice (a top-level OR would bind tighter
    than intended and duplicate rows across slices)."""
    pred = f"({predicate})" if predicate else None
    clauses = [pred or "TRUE"]
    if partition_col is not None and num_partitions > 1:
        pc = _ident(partition_col)
        base = f" FROM {_ident(table)} WHERE {pred or 'TRUE'}"
        _, mm = c.query(f"SELECT min({pc}), max({pc}){base}")
        lo_s, hi_s = mm[0]
        if lo_s is not None and hi_s is not None:
            lo, hi = float(lo_s), float(hi_s)
            n = num_partitions
            stride = (hi - lo) / n
            if stride > 0:
                bounds = [lo + stride * i for i in range(1, n)]
                clauses = []
                for i in range(n):
                    parts = [pred] if pred else []
                    if i == 0:
                        # first range is lower-unbounded and owns NULL
                        # partition keys (Spark JDBC drops them;
                        # dropping rows is never ok here)
                        parts.append(f"({pc} < {bounds[0]!r} OR {pc} IS NULL)")
                    elif i == n - 1:
                        parts.append(f"{pc} >= {bounds[i - 1]!r}")
                    else:
                        parts.append(
                            f"{pc} >= {bounds[i - 1]!r} AND {pc} < {bounds[i]!r}"
                        )
                    clauses.append(" AND ".join(parts))
    return clauses


def read_postgres(
    spark,
    conninfo: dict,
    table: str,
    partition_col: str | None = None,
    num_partitions: int = 8,
    columns: list[str] | None = None,
    predicate: str | None = None,
) -> DataFrame:
    """Partitioned Postgres SOURCE over the same wire: the
    ``spark.read.jdbc(partitionColumn=...)`` execution model, each
    partition streaming its key-range slice via ``COPY (SELECT ...) TO
    STDOUT`` (the server's bulk path — the reference itself moves bulk
    rows as COPY text, load.py:96) from an executor task.

    - schema from ``information_schema.columns`` (one driver query),
      PG types mapped to Spark types (NUMERIC(p,s) -> exact
      DecimalType(p,s); unconstrained NUMERIC -> decimal(38,18)
      fallback, Spark's own JDBC default);
    - ``partition_col`` (numeric) splits [min, max] into
      ``num_partitions`` strided ranges exactly like Spark's JDBC
      source — first/last ranges unbounded so concurrent inserts
      outside the sampled bounds are not silently dropped; rows with
      NULL in the partition column ride the first range;
    - no ``partition_col`` -> one partition (small dims);
    - ``predicate`` is pushed into every slice's WHERE.

    At 100 TB-adjacent scale the real limit is the server: this is for
    the reference deployment's OPERATIONAL table (millions of rows,
    the other end of the merge sink), not a data lake — parallelism
    bounded by ``num_partitions`` server connections, each a single
    sequential COPY stream."""
    with PgWireClient(**conninfo) as c:
        fields = fetch_table_fields(c, table, columns)
        clauses = range_clauses(c, table, partition_col, num_partitions, predicate)

    names = [f[0] for f in fields]
    sel = ", ".join(_ident(n) for n in names)
    tbl = _ident(table)
    schema = _spark_struct(fields)

    def _scan(batches):
        for pdf in batches:
            for clause in pdf["clause"]:
                with PgWireClient(**conninfo) as conn:
                    yield from copy_out_pandas_batches(
                        conn,
                        f"COPY (SELECT {sel} FROM {tbl} WHERE {clause}) TO STDOUT",
                        fields,
                    )

    # exactly ONE clause per task: parallelize with numSlices == len
    # deterministically places one element in each slice, so the n
    # COPY streams run simultaneously. (repartition(n) round-robins
    # from a random start — two ranges can share a task while another
    # idles, halving effective parallelism with no correctness signal.)
    ranges = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(cl,) for cl in clauses], numSlices=len(clauses)
        ),
        "clause string",
    )
    return ranges.mapInPandas(_scan, schema=schema)


def merge_via_pgwire(
    df: DataFrame,
    conninfo: dict,
    target_table: str = "nypd_arrests",
    staging_table: str = "nypd_arrests_staging",
    key: str = "arrest_key",
) -> int:
    """Full K2+K4 against a live Postgres socket: parallel COPY
    staging, then the reference's set-based ``INSERT ... ON CONFLICT
    (key) DO NOTHING`` merge (with its domain guards) executed once
    driver-side — the same ``merge_via_staging`` seam the DuckDB twin
    drives, now ending at the real wire. Returns the inserted
    rowcount (reference metric, load.py:151-155)."""
    from .jdbc import merge_via_staging

    # Same guard as PgWireWriter.commit: staging is recreated with
    # TIMESTAMPTZ for instants, but a PRE-EXISTING target whose instant
    # column is naive TIMESTAMP would silently cast via the server's
    # session TimeZone during the staging->target merge. Fail loudly
    # BEFORE any rows move.
    ts_idx = timestamp_field_indexes(df.schema)
    if ts_idx:
        from ..sources.pg_source import _check_instant_columns

        with PgWireClient(**conninfo) as c:
            _check_instant_columns(c, target_table, list(df.columns), ts_idx)

    def _stage(d: DataFrame, table: str) -> None:
        stage_dataframe(d, conninfo, table)

    def _execute(sql: str) -> int:
        with PgWireClient(**conninfo) as c:
            return c.execute(sql)

    return merge_via_staging(df, _stage, _execute, target_table, staging_table, key)
