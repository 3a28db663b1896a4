"""Registered Spark Python DataSource over the stdlib Postgres wire
client: ``spark.read.format("pgwire")`` / ``df.write.format("pgwire")``.

The function API (:func:`~nypd_arrest_etl_spark.sinks.pgwire.read_postgres`,
``stage_dataframe``/``merge_via_pgwire``) stays the programmatic
surface; this DataSource makes the same wire paths first-class in
Spark's own source registry, and adds what only the DataSource API
can express:

- **Catalyst filter pushdown** (``pushFilters``, OPT-IN via
  ``option("pushdown", "true")``): comparison / In / IsNull / NOT /
  LIKE-prefix filters compile to Postgres WHERE clauses evaluated
  server-side, so the COPY stream never carries the filtered-out
  rows. String ordering comparisons are pushed with ``COLLATE "C"``
  — byte order of UTF-8 — which is exactly Spark's binary string
  comparison, so pushed filters are EXACT (never returned for
  recheck) and rows are filtered once, not twice.

  Why opt-in: Spark 4.1's Python-source planner re-runs pushdown for
  every FILTERED query, but a FILTERLESS query on the same loaded
  DataFrame object reuses the most recently planned scan — including
  its pushed predicate — so ``df.filter(x).count(); df.count()``
  silently returns the filtered count twice (verified empirically;
  the partitions and pickled reader are cached JVM-side per relation
  and only refreshed when there are filters to push). Until that
  plan-reuse is fixed upstream, pushdown is only safe when each
  ``load()`` feeds one query shape — the normal ETL pattern — so it
  must be requested explicitly. ``tests/test_pgwire.py`` carries a
  canary test pinned to the wrong-result shape: when a Spark upgrade
  fixes the reuse, the canary fails, signalling the default can flip.
  A minimal self-contained repro (no repo imports, no server —
  suitable for filing upstream) lives at
  ``tools/repro_python_source_plan_reuse.py``: exit 2 = reproduced,
  exit 0 = fixed.
- **Arrow-batch reads**: each partition yields ``pyarrow.RecordBatch``
  directly (the documented fast path for Python sources), built
  against the exact arrow schema Spark derives from the declared
  StructType.
- **Two streaming readers**: the default
  :class:`PgWireStreamReader` (simple contract: driver-staged
  microbatches, any orderable watermark type) and the opt-in
  :class:`PgWirePartitionedStreamReader`
  (``option("streamPartitions", n)``): each microbatch's watermark
  range splits into n sub-ranges COPYing on EXECUTORS as arrow
  batches — flat driver memory for large backlogs; numeric, decimal,
  date and timestamp watermarks all plan (epoch/ordinal axis).
- **Exactly-once writes under task retries**: each write task COPYs
  into its OWN uniquely-named staging table and reports it in the
  commit message; the driver merges only the staging tables of tasks
  Spark declared successful, in one transaction, then drops every
  table under the run prefix (including orphans from failed/retried
  attempts). A plain per-partition COPY-append (what ``foreachPartition``
  gives you) would duplicate rows when a task retries after a partial
  COPY commit; this is the same staged-commit idea the repo's manifest
  format uses for files, applied to tables.

Reference anchor: the reference's one external system is this
Postgres database (load.py:86-159 writes it with psycopg2 COPY +
ON CONFLICT). This module is the Spark-native source/sink pair for
that same operational table.

Scale notes: parallelism is bounded by ``numPartitions`` server
connections, each one sequential COPY stream — the right model for an
OPERATIONAL table (millions of rows), not a data lake. The read path
plans one range clause per input partition (strided [min,max] like
``spark.read.jdbc``); the write path opens one connection per Spark
partition. Pushdown happens before the stream leaves the server, so
a selective filter costs the server an index scan instead of costing
the cluster a full-table transfer.
"""

from __future__ import annotations

import datetime
import decimal
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    SimpleDataSourceStreamReader,
    StringContains,
    StringEndsWith,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from ..sinks.pgwire import (
    PgWireClient,
    _ident,
    _spark_struct,
    copy_line,
    copy_out_pandas_batches,
    copy_unescape,
    fetch_table_fields,
    pg_type_for,
    range_clauses,
    timestamp_field_indexes,
)

# ---------------------------------------------------------------------------
# options
# ---------------------------------------------------------------------------


def _conninfo(options: dict) -> dict:
    host = options.get("host")
    if not host:
        raise ValueError("pgwire source requires option 'host'")
    info = {
        "host": host,
        "port": int(options.get("port", 5432)),
        "user": options.get("user", "postgres"),
        "database": options.get("database", "postgres"),
    }
    if options.get("password") is not None:
        info["password"] = options.get("password")
    return info


def _table(options: dict) -> str:
    table = options.get("table")
    if not table:
        raise ValueError("pgwire source requires option 'table'")
    return table


# ---------------------------------------------------------------------------
# filter compilation (read pushdown)
# ---------------------------------------------------------------------------


def _pg_literal(v) -> str | None:
    """One Python filter value as a Postgres literal; None when the
    value has no safe rendering (the filter then stays Spark-side).
    String literals assume ``standard_conforming_strings=on`` (the
    server default since 9.1): backslashes are literal, only quotes
    double."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if v != v or v in (float("inf"), float("-inf")):
            return None  # NaN/inf ordering differs across engines
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        # tz-aware (Spark delivers TimestampType filter values as UTC
        # aware datetimes) MUST render TIMESTAMPTZ: a plain TIMESTAMP
        # literal silently DROPS the offset, so the comparison would
        # use the server session TimeZone — wrong rows, no error
        kind = "TIMESTAMPTZ" if v.tzinfo is not None else "TIMESTAMP"
        return f"{kind} '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, str):
        if "\0" in v:
            return None  # NUL can't cross the text protocol
        return "'" + v.replace("'", "''") + "'"
    return None


def _like_escape(s: str) -> str:
    """Escape LIKE metacharacters so the value matches literally
    (backslash is the default LIKE escape character)."""
    return s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")


def _cmp_operand(col: str, v) -> str:
    """The column reference for an ORDERING comparison against ``v``.
    Spark compares strings by unsigned UTF-8 byte order; Postgres's
    default collation may not (en_US sorts case-insensitively), so
    string comparisons pin ``COLLATE "C"`` — byte order — making the
    pushed predicate EXACTLY Spark's semantics."""
    if isinstance(v, str):
        return f'({_ident(col)} COLLATE "C")'
    return _ident(col)


def _filter_to_pg(flt: Filter) -> str | None:
    """Compile one Catalyst filter to a Postgres predicate with
    Spark-identical semantics, or None if unsupported (nested column,
    exotic operator, unrenderable literal)."""
    if isinstance(flt, Not):
        inner = _filter_to_pg(flt.child)
        # SQL three-valued logic matches Spark's: NOT(NULL) is NULL,
        # and WHERE keeps only TRUE — same rows survive either engine
        return None if inner is None else f"NOT ({inner})"
    attr = getattr(flt, "attribute", None)
    if attr is None or len(attr) != 1:
        return None
    col = attr[0]
    ops = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }
    for klass, op in ops.items():
        if isinstance(flt, klass):
            lit = _pg_literal(flt.value)
            if lit is None or flt.value is None:
                return None
            return f"{_cmp_operand(col, flt.value)} {op} {lit}"
    if isinstance(flt, EqualNullSafe):
        lit = _pg_literal(flt.value)
        if lit is None:
            return None
        return f"{_ident(col)} IS NOT DISTINCT FROM {lit}"
    if isinstance(flt, In):
        vals = flt.value  # the API field is `value`: a sequence
        lits = [_pg_literal(v) for v in vals]
        if not lits or any(x is None for x in lits) or any(v is None for v in vals):
            return None
        return f"{_ident(col)} IN ({', '.join(lits)})"
    if isinstance(flt, IsNull):
        return f"{_ident(col)} IS NULL"
    if isinstance(flt, IsNotNull):
        return f"{_ident(col)} IS NOT NULL"
    # LIKE over text with COLLATE "C" is byte-wise pattern matching —
    # exactly Spark's startswith/endswith/contains
    if isinstance(flt, StringStartsWith):
        pat = _pg_literal(_like_escape(str(flt.value)) + "%")
        return None if pat is None else f'({_ident(col)} COLLATE "C") LIKE {pat}'
    if isinstance(flt, StringEndsWith):
        pat = _pg_literal("%" + _like_escape(str(flt.value)))
        return None if pat is None else f'({_ident(col)} COLLATE "C") LIKE {pat}'
    if isinstance(flt, StringContains):
        pat = _pg_literal("%" + _like_escape(str(flt.value)) + "%")
        return None if pat is None else f'({_ident(col)} COLLATE "C") LIKE {pat}'
    return None


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


@dataclass
class RangePartition(InputPartition):
    clause: str


class PgWireReader(DataSourceReader):
    """Base reader WITHOUT ``pushFilters`` — merely implementing the
    method makes the source unusable in sessions where
    ``spark.sql.python.filterPushdown.enabled`` is false (Spark's
    default), and exposes the plan-reuse hazard documented in the
    module docstring. :class:`PgWirePushdownReader` adds it when the
    caller opts in."""

    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._options = options
        self._conninfo = _conninfo(options)
        self._table = _table(options)
        self._partition_col = options.get("partitioncolumn")
        self._num_partitions = int(options.get("numpartitions", 1))
        self._predicate: str | None = options.get("predicate")

    # -- planning (driver) ------------------------------------------------
    def partitions(self):
        with PgWireClient(**self._conninfo) as c:
            clauses = range_clauses(
                c,
                self._table,
                self._partition_col,
                self._num_partitions,
                self._predicate,
            )
        return [RangePartition(clause=cl) for cl in clauses]

    # -- execution (one COPY stream per task) ------------------------------
    def read(self, partition: RangePartition):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        fields = [(f.name, f.dataType.simpleString()) for f in self._schema.fields]
        sel = ", ".join(_ident(n) for n, _t in fields)
        arrow_schema = to_arrow_schema(self._schema)
        sql = (
            f"COPY (SELECT {sel} FROM {_ident(self._table)} "
            f"WHERE {partition.clause}) TO STDOUT"
        )
        with PgWireClient(**self._conninfo) as conn:
            for pdf in copy_out_pandas_batches(conn, sql, fields):
                yield pa.RecordBatch.from_pandas(
                    pdf, schema=arrow_schema, preserve_index=False
                )


class PgWirePushdownReader(PgWireReader):
    """Opt-in Catalyst filter pushdown (``option("pushdown", "true")``)
    — see the module docstring for why this is not the default."""

    def __init__(self, schema: StructType, options: dict):
        super().__init__(schema, options)
        self._user_predicate = self._predicate

    def pushFilters(self, filters):  # noqa: N802 (API name)
        # The user's option("predicate", ...) is kept apart from the
        # pushed clauses and the combined predicate is rebuilt from
        # scratch on every call: if Spark ever re-plans and invokes
        # pushFilters twice on the same reader instance, a cumulative
        # fold would leave the earlier query's clauses ANDed in and
        # silently drop rows for the later one.
        clauses = [f"({self._user_predicate})"] if self._user_predicate else []
        unsupported = []
        for flt in filters:
            sql = _filter_to_pg(flt)
            if sql is None:
                unsupported.append(flt)  # Spark evaluates it post-scan
            else:
                # not returned: COLLATE "C" pinning makes the pushed
                # predicate exactly Spark's semantics, so no recheck
                clauses.append(f"({sql})")
        self._predicate = " AND ".join(clauses) if clauses else self._user_predicate
        return unsupported


# ---------------------------------------------------------------------------
# streaming reader (high-watermark offsets)
# ---------------------------------------------------------------------------


def _parse_value(v: str | None, t: str):
    """One COPY text field to the Python value for Spark-type tag ``t``."""
    if v is None:
        return None
    if t in ("int", "bigint", "smallint"):
        return int(v)
    if t in ("float", "double"):
        return float(v)
    if t.startswith("decimal("):
        return decimal.Decimal(v)  # exact, never through a float
    if t == "boolean":
        return v == "t"
    if t == "date":
        return datetime.date.fromisoformat(v)
    if t.startswith("timestamp"):
        return datetime.datetime.fromisoformat(v)
    return v


_WM_PG_CAST = {
    "int": "INTEGER",
    "bigint": "BIGINT",
    "smallint": "SMALLINT",
    "float": "REAL",
    "double": "DOUBLE PRECISION",
}


def _wm_literal(text: str, t: str) -> str:
    """The checkpointed watermark TEXT value as a SQL literal CAST to
    the watermark column's own type. The cast matters for floats: a
    bare decimal constant is float8, so a REAL column's max value can
    compare strictly GREATER than its own float8 rendering — the
    boundary row would fail ``w <= end`` forever. Date/timestamp
    values quote; Postgres casts them to the column type natively."""
    if t.startswith("decimal("):
        d = decimal.Decimal(text)  # raises on anything that isn't a number
        if not d.is_finite():
            # Postgres NUMERIC admits NaN (always) and Infinity (14+):
            # same silent-stall failure mode as the float specials
            raise ValueError(
                f"non-finite watermark value {text!r}: a NaN/Infinity "
                "row in the watermark column cannot order a stream — "
                "clean the column or use a serial key"
            )
        return f"CAST({text} AS NUMERIC{t[len('decimal'):]})"
    if t in _WM_PG_CAST:
        import math

        v = float(text)  # raises on anything that isn't a number
        if not math.isfinite(v):
            # PG renders float8 specials as NaN/Infinity — raw text
            # would be invalid SQL, and a quoted 'NaN'::float8 sorts
            # ABOVE every real so the stream would stall silently at
            # it forever. Fail loudly BEFORE the offset is committed.
            raise ValueError(
                f"non-finite watermark value {text!r}: a NaN/Infinity "
                "row in the watermark column cannot order a stream — "
                "clean the column or use a serial key"
            )
        return f"CAST({text} AS {_WM_PG_CAST[t]})"
    if t == "date" or t.startswith("timestamp"):
        if text.strip().lower().lstrip("+-") in ("infinity", "inf"):
            # Postgres date/timestamp columns admit the special values
            # 'infinity'/'-infinity'; max(w) returning infinity makes
            # "w > infinity" never true, so the stream would stall at
            # it silently forever — same failure mode as float NaN.
            raise ValueError(
                f"non-finite watermark value {text!r}: an infinity "
                "row in the watermark column cannot order a stream — "
                "clean the column or use a serial key"
            )
        return "'" + text.replace("'", "''") + "'"
    raise TypeError(f"watermark column must be numeric/date/timestamp, not {t!r}")


class PgWireStreamReader(SimpleDataSourceStreamReader):
    """The reference's high-watermark incremental extract
    (extract.py:60-64: ``$where arrest_date > hwm``) as a REAL
    streaming offset over the operational table: the offset is the
    watermark column's last-seen value, persisted by Spark in the
    checkpointLocation; each microbatch pulls ``w > last AND w <=
    current`` over one COPY stream, and crash recovery replays the
    exact closed range via ``readBetweenOffsets``. Paired with the
    exactly-once ``manifest_table`` sink this gives end-to-end
    exactly-once Postgres -> lake ingestion.

    Options: ``watermarkColumn`` — STRICTLY INCREASING per commit and
    NOT NULL (a serial/identity key). A merely non-decreasing column
    (updated_at) LOSES rows: a row committing late with a watermark
    tied to an already-read offset lands behind ``w > last`` and is
    never streamed, and late ties make ``readBetweenOffsets`` replay
    non-deterministic. NULL-watermark rows are never streamed.
    ``maxRowsPerBatch`` (backlog bound: the batch end-watermark is the
    max of the first N ordered rows, so one trigger can't swallow an
    unbounded backlog; value-tied boundary rows already visible ride
    along, keeping ranges closed under replay), ``startingOffset`` =
    earliest (default: stream the whole table then increments) |
    latest (only rows after stream start).

    SIZING (measured in PGWIRE_BENCH.md): Spark's
    ``SimpleDataSourceStreamReader`` contract materializes every
    microbatch as a Python list ON THE DRIVER before distribution, so
    ``maxRowsPerBatch`` is a DRIVER-memory bound (rows × row width vs
    driver heap), not a task split — and each drain pays a fixed
    startup + max(w) probe cost, so catch-up throughput scales almost
    linearly with batch size (22k rows/s at 100k vs 5k rows/s at 10k
    on the bench host). Use the largest batch the driver can hold for
    backlog catch-up; for bulk history loads prefer the batch path
    (:func:`~nypd_arrest_etl_spark.sinks.pgwire.read_postgres`,
    executor-side COPY) and start the stream from the high watermark."""

    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._conninfo = _conninfo(options)
        self._table = _table(options)
        wm = options.get("watermarkcolumn")
        if not wm:
            raise ValueError("pgwire streaming requires option 'watermarkColumn'")
        self._fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        by_name = dict(self._fields)
        if wm not in by_name:
            raise ValueError(f"watermarkColumn {wm!r} not in schema {list(by_name)}")
        self._wm, self._wm_type = wm, by_name[wm]
        ordered = ("int", "bigint", "smallint", "float", "double", "date")
        if (
            self._wm_type not in ordered
            and not self._wm_type.startswith("timestamp")
            and not self._wm_type.startswith("decimal(")
        ):
            raise TypeError(
                f"watermarkColumn must be numeric/date/timestamp, "
                f"got {wm!r}: {self._wm_type}"
            )
        self._max_rows = int(options.get("maxrowsperbatch", 100_000))
        if self._max_rows < 1:
            # LIMIT 0 would return NULL for every max() probe — a
            # stream that silently never emits while a backlog waits
            raise ValueError("maxRowsPerBatch must be >= 1")
        self._starting = str(options.get("startingoffset", "earliest")).lower()
        if self._starting not in ("earliest", "latest"):
            # a typo ('lastest') would silently re-stream the whole
            # operational table — the opposite of what was asked
            raise ValueError(
                f"startingOffset must be 'earliest' or 'latest', "
                f"got {self._starting!r}"
            )

    def initialOffset(self) -> dict:
        if self._starting == "latest":
            with PgWireClient(**self._conninfo) as c:
                _, mm = c.query(
                    f"SELECT max({_ident(self._wm)}) FROM {_ident(self._table)}"
                )
            return {"w": mm[0][0]}
        return {"w": None}

    def _bounds_sql(self, last: str | None, end: str | None) -> str:
        w = _ident(self._wm)
        parts = []
        if last is not None:
            parts.append(f"{w} > {_wm_literal(last, self._wm_type)}")
        if end is not None:
            parts.append(f"{w} <= {_wm_literal(end, self._wm_type)}")
        return " AND ".join(parts) or "TRUE"

    def _fetch(self, c: PgWireClient, last: str | None, end: str | None) -> list:
        sel = ", ".join(_ident(n) for n, _t in self._fields)
        sql = (
            f"COPY (SELECT {sel} FROM {_ident(self._table)} "
            f"WHERE {self._bounds_sql(last, end)}) TO STDOUT"
        )
        out = []
        for line in c.copy_out(sql):
            raw = [copy_unescape(f) for f in line.decode().split("\t")]
            out.append(
                tuple(_parse_value(v, t) for v, (_n, t) in zip(raw, self._fields))
            )
        return out  # a LIST: the prefetch cache replays it (rest.py note)

    def _probe_end(self, c: PgWireClient, last: str | None) -> str | None:
        """Batch end-watermark = max of the first maxRowsPerBatch
        ordered rows past ``last`` (bounds the batch without OFFSET
        scans, stays exact under boundary ties). The ONE probe both
        stream readers share. The returned value is VALIDATED through
        :func:`_wm_literal` before anything checkpoints it: a
        NaN/Infinity watermark must fail loudly HERE — once a poisoned
        offset reaches Spark's offset WAL every restart replays it and
        the stream is wedged until checkpoint surgery."""
        w = _ident(self._wm)
        cond = self._bounds_sql(last, None)
        _, mm = c.query(
            f"SELECT max({w}) FROM (SELECT {w} FROM {_ident(self._table)} "
            f"WHERE {cond} ORDER BY {w} LIMIT {self._max_rows}) s"
        )
        end = mm[0][0]
        if end is not None:
            _wm_literal(end, self._wm_type)  # validation only
        return end

    def read(self, start: dict):
        last = start.get("w")
        with PgWireClient(**self._conninfo) as c:
            end = self._probe_end(c, last)
            # the wrapper REQUIRES an iterator (it calls next() to
            # validate the caught-up case) over a materialized list
            # (the prefetch cache copy.copy()s it for replay)
            if end is None:
                return iter([]), start  # caught up: poll next trigger
            return iter(self._fetch(c, last, end)), {"w": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        lo, hi = start.get("w"), end.get("w")
        if hi is None:
            return iter([])
        with PgWireClient(**self._conninfo) as c:
            return iter(self._fetch(c, lo, hi))


# ---------------------------------------------------------------------------
# partitioned streaming reader (executor-side COPY; opt-in)
# ---------------------------------------------------------------------------


@dataclass
class WmRangePartition(InputPartition):
    """One watermark sub-range of a microbatch: ``w > lo AND w <= hi``
    (lo None = lower-unbounded). Bounds travel as the CHECKPOINTED
    TEXT the offsets use, rendered through :func:`_wm_literal` on the
    executor so boundary typing matches the simple reader exactly."""

    lo: str | None
    hi: str


def _wm_axis(t: str):
    """``(parse, render)`` putting a watermark type on an
    interpolatable float axis for sub-range planning: numerics map to
    themselves, dates to day ordinals, timestamps to epoch seconds
    (naive values pinned to UTC — parse/render stay a consistent
    wall-time identity, and Postgres coerces the rendered literal to
    the column's own type, discarding any offset for naive columns).
    Interior cut points only need parse(render(x)) ~= x and rendered
    text identical on BOTH sides of each cut; the outer bounds stay
    the exact checkpointed text."""
    if t == "date":
        return (
            lambda s: float(datetime.date.fromisoformat(s).toordinal()),
            lambda f: datetime.date.fromordinal(round(f)).isoformat(),
        )
    if t.startswith("timestamp"):

        def parse(s: str) -> float:
            d = datetime.datetime.fromisoformat(s)
            if d.tzinfo is None:
                d = d.replace(tzinfo=datetime.timezone.utc)
            return d.timestamp()

        def render(f: float) -> str:
            return datetime.datetime.fromtimestamp(
                f, datetime.timezone.utc
            ).isoformat(sep=" ")

        return parse, render
    return float, repr


class PgWirePartitionedStreamReader(DataSourceStreamReader):
    """Opt-in partition-planning streaming source
    (``option("streamPartitions", n)``): same watermark-offset
    semantics as :class:`PgWireStreamReader`, but each microbatch's
    closed range (last, end] is split into ``n`` watermark sub-ranges
    and every sub-range COPYs on an EXECUTOR, yielding arrow batches —
    no driver-side row materialization at all (the
    SimpleDataSourceStreamReader contract stages every batch as a
    Python list on the driver; see the sizing note on the simple
    reader). Use this when backlogs are large: catch-up throughput
    becomes ``n`` concurrent COPY streams and driver memory stays
    flat regardless of batch size.

    Constraints vs the simple reader:

    - ``maxRowsPerBatch`` still bounds a batch via the ordered-probe,
      but after a RESTART the first planned batch is unbounded (the
      fresh reader instance has no last-offset memory until Spark
      hands it one through partitions()/commit(); correctness is
      unaffected — ranges stay closed — only that one batch's size).
    - Replay safety: partitions(start, end) is a pure function of the
      offsets, so a crash-replayed batch re-plans the identical closed
      sub-ranges (the strictly-increasing watermark contract makes the
      row set deterministic) — the readBetweenOffsets equivalent.
    """

    def __init__(self, schema: StructType, options: dict, n_parts: int):
        # reuse the simple reader's option validation wholesale — it
        # already restricts the watermark to orderable types, and
        # _wm_axis covers all of them (numeric/decimal/date/timestamp)
        self._v = PgWireStreamReader(schema, options)
        if n_parts < 1:
            raise ValueError("streamPartitions must be >= 1")
        self._n = n_parts
        self._conninfo = self._v._conninfo
        self._table = self._v._table
        self._fields = self._v._fields
        self._schema = schema
        self._last: str | None = None  # best-effort batch-size memory
        self._have_last = False

    def initialOffset(self) -> dict:
        off = self._v.initialOffset()
        self._last, self._have_last = off.get("w"), True
        return off

    def latestOffset(self) -> dict:
        with PgWireClient(**self._conninfo) as c:
            if self._have_last:
                end = self._v._probe_end(c, self._last)
            else:
                # fresh instance after restart: no last-offset memory,
                # so the probe is unbounded this once (see class doc)
                w = _ident(self._v._wm)
                _, mm = c.query(
                    f"SELECT max({w}) FROM {_ident(self._table)}"
                )
                end = mm[0][0]
                if end is not None:
                    # validate BEFORE the offset can reach the WAL —
                    # same loud NaN/Infinity guard as the bounded probe
                    _wm_literal(end, self._v._wm_type)
        if end is None and self._have_last:
            return {"w": self._last}  # caught up: offset unchanged
        if end is not None:
            self._last, self._have_last = end, True
        return {"w": end}

    def partitions(self, start: dict, end: dict):
        lo, hi = start.get("w"), end.get("w")
        self._last, self._have_last = hi, True  # authoritative
        if hi is None or lo == hi:
            return []  # empty range: engine planned a no-data batch
        parse, render = _wm_axis(self._v._wm_type)
        lo_f = None if lo is None else parse(lo)
        if lo_f is None:
            # initial (lower-unbounded) batch: interpolate from the
            # table's actual min so history splits evenly — without
            # the probe every historical row would land in the first
            # sub-range and the other n-1 tasks would idle
            w = _ident(self._v._wm)
            with PgWireClient(**self._conninfo) as c:
                _, mm = c.query(f"SELECT min({w}) FROM {_ident(self._table)}")
            lo_f = None if mm[0][0] is None else parse(mm[0][0])
        hi_f = parse(hi)
        n = self._n
        if lo_f is None:
            # min probe saw an emptied table while replaying a planned
            # initial batch: plan one unbounded range instead of
            # crashing on None arithmetic — COPY just returns whatever
            # still satisfies w <= hi (nothing, for a truncated table)
            n = 1
        elif not (hi_f > lo_f):
            n = 1  # zero-width float rendering: one exact range
        bounds: list[str] = []
        if n > 1:
            span = (hi_f - lo_f) / n
            base = lo_f
            seen = set()
            for i in range(1, n):
                b = render(base + span * i)
                # drop duplicate/degenerate cut points (tiny spans):
                # ranges chain on > lo / <= hi so correctness only
                # needs the OUTER bounds exact
                if b not in seen and (lo is None or b != lo) and b != hi:
                    seen.add(b)
                    bounds.append(b)
        cuts = [lo, *bounds, hi]
        return [
            WmRangePartition(lo=cuts[i], hi=cuts[i + 1])
            for i in range(len(cuts) - 1)
        ]

    def read(self, partition: WmRangePartition):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self._schema)
        sel = ", ".join(_ident(nm) for nm, _t in self._fields)
        cond = self._v._bounds_sql(partition.lo, partition.hi)
        sql = (
            f"COPY (SELECT {sel} FROM {_ident(self._table)} "
            f"WHERE {cond}) TO STDOUT"
        )
        with PgWireClient(**self._conninfo) as conn:
            for pdf in copy_out_pandas_batches(conn, sql, self._fields):
                yield pa.RecordBatch.from_pandas(
                    pdf, schema=arrow_schema, preserve_index=False
                )

    def commit(self, end: dict) -> None:
        self._last, self._have_last = end.get("w"), True


# ---------------------------------------------------------------------------
# writer (exactly-once under task retries)
# ---------------------------------------------------------------------------


@dataclass
class PgCommitMessage(WriterCommitMessage):
    staging_table: str


class PgWireWriter(DataSourceWriter):
    """Two-phase table write: tasks COPY into per-attempt staging
    tables; the driver's ``commit`` merges only the attempts Spark
    declared successful, atomically, then sweeps the run prefix. A
    retried task's half-written staging table is swept, never merged
    — COPY-append without staging would double its rows.

    A DRIVER crash between the transaction and the sweep (or before
    commit/abort runs at all) orphans that run's staging tables — no
    later run knows a dead run's prefix. The run prefix embeds the
    wall-clock epoch for exactly this reason: schedule
    :func:`vacuum_staging` (age-bounded, Iceberg's orphan-file idea
    applied to tables) to reclaim them."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        import time

        self._schema = schema
        self._conninfo = _conninfo(options)
        self._table = _table(options)
        self._overwrite = overwrite
        self._run = f"_pgw_{int(time.time())}_{uuid.uuid4().hex[:8]}"
        self._cols = [f.name for f in schema.fields]
        self._ts_cols = timestamp_field_indexes(schema)
        self._ddl_cols = ", ".join(
            f"{_ident(f.name)} {pg_type_for(f)}" for f in schema.fields
        )

    # executor-side: one staging table per task ATTEMPT
    def write(self, rows) -> PgCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        stg = f"{self._run}_{ctx.partitionId()}_{ctx.attemptNumber()}"
        n = _copy_rows_to_staging(
            self._conninfo, stg, self._ddl_cols, self._cols, rows, self._ts_cols
        )
        return PgCommitMessage(staging_table=stg if n is not None else None)

    # driver-side (the pickled instance: batch commit workers restore
    # it with the same _run — unlike the streaming runner, which
    # constructs a fresh writer per commit/abort)
    def commit(self, messages) -> None:
        good = [
            m.staging_table for m in messages if m is not None and m.staging_table
        ]
        col_list = ", ".join(_ident(x) for x in self._cols)
        with PgWireClient(**self._conninfo) as c:
            _check_instant_columns(c, self._table, self._cols, self._ts_cols)
            c.execute("BEGIN")
            try:
                c.execute(
                    f"CREATE TABLE IF NOT EXISTS {_ident(self._table)} "
                    f"({self._ddl_cols})"
                )
                if self._overwrite:
                    c.execute(f"TRUNCATE {_ident(self._table)}")
                for stg in good:
                    c.execute(
                        f"INSERT INTO {_ident(self._table)} ({col_list}) "
                        f"SELECT {col_list} FROM {_ident(stg)}"
                    )
                c.execute("COMMIT")
            except BaseException:
                _rollback_guarded(c)
                raise
            # the merge is DURABLE now: a transient sweep failure must
            # not fail the job — a rerun would insert every row twice
            # (no claim protects the batch path); orphans are
            # vacuum_staging's job anyway
            try:
                self._sweep(c)
            except OSError:  # includes PgError
                pass

    def abort(self, messages) -> None:
        with PgWireClient(**self._conninfo) as c:
            self._sweep(c)

    def _sweep(self, c: PgWireClient) -> None:
        # drop EVERYTHING under the run prefix — committed staging
        # tables and orphans from failed/retried attempts alike.
        # The run prefix's own underscores (_pgw_<epoch>_<hex>) are
        # escaped so they match literally instead of acting as LIKE
        # single-char wildcards (same discipline as the stream writer).
        _sweep_tables(c, self._run.replace("_", "\\_") + "\\_%")

# streaming writer (exactly-once into the operational table)
# ---------------------------------------------------------------------------


COMMITS_TABLE = "pgw_stream_commits"  # deliberately OUTSIDE _pgw_* (vacuum scans it)


def _sweep_tables(c: PgWireClient, like_pattern: str) -> None:
    """Drop every table in the current schema matching ``like_pattern``
    (the ONE sweep implementation both writers share)."""
    _, rows = c.query(
        "SELECT table_name FROM information_schema.tables "
        "WHERE table_schema = current_schema() "
        f"AND table_name LIKE '{like_pattern}'"
    )
    for (name,) in rows:
        c.execute(f"DROP TABLE IF EXISTS {_ident(name)}")


def _rollback_guarded(c: PgWireClient) -> None:
    """ROLLBACK without masking the root cause: if the failure was the
    CONNECTION, the rollback raises too — swallow it so the original
    exception propagates (same contract as copy_in's CopyFail)."""
    try:
        c.execute("ROLLBACK")
    except OSError:  # includes PgError
        pass


def _copy_rows_to_staging(
    conninfo: dict,
    stg: str,
    ddl_cols: str,
    cols: list[str],
    rows,
    ts_idx: frozenset[int],
) -> int | None:
    """Executor-side staging COPY shared by both writers: create the
    per-attempt table and stream the task's rows into it (instant
    columns normalized to explicit-offset UTC — ``ts_idx``). Returns
    the rowcount, or None without touching the server when the
    partition is empty."""
    it = iter(rows)
    try:
        first = next(it)
    except StopIteration:
        return None  # empty partition: no connection, no table
    from itertools import chain

    with PgWireClient(**conninfo) as c:
        c.execute(f"CREATE TABLE {_ident(stg)} ({ddl_cols})")
        return c.copy_in(
            f"COPY {_ident(stg)} ({', '.join(_ident(x) for x in cols)}) "
            "FROM STDIN",
            (copy_line(r, len(cols), ts_idx) for r in chain([first], it)),
        )


def _check_instant_columns(c: PgWireClient, table: str, cols, ts_idx) -> None:
    """Fail LOUDLY if an already-existing target stores an instant
    column as naive TIMESTAMP: the staging->target INSERT would
    implicitly cast TIMESTAMPTZ to the server's session wall time —
    silent, server-config-dependent value shifts (CREATE TABLE IF NOT
    EXISTS tolerates the mismatch, so nothing else would catch it)."""
    if not ts_idx:
        return
    _, rows = c.query(
        "SELECT column_name, data_type FROM information_schema.columns "
        f"WHERE table_name = '{table.replace(chr(39), chr(39) * 2)}' "
        "AND table_schema = current_schema()"
    )
    if not rows:
        return  # target doesn't exist yet: we create it correctly
    types = dict(rows)
    bad = [
        cols[i]
        for i in sorted(ts_idx)
        if types.get(cols[i]) == "timestamp without time zone"
    ]
    if bad:
        raise TypeError(
            f"target {table!r} stores instant column(s) {bad} as naive "
            "TIMESTAMP; writing TIMESTAMPTZ staging into it would shift "
            "values by the server's session TimeZone. Migrate the column "
            "(ALTER ... TYPE timestamptz USING <col> AT TIME ZONE 'UTC' "
            "— pick the zone the legacy wall times were written in) or "
            "cast the DataFrame column to timestamp_ntz to keep naive "
            "semantics."
        )


@dataclass
class PgStreamCommitMessage(WriterCommitMessage):
    staging_table: str | None


def _stream_ns(stream_id: str) -> str:
    """Stable per-stream staging namespace token. It must be DERIVED
    (not random, not time-based): Spark constructs a FRESH writer
    instance for every commit/abort (python_streaming_sink_runner.py
    calls data_source.streamWriter per call), so only a value
    recomputable from the stream's identity lets the commit-side sweep
    find the write-side tables."""
    import hashlib

    return "s" + hashlib.sha1(stream_id.encode()).hexdigest()[:10]


class PgWireStreamWriter(DataSourceStreamWriter):
    """Exactly-once streaming SINK into Postgres — the write half of
    the streaming matrix (the read half streams out by watermark
    offsets). Same idempotence protocol as the manifest sink
    (Delta's txn/appId), expressed in the database's own transaction:

    each microbatch's tasks COPY into per-attempt staging tables named
    ``_pgw_<epoch>_<streamns>_<taskAttemptId>`` — the epoch is stamped
    at WRITE time (so :func:`vacuum_staging`'s age bound protects a
    long-running stream's in-flight batches), the stream namespace is
    derived from ``streamId`` (so the commit-side writer, which Spark
    constructs FRESH for every commit/abort, can still find them), and
    taskAttemptId is application-unique (so attempts never collide
    across microbatches). The driver then, in ONE transaction, claims
    the batch in ``pgw_stream_commits`` — one row per stream holding
    the LAST committed batch id, advanced by ``INSERT ... ON CONFLICT
    (stream_id) DO UPDATE ... WHERE batch_id < EXCLUDED.batch_id`` —
    and merges the successful attempts' staging only when the claim
    advanced (rowcount 1). A REPLAYED microbatch (crash after the
    database commit, before Spark's checkpoint commit) fails the
    forward-only claim and merges nothing. After commit (and on
    abort) the stream's whole staging namespace is swept: orphans from
    task retries or earlier crashed batches are never merged, only
    dropped. ``outputMode("complete")`` is rejected loudly — this sink
    appends."""

    def __init__(self, schema: StructType, options: dict):
        self._conninfo = _conninfo(options)
        self._table = _table(options)
        sid = options.get("streamid")
        if not sid:
            # a shared default id would be a SILENT cross-stream
            # collision: two unnamed streams share one claims row, so
            # the one that starts behind merges nothing forever (and
            # their sweeps drop each other's in-flight staging)
            raise ValueError(
                "pgwire streaming sink requires option 'streamId' — a "
                "stable, per-stream-unique identity (Delta's txn appId "
                "role). Reprocessing from a FRESH checkpoint with the "
                "same streamId also needs reset_stream_claim()."
            )
        self._stream_id = sid
        self._ns = _stream_ns(self._stream_id)
        self._cols = [f.name for f in schema.fields]
        self._ts_cols = timestamp_field_indexes(schema)
        self._ddl_cols = ", ".join(
            f"{_ident(f.name)} {pg_type_for(f)}" for f in schema.fields
        )

    # executor-side: one staging table per task ATTEMPT per microbatch
    def write(self, rows) -> PgStreamCommitMessage:
        import time

        from pyspark import TaskContext

        stg = f"_pgw_{int(time.time())}_{self._ns}_{TaskContext.get().taskAttemptId()}"
        n = _copy_rows_to_staging(
            self._conninfo, stg, self._ddl_cols, self._cols, rows, self._ts_cols
        )
        return PgStreamCommitMessage(staging_table=stg if n is not None else None)

    # driver-side, once per microbatch
    def commit(self, messages, batchId: int) -> None:
        good = [
            m.staging_table
            for m in messages
            if m is not None and m.staging_table
        ]
        col_list = ", ".join(_ident(x) for x in self._cols)
        with PgWireClient(**self._conninfo) as c:
            _check_instant_columns(c, self._table, self._cols, self._ts_cols)
            c.execute("BEGIN")
            try:
                c.execute(
                    f"CREATE TABLE IF NOT EXISTS {_ident(self._table)} "
                    f"({self._ddl_cols})"
                )
                c.execute(
                    f"CREATE TABLE IF NOT EXISTS {_ident(COMMITS_TABLE)} "
                    "(stream_id TEXT PRIMARY KEY, batch_id BIGINT NOT NULL)"
                )
                sid = self._stream_id.replace("'", "''")
                # forward-only claim, ONE row per stream (batch ids are
                # monotonic per stream — Delta's txn/appId shape, so
                # the claims table never grows with stream lifetime)
                claimed = c.execute(
                    f"INSERT INTO {_ident(COMMITS_TABLE)} VALUES "
                    f"('{sid}', {int(batchId)}) "
                    "ON CONFLICT (stream_id) DO UPDATE "
                    "SET batch_id = EXCLUDED.batch_id "
                    f"WHERE {_ident(COMMITS_TABLE)}.batch_id "
                    "< EXCLUDED.batch_id"
                )
                if claimed == 1:  # not a replay: merge the batch
                    for stg in good:
                        c.execute(
                            f"INSERT INTO {_ident(self._table)} ({col_list}) "
                            f"SELECT {col_list} FROM {_ident(stg)}"
                        )
                c.execute("COMMIT")
            except BaseException:
                _rollback_guarded(c)
                raise
            # post-COMMIT sweep: never fail a durably-committed batch
            # over staging cleanup (replay would no-op on the claim,
            # but the query would still report a spurious failure)
            try:
                self._sweep(c)
            except OSError:  # includes PgError
                pass

    def abort(self, messages, batchId: int) -> None:
        with PgWireClient(**self._conninfo) as c:
            self._sweep(c)

    def _sweep(self, c: PgWireClient) -> None:
        # the stream's WHOLE namespace, any epoch: this stream's
        # batches are serialized by its checkpoint, so everything
        # still standing at commit/abort is merged-or-orphan garbage
        _sweep_tables(c, f"\\_pgw\\_%\\_{self._ns}\\_%")


def reset_stream_claim(conninfo: dict, stream_id: str) -> bool:
    """Delete a stream's claim row so a FRESH checkpoint can reprocess
    under the same ``streamId`` (batch ids restart at 0, which the
    forward-only claim would otherwise treat as replays and merge
    nothing — silently). Returns True if a claim existed. Pair with
    clearing/truncating the target as the reprocessing job requires."""
    sid = stream_id.replace("'", "''")
    with PgWireClient(**conninfo) as c:
        _, exists = c.query(
            "SELECT 1 FROM information_schema.tables "
            f"WHERE table_schema = current_schema() "
            f"AND table_name = '{COMMITS_TABLE}'"
        )
        if not exists:
            return False
        n = c.execute(
            f"DELETE FROM {_ident(COMMITS_TABLE)} WHERE stream_id = '{sid}'"
        )
        return n > 0


def vacuum_staging(conninfo: dict, max_age_seconds: int = 86_400) -> list[str]:
    """Drop ``_pgw_*`` staging tables orphaned by crashed writer runs
    (driver died before its own commit/abort sweep could run). The
    run epoch is parsed from the table name; anything older than
    ``max_age_seconds`` is reclaimed — age-bounded so a LIVE writer's
    staging tables are never swept from under it (streaming staging
    stamps the epoch per WRITE, so long-running streams stay safe;
    batch staging stamps it at writer construction, so keep
    ``max_age_seconds`` above the longest batch write you run).
    Returns the dropped names. Schedule alongside other maintenance."""
    import time

    cutoff = int(time.time()) - max_age_seconds
    dropped = []
    with PgWireClient(**conninfo) as c:
        _, rows = c.query(
            "SELECT table_name FROM information_schema.tables "
            "WHERE table_schema = current_schema() "
            "AND table_name LIKE '\\_pgw\\_%'"
        )
        for (name,) in rows:
            parts = name.split("_")  # ['', 'pgw', '<epoch>', ...]
            # ONLY reclaim names whose epoch segment parses: anything
            # else is not ours to drop (an epoch=0 fallback once made
            # a claims-table-shaped name "always stale" — data loss
            # one rename away)
            if len(parts) < 3 or not parts[2].isdigit():
                continue
            if int(parts[2]) <= cutoff:
                c.execute(f"DROP TABLE IF EXISTS {_ident(name)}")
                dropped.append(name)
    return dropped


# ---------------------------------------------------------------------------
# the DataSource
# ---------------------------------------------------------------------------


class PgWireDataSource(DataSource):
    """``spark.read.format("pgwire")`` / ``df.write.format("pgwire")``.

    Read options: host, port, user, database, password, table,
    partitionColumn, numPartitions, predicate, pushdown ("true"
    enables Catalyst filter pushdown — see the module docstring for
    the Spark plan-reuse hazard that makes it opt-in; the `predicate`
    option is always honored and always safe, it is fixed per load).
    Pass ``.schema(...)`` with a subset of columns to prune the
    SELECT server-side (the default schema is the full
    information_schema inference).

    Write options: host, port, user, database, password, table.
    ``mode("append")`` adds rows; ``mode("overwrite")`` truncates the
    target in the same transaction that merges the staged rows.
    """

    @classmethod
    def name(cls) -> str:
        return "pgwire"

    def schema(self) -> StructType:
        opts = dict(self.options)
        with PgWireClient(**_conninfo(opts)) as c:
            fields = fetch_table_fields(c, _table(opts))
        return _spark_struct(fields)

    def reader(self, schema: StructType) -> PgWireReader:
        opts = dict(self.options)
        if str(opts.get("pushdown", "false")).lower() == "true":
            return PgWirePushdownReader(schema, opts)
        return PgWireReader(schema, opts)

    def writer(self, schema: StructType, overwrite: bool) -> PgWireWriter:
        return PgWireWriter(schema, dict(self.options), overwrite)

    def simpleStreamReader(self, schema: StructType) -> PgWireStreamReader:
        return PgWireStreamReader(schema, dict(self.options))

    def streamReader(self, schema: StructType) -> PgWirePartitionedStreamReader:
        """Partition-planning reader, OPT-IN via
        ``option("streamPartitions", n)`` — raising the not-implemented
        error otherwise makes Spark's dispatch fall back to
        :meth:`simpleStreamReader` (datasource_internal._streamReader
        tries streamReader first and catches exactly this error)."""
        opts = dict(self.options)
        n = int(opts.get("streampartitions", 0) or 0)
        if n >= 1:
            return PgWirePartitionedStreamReader(schema, opts, n)
        from pyspark.errors import PySparkNotImplementedError

        raise PySparkNotImplementedError(
            errorClass="NOT_IMPLEMENTED",
            messageParameters={"feature": "streamReader"},
        )

    def streamWriter(self, schema: StructType, overwrite: bool) -> PgWireStreamWriter:
        if overwrite:
            # outputMode("complete") truncate semantics would need the
            # target replaced every microbatch under the same claim —
            # refuse loudly rather than silently appending duplicates
            raise ValueError(
                "pgwire streaming sink is append-only: "
                "outputMode('complete')/truncate is not supported"
            )
        return PgWireStreamWriter(schema, dict(self.options))


def register_pgwire(spark) -> None:
    spark.dataSource.register(PgWireDataSource)
