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
- **Arrow-batch reads**: each partition yields ``pyarrow.RecordBatch``
  directly (the documented fast path for Python sources), built
  against the exact arrow schema Spark derives from the declared
  StructType.
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
    StringContains,
    StringEndsWith,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from ..sinks.pgwire import (
    _PG_TYPES,
    PgWireClient,
    _ident,
    _spark_struct,
    copy_field,
    copy_out_pandas_batches,
    fetch_table_fields,
    range_clauses,
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
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
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

    def pushFilters(self, filters):  # noqa: N802 (API name)
        clauses = [f"({self._predicate})"] if self._predicate else []
        unsupported = []
        for flt in filters:
            sql = _filter_to_pg(flt)
            if sql is None:
                unsupported.append(flt)  # Spark evaluates it post-scan
            else:
                # not returned: COLLATE "C" pinning makes the pushed
                # predicate exactly Spark's semantics, so no recheck
                clauses.append(f"({sql})")
        if clauses:
            self._predicate = " AND ".join(clauses)
        return unsupported


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
    — COPY-append without staging would double its rows."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self._schema = schema
        self._conninfo = _conninfo(options)
        self._table = _table(options)
        self._overwrite = overwrite
        self._run = f"_pgw_{uuid.uuid4().hex[:12]}"
        self._cols = [f.name for f in schema.fields]
        self._ddl_cols = ", ".join(
            f"{_ident(f.name)} {_pg_type(f)}" for f in schema.fields
        )

    # executor-side: one staging table per task ATTEMPT
    def write(self, rows) -> PgCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        stg = f"{self._run}_{ctx.partitionId()}_{ctx.attemptNumber()}"
        cols = self._cols
        with PgWireClient(**self._conninfo) as c:
            c.execute(f"CREATE TABLE {_ident(stg)} ({self._ddl_cols})")
            c.copy_in(
                f"COPY {_ident(stg)} ({', '.join(_ident(x) for x in cols)}) "
                "FROM STDIN",
                ("\t".join(copy_field(r[i]) for i in range(len(cols))) for r in rows),
            )
        return PgCommitMessage(staging_table=stg)

    # driver-side
    def commit(self, messages) -> None:
        good = [m.staging_table for m in messages if m is not None]
        col_list = ", ".join(_ident(x) for x in self._cols)
        with PgWireClient(**self._conninfo) as c:
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
                c.execute("ROLLBACK")
                raise
            self._sweep(c)

    def abort(self, messages) -> None:
        with PgWireClient(**self._conninfo) as c:
            self._sweep(c)

    def _sweep(self, c: PgWireClient) -> None:
        # drop EVERYTHING under the run prefix — committed staging
        # tables and orphans from failed/retried attempts alike
        _, rows = c.query(
            "SELECT table_name FROM information_schema.tables "
            "WHERE table_schema = current_schema() "
            f"AND table_name LIKE '{self._run}\\_%'"
        )
        for (name,) in rows:
            c.execute(f"DROP TABLE IF EXISTS {_ident(name)}")


def _pg_type(field) -> str:
    t = _PG_TYPES.get(field.dataType.simpleString())
    if t is None:
        raise TypeError(
            f"no COPY/text mapping for column {field.name!r} of type "
            f"{field.dataType.simpleString()!r}"
        )
    return t


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


def register_pgwire(spark) -> None:
    spark.dataSource.register(PgWireDataSource)
