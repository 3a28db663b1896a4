"""Paginated REST (Socrata-style) DataSource with predicate pushdown.

Spark-native realization of the reference's extract stage
(/root/reference/scripts/extract.py:56-72): the reference fetches
pages serially on one thread with `$limit/$offset` and pushes its
high-watermark predicate into the API as a SoQL ``$where``
(extract.py:60-64). Here the same contract becomes a PySpark
``DataSource``:

- **pagination = input partitioning**: a driver-side ``count(*)``
  probe sizes the result under the pushed predicate, then each page
  offset becomes an ``InputPartition`` — executors fetch pages in
  parallel instead of the reference's serial loop.
- **predicate pushdown** (OPT-IN via ``option("pushdown", "true")``):
  Catalyst hands comparison/In/IsNotNull filters to ``pushFilters``;
  supported ones compile to one SoQL ``$where`` conjunction sent with
  every request (so the API, not Spark, prunes rows — the reference's
  watermark trick, generalized to arbitrary predicates). Unsupported
  filters are returned to Spark for post-scan evaluation.

  Opt-in because Spark 4.1's Python-source planner reuses the most
  recently planned scan for FILTERLESS queries on the same loaded
  DataFrame object: after ``df.filter(x).count()``, a plain
  ``df.count()`` replays the scan with ``x`` baked into ``$where``
  and silently under-counts (characterized empirically; see
  sources/pg_source.py's module docstring for the full analysis and
  tests/test_pgwire.py for the canary pinned to the wrong-result
  shape). The reference's extract is one query per load — opting in
  there is safe and keeps API-side pruning. The static ``where``
  option is always honored and always safe (fixed per load).
- **ordering**: pages are ordered by ``:id`` so offset pagination is
  stable across requests (the reference's unordered paging can skip /
  duplicate rows if the dataset changes mid-extract).

Offline transport: pass ``fixtureDir`` pointing at a directory with a
``manifest.json`` mapping full request URLs to canned responses — used
by the test suite (no network in CI) and handy for record/replay
debugging. Without it, ``urllib`` performs real HTTPS requests.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from urllib.parse import urlencode

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql.types import StructType

from nypd_arrest_etl_spark.schema import RAW_SCHEMA

DEFAULT_BATCH_SIZE = 50_000  # reference BATCH_SIZE, extract.py:25


def build_url(base: str, params: dict) -> str:
    """Deterministic URL construction (fixed param order) so fixture
    manifests can key responses by exact URL."""
    ordered = [
        (k, params[k])
        for k in ("$select", "$where", "$order", "$limit", "$offset")
        if k in params
    ]
    return f"{base}?{urlencode(ordered)}"


def fetch_json(url: str, fixture_dir: str | None):
    if fixture_dir:
        with open(os.path.join(fixture_dir, "manifest.json")) as f:
            manifest = json.load(f)
        if url in manifest:
            return manifest[url]
        # `match:<substr>` keys respond to any URL containing <substr>
        # (lets integration fixtures ignore the exact pushed $where)
        for key, resp in manifest.items():
            if key.startswith("match:") and key[6:] in url:
                return resp
        raise KeyError(
            f"fixture manifest has no response for {url!r} — "
            f"known: {sorted(manifest)[:5]}"
        )
    import urllib.request

    with urllib.request.urlopen(url) as resp:  # noqa: S310 (https API)
        return json.loads(resp.read())


def _soql_literal(v) -> str:
    if isinstance(v, (int, float)):
        return str(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _filter_to_soql(flt: Filter) -> str | None:
    """Compile one Catalyst filter to a SoQL predicate; None if the
    filter shape isn't supported (nested column, exotic operator)."""
    attr = getattr(flt, "attribute", None)
    if attr is None or len(attr) != 1:
        return None
    col = attr[0]
    if isinstance(flt, EqualTo):
        return f"{col} = {_soql_literal(flt.value)}"
    if isinstance(flt, GreaterThan):
        return f"{col} > {_soql_literal(flt.value)}"
    if isinstance(flt, GreaterThanOrEqual):
        return f"{col} >= {_soql_literal(flt.value)}"
    if isinstance(flt, LessThan):
        return f"{col} < {_soql_literal(flt.value)}"
    if isinstance(flt, LessThanOrEqual):
        return f"{col} <= {_soql_literal(flt.value)}"
    if isinstance(flt, In):
        # the dataclass field is `value` (a sequence) — `.values` was
        # an AttributeError whenever Catalyst actually pushed an IN
        vals = ", ".join(_soql_literal(v) for v in flt.value)
        return f"{col} in ({vals})"
    if isinstance(flt, IsNotNull):
        return f"{col} IS NOT NULL"
    # SoQL `like` wildcards: literal % / _ in values are not escaped
    # (SoQL has no escape clause); such values stay Spark-side anyway
    # because the recheck re-applies the original filter.
    if isinstance(flt, StringStartsWith):
        return f"{col} like {_soql_literal(str(flt.value) + '%')}"
    if isinstance(flt, StringEndsWith):
        return f"{col} like {_soql_literal('%' + str(flt.value))}"
    if isinstance(flt, StringContains):
        return f"{col} like {_soql_literal('%' + str(flt.value) + '%')}"
    return None


@dataclass
class PagePartition(InputPartition):
    offset: int
    limit: int


class SocrataRestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.url = options.get("url")
        if not self.url:
            raise ValueError("socrata source requires option 'url'")
        self.batch_size = int(options.get("batchsize", DEFAULT_BATCH_SIZE))
        self.fixture_dir = options.get("fixturedir")
        self.where: str | None = options.get("where")  # pre-set predicate

    # -- planning ---------------------------------------------------------
    def _params(self, extra: dict) -> dict:
        p = dict(extra)
        if self.where:
            p["$where"] = self.where
        return p

    def partitions(self):
        count_url = build_url(self.url, self._params({"$select": "count(1)"}))
        resp = fetch_json(count_url, self.fixture_dir)
        total = int(next(iter(resp[0].values()))) if resp else 0
        offsets = range(0, max(total, 1), self.batch_size)
        return [PagePartition(offset=o, limit=self.batch_size) for o in offsets]

    # -- execution --------------------------------------------------------
    def read(self, partition: PagePartition):
        url = build_url(
            self.url,
            self._params(
                {
                    "$order": ":id",
                    "$limit": partition.limit,
                    "$offset": partition.offset,
                }
            ),
        )
        rows = fetch_json(url, self.fixture_dir)
        fields = self.schema.fieldNames()
        for rec in rows:
            out = []
            for f in fields:
                v = rec.get(f)
                if v is None:
                    out.append(None)
                elif isinstance(v, (dict, list)):
                    out.append(json.dumps(v, sort_keys=True))
                else:
                    out.append(str(v))
            yield tuple(out)


class SocrataPushdownReader(SocrataRestReader):
    """Opt-in Catalyst pushdown (``option("pushdown", "true")``) — a
    separate class because merely IMPLEMENTING ``pushFilters`` makes a
    source unusable when ``spark.sql.python.filterPushdown.enabled``
    is false (Spark's default), and because of the plan-reuse hazard
    in the module docstring."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._user_where = self.where

    def pushFilters(self, filters):  # noqa: N802 (API name)
        # user option("where") kept apart; the combined $where rebuilds
        # from scratch per call — a re-plan invoking pushFilters twice
        # on one instance must not keep the earlier query's clauses
        # ANDed in (same fix as PgWirePushdownReader, ADVICE r8)
        clauses = [self._user_where] if self._user_where else []
        unsupported = []
        for flt in filters:
            soql = _filter_to_soql(flt)
            if soql is None:
                unsupported.append(flt)  # Spark evaluates it post-scan
            else:
                # not returned: fully handled source-side
                clauses.append(soql)
        self.where = " AND ".join(clauses) if clauses else self._user_where
        return unsupported


def _rows_to_tuples(rows, fields):
    # a LIST, not a generator: the streaming prefetch cache copy.copy()s
    # the iterator for replay, which a generator cannot survive
    out_rows = []
    for rec in rows:
        out = []
        for f in fields:
            v = rec.get(f)
            if v is None:
                out.append(None)
            elif isinstance(v, (dict, list)):
                out.append(json.dumps(v, sort_keys=True))
            else:
                out.append(str(v))
        out_rows.append(tuple(out))
    return out_rows


class SocrataStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch reader: the reference's resume
    checkpoint (``{total_records, offset}`` JSON re-read on restart,
    extract.py:74-95) becomes a real streaming offset — Spark persists
    it in the checkpointLocation, replays ``readBetweenOffsets`` after
    a crash, and each microbatch pulls exactly one page. A short page
    means "caught up" (the reference's loop-until-short-batch,
    extract.py:109-134) and subsequent triggers poll from the same
    offset until new rows appear."""

    def __init__(self, schema: StructType, options: dict):
        self.fields = schema.fieldNames()
        self.url = options.get("url")
        if not self.url:
            raise ValueError("socrata source requires option 'url'")
        self.batch_size = int(options.get("batchsize", DEFAULT_BATCH_SIZE))
        self.max_pages_per_batch = int(options.get("maxpagesperbatch", 20))
        self.fixture_dir = options.get("fixturedir")
        self.where = options.get("where")

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _fetch_page(self, offset: int, limit: int):
        params = {"$order": ":id", "$limit": limit, "$offset": offset}
        if self.where:
            params["$where"] = self.where
        return fetch_json(build_url(self.url, params), self.fixture_dir)

    def read(self, start: dict):
        # Drain pages until a short page (the reference's
        # loop-until-short-batch, extract.py:109-134), bounded by
        # max_pages_per_batch so one microbatch can't swallow an
        # unbounded backlog; the next trigger continues from the
        # checkpointed offset.
        offset = int(start["offset"])
        out = []
        for _ in range(self.max_pages_per_batch):
            rows = self._fetch_page(offset, self.batch_size)
            out.extend(_rows_to_tuples(rows, self.fields))
            offset += len(rows)
            if len(rows) < self.batch_size:
                break
        # MUST be an iterator over a materialized list: the wrapper
        # calls next() on the caught-up (offset-unchanged) result to
        # validate emptiness — a bare list raises TypeError the first
        # trigger after the stream catches up — and copy.copy()s the
        # iterator for replay, which a generator cannot survive.
        return iter(out), {"offset": offset}

    def readBetweenOffsets(self, start: dict, end: dict):
        offset, end_offset = int(start["offset"]), int(end["offset"])
        n = end_offset - offset
        rows = self._fetch_page(offset, n) if n > 0 else []
        return iter(_rows_to_tuples(rows, self.fields))


class SocrataRestDataSource(DataSource):
    """``spark.read.format("socrata").option("url", ...).load()`` or
    ``spark.readStream.format("socrata")...`` for the incremental path.

    Default schema is the permissive all-string raw schema; pass
    ``.schema(...)`` to project fewer columns (the reader only
    materializes requested fields — column pruning at the source).
    """

    @classmethod
    def name(cls) -> str:
        return "socrata"

    def schema(self) -> StructType:
        return RAW_SCHEMA

    def reader(self, schema: StructType) -> SocrataRestReader:
        opts = dict(self.options)
        if str(opts.get("pushdown", "false")).lower() == "true":
            return SocrataPushdownReader(schema, opts)
        return SocrataRestReader(schema, opts)

    def simpleStreamReader(self, schema: StructType) -> SocrataStreamReader:
        return SocrataStreamReader(schema, dict(self.options))


def register_socrata(spark) -> None:
    spark.dataSource.register(SocrataRestDataSource)
