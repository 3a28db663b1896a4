"""``manifest_table`` DataSource: the versioned-manifest table
(sinks/manifest.py) as a first-class Spark format —

    spark.read.format("manifest_table").option("path", t).load()
    spark.readStream.format("manifest_table").option("path", t).load()
    df.writeStream.format("manifest_table").option("path", t)...  # txn sink

The STREAMING half is the point (Delta's "table as a stream source",
reference checkpoint/resume behavior S6 generalized): offsets are
manifest VERSION NUMBERS, which Spark persists in the checkpoint. Each
microbatch plans the files ADDED between two committed versions —
exact and replayable because manifests are immutable — so a consumer
gets every inserted row exactly once across restarts, with no
high-watermark column needed. Layout rewrites (``cluster``/``compact``
commits) re-add already-streamed ROWS in new files; the planner skips
those versions wholesale (they are data-preserving by construction —
the same reason Delta CDF skips OPTIMIZE commits), which is strictly
stronger than ``read_changes``'s refuse-and-re-baseline contract.

The WRITE half (``ManifestStreamWriter``) closes the loop: an
exactly-once transactional streaming sink via the Delta txn protocol —
every committed version carries {streamId, batchId}, so a replayed
microbatch is recognized and skipped; task retries leave only
unreferenced orphans for vacuum.

Scale shape: planning is metadata-only on the driver (version-file
diff -> file list); each input partition is ONE parquet file read
executor-side via pyarrow, so a 1000-file backlog fans out across the
cluster. Files from schema generations missing newer nullable columns
surface them as nulls, matching the mergeSchema batch read.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)

from nypd_arrest_etl_spark.sinks import manifest as M


class FilePartition(InputPartition):
    def __init__(
        self,
        full_path: str,
        drop_positions: list[int] | None = None,
        eq_deletes: list[tuple[str, str, list[str]]] | None = None,
        col_map: dict[str, str] | None = None,
    ):
        self.full_path = full_path
        # merge-on-read tombstones scoped to this file (row positions
        # to mask out); None/empty for tombstone-free files
        self.drop_positions = drop_positions
        # equality deletes applicable to this file (older data seq +
        # overlapping key range):
        # (key's on-disk name IN THIS FILE, key's name in the delete
        #  parquet, [delete parquet paths])
        self.eq_deletes = eq_deletes
        # schema-evolution mapping for this file's generation:
        # {current column name -> on-disk column name} (renames only;
        # widened types are auto-cast to the declared arrow type)
        self.col_map = col_map


def _table_schema_ddl(table_path: str) -> str:
    snap = M.snapshot(table_path)
    if snap is None or not snap.schema:
        raise ValueError(f"{table_path} has no committed schema")
    return ", ".join(f"{c['name']} {c['type']}" for c in snap.schema)


def _arrow_fields(schema) -> list[tuple[str, pa.DataType]]:
    from pyspark.sql.pandas.types import to_arrow_type

    return [(f.name, to_arrow_type(f.dataType)) for f in schema.fields]


def _read_file_as_batches(
    full_path: str,
    fields: list[tuple[str, pa.DataType]],
    drop_positions: list[int] | None = None,
    eq_deletes: list[tuple[str, str, list[str]]] | None = None,
    col_map: dict[str, str] | None = None,
):
    """Executor-side file read, padded and MAPPED to the table schema:
    an old file predating an added nullable column yields that column
    as TYPED nulls; a column renamed after the file was written is
    selected by its on-disk name (``col_map``); a column widened after
    the write is cast up to the declared arrow type. With
    ``drop_positions``, merge-on-read tombstoned rows are masked out
    by file row position; with ``eq_deletes``, rows whose key appears
    in an applicable equality-delete file are masked by value (the
    delete sets are small — that is the MOR contract — so the
    per-partition re-read is a few KB)."""
    tbl = pq.read_table(full_path)
    if drop_positions:
        import numpy as np

        mask = np.ones(len(tbl), dtype=bool)
        idx = np.asarray(drop_positions, dtype="int64")
        mask[idx[idx < len(tbl)]] = False
        tbl = tbl.filter(pa.array(mask))
    for data_key, eq_key, paths in eq_deletes or []:
        keyset: set = set()
        for p in paths:
            keyset.update(pq.read_table(p).column(eq_key).to_pylist())
        tbl = tbl.filter(
            pa.array([v not in keyset for v in tbl.column(data_key).to_pylist()])
        )
    cols = []
    for name, typ in fields:
        disk = (col_map or {}).get(name, name)
        if disk in tbl.column_names:
            col = tbl.column(disk)
            if col.type != typ:
                col = col.cast(typ)  # widened column: lossless up-cast
            cols.append(col)
        else:
            cols.append(pa.nulls(len(tbl), type=typ))
    yield from pa.table(dict(zip([n for n, _ in fields], cols))).to_batches()


class ManifestBatchReader(DataSourceReader):
    """Batch reads of the manifest table. Base class plans EVERY live
    file; :class:`ManifestSkippingBatchReader` (selected by
    ``option("pushdown", "true")``) adds stats-based data skipping
    through the DataSource pushdown API.

    Skipping is OPT-IN because of the Spark 4.1 Python-source
    plan-reuse quirk (full analysis in sources/pg_source.py): a
    FILTERLESS query on a previously filtered DataFrame object reuses
    the filtered plan's PARTITIONS — files pruned by the earlier
    predicate simply aren't read, and Spark's row-level recheck cannot
    resurrect rows that never left the source (verified empirically:
    filtered-count-then-plain-count returned the filtered count
    twice). ``Snapshot.read`` — the primary batch API — prunes
    per-call and is immune; use it when you need skipping without the
    option."""

    def __init__(self, schema, options: dict):
        self.fields = _arrow_fields(schema)
        self.table_path = options["path"]
        version = options.get("versionasof")
        self.version = int(version) if version is not None else None
        self.skip_filters: list[tuple] = []

    def partitions(self):
        snap = M.snapshot(self.table_path, version=self.version)
        if snap is None:
            return []
        files = (
            snap.prune(self.skip_filters) if self.skip_filters else snap.files
        )
        # Merge-on-read tombstones: load the (small) position sets
        # driver-side and hand each partition its file's mask, so the
        # executor read stays a single-file operation.
        tombs: dict[str, list[int]] = {}
        for dfile in snap.delete_files:
            dt = pq.read_table(os.path.join(self.table_path, dfile))
            for df_file, df_pos in zip(
                dt.column("_df_file").to_pylist(), dt.column("_df_pos").to_pylist()
            ):
                tombs.setdefault(df_file, []).append(df_pos)
        # Equality deletes: planned per file, metadata-only — a delete
        # applies iff the file's data seq is older AND its key stats
        # overlap the delete's recorded range; executors mask by value.
        # schema-evolution mapping per file generation (renames only —
        # widens are handled by the read-side arrow cast)
        col_maps: dict[str, dict[str, str]] = {}
        if snap.schema_log:
            seqs_all = snap.file_seqs
            for f in files:
                name_map, _narrow = snap._disk_layout(seqs_all.get(f, 0))
                if name_map:
                    col_maps[f] = name_map
        eq_by_file: dict[str, list[tuple[str, str, list[str]]]] = {}
        if snap.eq_delete_refs:
            seqs, stats = snap.file_seqs, snap.stats
            specs = []
            for r in snap.eq_delete_refs:
                body = M._load_content_manifest(self.table_path, r["path"])
                key_range = (
                    [(r["key"], ">=", r["lo"]), (r["key"], "<=", r["hi"])]
                    if r.get("lo") is not None
                    else []
                )
                specs.append(
                    (
                        int(r["seq"]),
                        r["key"],
                        r.get("file_key", r["key"]),
                        key_range,
                        [os.path.join(self.table_path, f) for f in body["files"]],
                    )
                )
            for f in files:
                app = [
                    # the key's on-disk name in THIS data file follows
                    # the file's generation mapping
                    (col_maps.get(f, {}).get(k, k), fk, paths)
                    for s, k, fk, rng, paths in specs
                    if seqs.get(f, 0) < s and M._file_may_match(stats.get(f), rng)
                ]
                if app:
                    eq_by_file[f] = app
        # An empty plan (table fully pruned — e.g. a bloom point
        # lookup on an absent key — or an emptied table) must still
        # return ONE marker partition: Spark's Python DataSource calls
        # read() regardless, and an empty list surfaces as read(None).
        return [
            FilePartition(
                os.path.join(self.table_path, f),
                tombs.get(f),
                eq_by_file.get(f),
                col_maps.get(f),
            )
            for f in files
        ] or [FilePartition("")]

    def read(self, partition: FilePartition):
        if not partition.full_path:  # empty-plan marker: zero rows
            return
        yield from _read_file_as_batches(
            partition.full_path,
            self.fields,
            partition.drop_positions,
            partition.eq_deletes,
            partition.col_map,
        )


class ManifestSkippingBatchReader(ManifestBatchReader):
    """Opt-in data skipping (``option("pushdown", "true")``):
    Catalyst filters translate into the manifest layer's
    ``(col, op, value)`` triples and apply at partition planning, so
    files (and whole manifests) whose stat ranges exclude the
    predicate are never opened. Every filter is also RETURNED as
    unsupported — Spark re-applies it row-level after the scan — so
    skipping stays a pure optimization WITHIN one query; see the base
    class for the cross-query reuse hazard that makes this opt-in."""

    def pushFilters(self, filters):  # noqa: N802 (API name)
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        ops = {
            EqualTo: "=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
            In: "in",
        }
        for flt in filters:
            attr = getattr(flt, "attribute", None)
            op = ops.get(type(flt))
            if op is not None and attr is not None and len(attr) == 1:
                val = list(flt.value) if op == "in" else flt.value
                self.skip_filters.append((attr[0], op, val))
        # report ALL as unsupported: the engine rechecks row-level
        return filters


class ManifestStreamReader(DataSourceStreamReader):
    """Version-offset stream planner. Offset ``{"version": v}`` means
    "everything up to and including manifest version v has been
    emitted"; ``initialOffset`` is -1 (stream the whole table first),
    or ``startingVersion`` to begin mid-history."""

    def __init__(self, schema, options: dict):
        self.fields = _arrow_fields(schema)
        self.table_path = options["path"]
        self.starting_version = int(options.get("startingversion", -1))

    def initialOffset(self) -> dict:
        return {"version": self.starting_version}

    def latestOffset(self) -> dict:
        v = M.current_version(self.table_path)
        return {"version": v if v is not None else self.starting_version}

    def _load_version(self, version: int) -> dict:
        """Load one version manifest, translating a vacuumed-away file
        into the same re-baseline contract the retraction case gets: a
        lagging stream whose unread versions aged past the vacuum
        retention window should see a clear recovery instruction, not a
        raw FileNotFoundError."""
        try:
            return M._load_manifest(self.table_path, version)
        except FileNotFoundError:
            head = M.current_version(self.table_path)
            raise ValueError(
                f"version {version} of {self.table_path} was vacuumed away "
                "(stream lagged past the retention window) — restart the "
                f"stream with startingVersion={head} (current head) or "
                "re-baseline from a full snapshot read"
            ) from None

    def _files_at(self, version: int) -> set[str]:
        if version < 0:
            return set()
        return set(
            M.Snapshot(self.table_path, version, self._load_version(version)).files
        )

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        if hi <= lo:
            return [FilePartition("")]  # no-data batch marker
        added: list[str] = []
        prev = self._files_at(lo)
        base_log_len = (
            len(self._load_version(lo).get("schema_log", [])) if lo >= 0 else 0
        )
        for v in range(lo + 1, hi + 1):
            manifest = self._load_version(v)
            if len(manifest.get("schema_log", [])) != base_log_len:
                # rename/widen mid-stream: the stream's output schema
                # was fixed at start and cannot follow — Delta fails
                # streams on schema change the same way.
                raise ValueError(
                    f"version {v} of {self.table_path} evolved the schema "
                    "(rename/widen); restart the stream with "
                    f"startingVersion={v} to adopt the new schema"
                )
            cur = set(
                M.Snapshot(self.table_path, v, manifest).files
            )
            op = manifest.get("operation")
            if op in ("delete", "update", "delete_mor", "upsert", "upsert_eq", "restore"):
                # A delete REMOVES rows this stream already emitted; a
                # row-add feed cannot express the retraction. Fail loud
                # so the consumer re-baselines past it (startingVersion).
                raise ValueError(
                    f"version {v} of {self.table_path} is a {op} commit; "
                    "insert-only streaming cannot express retractions — "
                    f"restart the stream with startingVersion={v}"
                )
            if op in ("cluster", "compact", "materialize"):
                # Data-preserving rewrite: its added files re-pack rows
                # already emitted by earlier versions — skip them, but
                # advance the baseline so the NEXT diff is correct.
                prev = cur
                continue
            added.extend(sorted(cur - prev))
            prev = cur
        if not added:
            return [FilePartition("")]
        return [FilePartition(os.path.join(self.table_path, f)) for f in added]

    def read(self, partition: FilePartition):
        if not partition.full_path:  # empty batch marker
            return
        yield from _read_file_as_batches(partition.full_path, self.fields)

    def commit(self, end: dict) -> None:
        # Offsets are durable manifest versions; nothing to clean up.
        pass


class StreamWriteMessage(WriterCommitMessage):
    def __init__(self, rel_file: str | None, rows: int):
        self.rel_file = rel_file
        self.rows = rows


class ManifestStreamWriter(DataSourceStreamArrowWriter):
    """Exactly-once streaming SINK for the manifest table (the write
    half of the DataSource — the read half streams by version offset).

    Each microbatch: executors write their Arrow batches as immutable
    parquet under data/ and return the file paths as commit messages;
    the driver commits ONE manifest version referencing them, stamped
    with a ``txn`` marker ``{stream_id, batch_id}`` — Delta's
    txn/appId idempotence protocol. A microbatch REPLAY (crash after
    sink commit, before checkpoint commit) walks recent versions, sees
    its own stream's last committed batch_id >= the replayed id, and
    commits nothing — exactly-once end-to-end from Spark's
    at-least-once epochs. Task retries/speculation leave orphan files
    that no manifest references (vacuum reclaims) — commit messages
    only flow from the task attempt Spark declares successful.

    Multiple DIFFERENT streams may write one table concurrently by
    setting distinct ``streamId`` options (commit races resolve by
    optimistic retry, same as every other writer); a single stream is
    serialized by its own checkpoint."""

    def __init__(self, schema, options: dict):
        self.fields = [
            (f.name, f.dataType.simpleString(), f.nullable) for f in schema.fields
        ]
        self.arrow_fields = _arrow_fields(schema)
        self.table_path = options["path"]
        self.stream_id = options.get("streamid", "default")

    def write(self, iterator):
        import uuid

        sub = os.path.join(M._DATA_DIR, "stream-" + uuid.uuid4().hex)
        out_dir = os.path.join(self.table_path, sub)
        arrow_schema = pa.schema(
            [pa.field(n, t) for n, t in self.arrow_fields]
        )
        writer = None
        rows = 0
        rel = os.path.join(sub, "part-0.parquet")
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            if writer is None:
                os.makedirs(out_dir, exist_ok=True)
                writer = pq.ParquetWriter(
                    os.path.join(self.table_path, rel), arrow_schema
                )
            # cast rather than require schema identity: Spark marks
            # provably-non-null columns (e.g. coalesce over xxhash64)
            # as not-null in the incoming Arrow batch, which
            # from_batches(schema=...) rejects against the table's
            # nullable declaration even though the VALUES fit
            writer.write_table(
                pa.Table.from_batches([batch]).cast(arrow_schema)
            )
            rows += batch.num_rows
        if writer is None:
            return StreamWriteMessage(None, 0)
        writer.close()
        return StreamWriteMessage(rel, rows)

    def _last_committed_batch(self) -> int | None:
        """Walk back from the head until this stream's latest txn
        marker. Stops at the vacuum horizon (vacuumed version files
        are legitimately gone — any marker below it predates every
        surviving batch, so "no marker" is the correct answer) and is
        O(versions since this stream's last commit) — one read per
        version, and an active stream's marker is near the head."""
        v = M.current_version(self.table_path)
        while v is not None and v >= 0:
            try:
                txn = M._load_manifest(self.table_path, v).get("txn")
            except FileNotFoundError:
                return None  # vacuumed prefix
            if txn and txn.get("stream_id") == self.stream_id:
                return txn["batch_id"]
            v -= 1
        return None

    def commit(self, messages, batchId: int) -> None:
        last = self._last_committed_batch()
        if last is not None and last >= batchId:
            return  # replayed microbatch: already durable, commit nothing
        files = [m.rel_file for m in messages if m is not None and m.rel_file]
        if not files:
            return  # empty batch: nothing to version (replay is harmless)
        stats = {
            f: M._collect_file_stats(os.path.join(self.table_path, f))
            for f in files
        }
        # Declared bloom columns index this batch's files too (O(batch)
        # work, same as any writer). commit() runs on the stream's
        # driver, so a session is normally active; without one the
        # files simply stay unprunable — never wrong, just unskippable.
        snap0 = M.snapshot(self.table_path)
        bcols = snap0.bloom_cols if snap0 is not None else None
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession() if bcols else None
        # no active session (unusual for a stream driver): files simply
        # stay unprunable — never wrong, just unskippable
        ref = M._indexed_manifest(
            active, self.table_path, files, stats, bcols if active else None
        )
        schema_entry = [
            {"name": n, "type": t, "nullable": b} for n, t, b in self.fields
        ]
        for _ in range(10):
            snap = M.snapshot(self.table_path)
            M._check_schema_evolution(
                snap.schema if snap else None, schema_entry
            )
            try:
                M._commit_refs(
                    self.table_path,
                    M._next_refs(self.table_path, snap, ref),
                    snap.version if snap is not None else None,
                    "stream_append",
                    schema=schema_entry,
                    partition_spec=snap.partition_spec if snap else None,
                    delete_refs=snap.delete_refs if snap is not None else None,
                    txn={"stream_id": self.stream_id, "batch_id": batchId},
                )
                return
            except M.CommitConflict:
                continue
        raise M.CommitConflict(
            f"stream_append to {self.table_path} lost 10 races"
        )

    def abort(self, messages, batchId: int) -> None:
        # written files are unreferenced by construction; vacuum reclaims
        pass


class ManifestTableDataSource(DataSource):
    """Registered as ``manifest_table``; requires option ``path``.
    Batch extras: ``versionAsOf`` (time travel). Streaming extras:
    ``startingVersion`` (source) / ``streamId`` (sink txn identity)."""

    @classmethod
    def name(cls) -> str:
        return "manifest_table"

    def schema(self) -> str:
        if "path" not in self.options:
            raise ValueError("manifest_table requires option 'path'")
        return _table_schema_ddl(self.options["path"])

    def reader(self, schema) -> ManifestBatchReader:
        opts = dict(self.options)
        if str(opts.get("pushdown", "false")).lower() == "true":
            return ManifestSkippingBatchReader(schema, opts)
        return ManifestBatchReader(schema, opts)

    def streamReader(self, schema) -> ManifestStreamReader:
        return ManifestStreamReader(schema, dict(self.options))

    def streamWriter(self, schema, overwrite: bool) -> ManifestStreamWriter:
        return ManifestStreamWriter(schema, dict(self.options))


def register_manifest_table(spark) -> None:
    spark.dataSource.register(ManifestTableDataSource)


__all__ = ["ManifestTableDataSource", "register_manifest_table"]
