"""Versioned-manifest table: commit atomicity, snapshot isolation,
serializable concurrent merges, time travel, vacuum."""

import threading

import pytest

from nypd_arrest_etl_spark.sinks import manifest as M

# Long-running suite (streaming drains / live servers / storage-format
# e2e / property fuzz / soak): excluded from the default gate run by
# pytest.ini's `-m "not slow"`; run with -m "" or SPARK_GRAFT_FULL_TESTS=1.
pytestmark = pytest.mark.slow



def _df(spark, rows):
    return spark.createDataFrame(rows, "arrest_key string, v long")


def test_append_and_read_roundtrip(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)
    assert v0 == 0
    v1 = M.append(spark, _df(spark, [("c", 3)]), t)
    assert v1 == 1
    snap = M.snapshot(t)
    assert snap.version == 1
    assert sorted(r["arrest_key"] for r in snap.read(spark).collect()) == ["a", "b", "c"]
    # time travel: version 0 still readable, unchanged
    old = M.snapshot(t, version=0)
    assert sorted(r["arrest_key"] for r in old.read(spark).collect()) == ["a", "b"]


def test_commit_conflict_on_claimed_version(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1)]), t)
    snap = M.snapshot(t)
    # first claim of version 1 wins...
    M.commit(t, snap.files, snap.version, "noop")
    # ...second claim against the SAME base must conflict, not overwrite
    with pytest.raises(M.CommitConflict):
        M.commit(t, snap.files, snap.version, "noop")


def test_snapshot_isolation_under_concurrent_commit(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1)]), t)
    pinned = M.snapshot(t)
    M.append(spark, _df(spark, [("b", 2)]), t)
    # the pinned snapshot still reads exactly its own version's rows
    assert [r["arrest_key"] for r in pinned.read(spark).collect()] == ["a"]
    assert M.snapshot(t).version == pinned.version + 1


def test_merge_txn_first_writer_wins_and_idempotent(spark, tmp_path):
    t = str(tmp_path / "tbl")
    n, _ = M.merge_insert_if_absent_txn(spark, _df(spark, [("a", 1), ("a", 9), ("b", 2)]), t)
    assert n == 2  # in-batch dup collapsed
    n2, _ = M.merge_insert_if_absent_txn(spark, _df(spark, [("a", 7), ("c", 3)]), t)
    assert n2 == 1  # existing key rejected
    n3, _ = M.merge_insert_if_absent_txn(spark, _df(spark, [("a", 7), ("c", 3)]), t)
    assert n3 == 0  # idempotent re-run commits nothing
    rows = {r["arrest_key"]: r["v"] for r in M.snapshot(t).read(spark).collect()}
    assert rows == {"a": 1, "b": 2, "c": 3}
    # the no-op merge created no new version
    assert M.snapshot(t).version == 1


def test_concurrent_merges_never_duplicate_a_key(spark, tmp_path):
    """Two threads merge OVERLAPPING key sets concurrently: the loser
    of each commit race must re-run its anti-join against the winner's
    rows, so every key appears exactly once."""
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("seed", 0)]), t)
    batches = [
        [("k1", 1), ("k2", 1), ("shared", 1)],
        [("k3", 2), ("k4", 2), ("shared", 2)],
    ]
    errors = []

    def run(rows):
        try:
            M.merge_insert_if_absent_txn(spark, _df(spark, rows), t)
        except Exception as e:  # pragma: no cover - surfaced via assert
            errors.append(e)

    threads = [threading.Thread(target=run, args=(b,)) for b in batches]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    got = [r["arrest_key"] for r in M.snapshot(t).read(spark).collect()]
    assert sorted(got) == ["k1", "k2", "k3", "k4", "seed", "shared"]
    assert len(got) == len(set(got))  # no key committed twice


def test_vacuum_reclaims_orphans_and_old_versions(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1)]), t)
    M.append(spark, _df(spark, [("b", 2)]), t)
    # manufacture an orphan: data files written but never committed
    M._write_data_files(_df(spark, [("orphan", 9)]), t)
    deleted = M.vacuum(t, keep_versions=1, retention_seconds=0.0)
    assert deleted >= 1
    snap = M.snapshot(t)
    assert sorted(r["arrest_key"] for r in snap.read(spark).collect()) == ["a", "b"]
    # superseded manifest dropped; latest survives
    with pytest.raises(FileNotFoundError):
        M.snapshot(t, version=0)
    assert M.current_version(t) == 1


def test_vacuum_retention_spares_young_orphans(spark, tmp_path):
    """An unreferenced file younger than the retention window must
    survive vacuum: it is indistinguishable from an in-flight writer's
    staged (pre-commit) data, and deleting it would corrupt that
    writer's eventual commit."""
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1)]), t)
    staged, _ = M._write_data_files(_df(spark, [("inflight", 9)]), t)
    assert M.vacuum(t, keep_versions=1) == 0  # default 7-day retention
    for rel in staged:
        assert (tmp_path / "tbl" / rel).exists()
    # the in-flight writer can still commit the staged files afterwards
    snap = M.snapshot(t)
    v = M.commit(t, snap.files + staged, snap.version, "append")
    got = sorted(r["arrest_key"] for r in M.snapshot(t, version=v).read(spark).collect())
    assert got == ["a", "inflight"]


def test_schema_evolution_rejects_type_change_and_drop(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1)]), t)
    with pytest.raises(M.SchemaEvolutionError):  # v: long -> string
        M.append(spark, spark.createDataFrame([("b", "2")], "arrest_key string, v string"), t)
    with pytest.raises(M.SchemaEvolutionError):  # drops column v
        M.append(spark, spark.createDataFrame([("b",)], "arrest_key string"), t)
    assert M.current_version(t) == 0  # rejected writers committed nothing


def test_schema_evolution_allows_added_nullable_column(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1)]), t)
    wide = spark.createDataFrame([("b", 2, "x")], "arrest_key string, v long, extra string")
    M.append(spark, wide, t)
    rows = {r["arrest_key"]: r["extra"] for r in M.snapshot(t).read(spark).collect()}
    # old files surface the new column as null (mergeSchema read)
    assert rows == {"a": None, "b": "x"}


def test_stats_pruned_read_skips_untouched_files(spark, tmp_path):
    """Two appends with disjoint `v` ranges: a filtered read must not
    open the out-of-range generation's files (data skipping via the
    manifest's per-file min/max), and must still return exact rows."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "tbl")
    low = spark.createDataFrame([(f"lo{i}", i) for i in range(10)], "arrest_key string, v long")
    high = spark.createDataFrame(
        [(f"hi{i}", 1000 + i) for i in range(10)], "arrest_key string, v long"
    )
    M.append(spark, low.coalesce(1), t)
    M.append(spark, high.coalesce(1), t)
    snap = M.snapshot(t)
    assert len(snap.files) == 2
    # prune() drops the low-range file entirely
    kept = snap.prune([("v", ">=", 1000)])
    assert len(kept) == 1
    df = snap.read(spark, filters=[("v", ">=", 1000)])
    opened = {r["f"] for r in df.select(F.input_file_name().alias("f")).distinct().collect()}
    assert len(opened) == 1  # only the high-range file was scanned
    assert sorted(r["arrest_key"] for r in df.collect()) == sorted(f"hi{i}" for i in range(10))
    # exactness: pruning never changes semantics, only files opened
    assert df.count() == 10
    # a filter selecting nothing prunes everything and returns empty
    assert snap.read(spark, filters=[("v", "=", 500)]).count() == 0


def test_two_level_commit_carries_manifests_by_reference(spark, tmp_path):
    """Iceberg-shape metadata: each append writes ONE new content
    manifest and carries the base version's manifests by reference —
    the new version file must reuse the previous version's manifest
    paths verbatim, not rewrite the file list."""
    import json
    import os

    t = str(tmp_path / "tbl")
    for i in range(3):
        M.append(spark, _df(spark, [(f"k{i}", i)]), t)
    with open(M._version_path(t, 1)) as f:
        v1 = json.load(f)
    with open(M._version_path(t, 2)) as f:
        v2 = json.load(f)
    p1 = [r["path"] for r in v1["manifests"]]
    p2 = [r["path"] for r in v2["manifests"]]
    assert len(p1) == 2 and len(p2) == 3
    assert p2[:2] == p1  # carried by reference, no metadata rewrite
    # each content manifest holds only its own commit's files
    sizes = [
        len(M._load_content_manifest(t, p)["files"]) for p in p2
    ]
    assert sum(sizes) == len(M.snapshot(t).files)
    # aggregate ranges live in the manifest-list refs
    assert all("columns" in r for r in v2["manifests"])


def test_manifest_level_prune_skips_unopened_manifests(spark, tmp_path):
    """Two-level skip: a filter excluded by a ref's AGGREGATE ranges
    must prune that whole manifest WITHOUT opening it."""
    t = str(tmp_path / "tbl")
    low = spark.createDataFrame(
        [(f"lo{i}", i) for i in range(10)], "arrest_key string, v long"
    )
    high = spark.createDataFrame(
        [(f"hi{i}", 1000 + i) for i in range(10)], "arrest_key string, v long"
    )
    M.append(spark, low.coalesce(2), t)
    M.append(spark, high.coalesce(2), t)
    snap = M.snapshot(t)
    assert len(snap.refs) == 2 and snap.manifests_opened == 0
    kept = snap.prune([("v", ">=", 1000)])
    assert snap.manifests_opened == 1  # low-range manifest never loaded
    assert len(kept) == 2
    got = sorted(
        r["arrest_key"] for r in snap.read(spark, filters=[("v", ">=", 1000)]).collect()
    )
    assert got == sorted(f"hi{i}" for i in range(10))


def test_manifest_compaction_bounds_ref_list(spark, tmp_path, monkeypatch):
    """Past the threshold the committer rewrites metadata into one
    content manifest: the ref list stays bounded, reads stay exact,
    data files are untouched, and vacuum reclaims the superseded
    content manifests."""
    import os

    monkeypatch.setattr(M, "MANIFEST_COMPACT_THRESHOLD", 3)
    t = str(tmp_path / "tbl")
    for i in range(6):
        M.append(spark, _df(spark, [(f"k{i}", i)]), t)
    snap = M.snapshot(t)
    assert len(snap.refs) <= 3
    assert sorted(r["arrest_key"] for r in snap.read(spark).collect()) == sorted(
        f"k{i}" for i in range(6)
    )
    assert len(snap.files) == len(set(snap.files)) == sum(
        r["n_files"] for r in snap.refs
    )
    # compaction rewrote metadata only: one data file per append remains
    n_data = sum(len(fs) for _, _, fs in os.walk(os.path.join(t, "data")))
    assert n_data >= 6
    # superseded content manifests are vacuumable, table still reads
    mdir = os.path.join(t, "_manifest")
    before = sum(1 for f in os.listdir(mdir) if f.startswith("m-"))
    M.vacuum(t, keep_versions=1, retention_seconds=0.0)
    after = sum(1 for f in os.listdir(mdir) if f.startswith("m-"))
    assert after < before
    assert M.snapshot(t).read(spark).count() == 6


def test_cluster_table_tightens_pruning_and_keeps_rows(spark, tmp_path):
    """OPTIMIZE ZORDER: after cluster_table the same range filter must
    prune MORE files than before (each rewritten file covers a tight
    value range), with row-level results identical."""
    import random

    t = str(tmp_path / "tbl")
    rng = random.Random(7)
    rows = [(f"k{i}", rng.randrange(0, 1000)) for i in range(2000)]
    # interleaved value ranges: every pre-cluster file spans ~[0,1000),
    # so a narrow range filter can prune nothing
    df = _df(spark, rows).repartition(8)
    M.append(spark, df, t)
    before = M.snapshot(t)
    filt = [("v", ">=", 900)]
    kept_before = len(before.prune(filt))
    want = sorted(
        r["arrest_key"] for r in before.read(spark, filters=filt).collect()
    )
    v = M.cluster_table(spark, t, ["v"], n_files=8)
    after = M.snapshot(t)
    assert after.version == v and after.operation == "cluster"
    kept_after = len(after.prune(filt))
    assert kept_after < kept_before  # layout actually bought skipping
    got = sorted(r["arrest_key"] for r in after.read(spark, filters=filt).collect())
    assert got == want
    assert after.read(spark).count() == 2000
    # time travel: the pre-cluster snapshot still reads its old layout
    assert before.read(spark).count() == 2000


def test_rewrite_commit_carries_concurrent_append(spark, tmp_path, monkeypatch):
    """A compact/cluster whose commit races a concurrent append must
    carry the appender's manifest forward, not drop its rows (Iceberg
    RewriteFiles conflict resolution)."""
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)

    committed = {"done": False}
    orig = M._commit_refs

    def racing_commit(table_path, refs, base, operation, schema=None, **kw):
        # Inject an append AFTER the rewrite pinned its snapshot but
        # BEFORE its first claim: first rewrite attempt must conflict.
        if operation == "compact" and not committed["done"]:
            committed["done"] = True
            M.append(spark, _df(spark, [("late", 9)]), t)
        return orig(table_path, refs, base, operation, schema, **kw)

    monkeypatch.setattr(M, "_commit_refs", racing_commit)
    M.compact_table(spark, t, target_file_bytes=1 << 30)
    got = sorted(r["arrest_key"] for r in M.snapshot(t).read(spark).collect())
    assert got == ["a", "b", "late"]  # the racing append survived
    assert M.snapshot(t).operation == "compact"


def test_compact_table_reduces_file_count(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(4):
        M.append(spark, _df(spark, [(f"k{i}", i)]).repartition(4), t)
    before = M.snapshot(t).n_files
    M.compact_table(spark, t, target_file_bytes=1 << 30)
    snap = M.snapshot(t)
    assert snap.n_files < before
    assert snap.read(spark).count() == 4


def test_partition_transform_append_aligns_files_for_pruning(spark, tmp_path):
    """Hidden partitioning, writer half: append with a month transform
    must split files so a one-month filter prunes to ~one file, while
    an unpartitioned append of the same rows cannot prune at all."""
    import datetime

    rows = [
        (f"k{m}_{i}", datetime.date(2023, m, 1 + i))
        for m in (1, 2, 3)
        for i in range(5)
    ]
    schema = "arrest_key string, d date"
    flat, part = str(tmp_path / "flat"), str(tmp_path / "part")
    # force interleaving so the unpartitioned write mixes months per file
    src = spark.createDataFrame(rows, schema).repartition(3)
    M.append(spark, src, flat)
    M.append(spark, src, part, partition_by=("d", "month"))
    filt = [("d", ">=", datetime.date(2023, 2, 1)), ("d", "<", datetime.date(2023, 3, 1))]
    flat_snap, part_snap = M.snapshot(flat), M.snapshot(part)
    assert len(flat_snap.prune(filt)) == len(flat_snap.files)  # no skip
    assert len(part_snap.prune(filt)) < len(part_snap.files)
    feb = sorted(r["arrest_key"] for r in part_snap.read(spark, filters=filt).collect())
    assert feb == sorted(f"k2_{i}" for i in range(5))
    with pytest.raises(ValueError, match="unknown transform"):
        M.append(spark, src, part, partition_by=("d", "decade"))


def test_partition_spec_is_inherited_by_later_writers(spark, tmp_path):
    """Declare the layout once: appends without partition_by and txn
    merges must follow the recorded spec, so every file generation
    stays transform-aligned."""
    import datetime

    t = str(tmp_path / "tbl")
    schema = "arrest_key string, d date"

    def rows(month, keys):
        return spark.createDataFrame(
            [(k, datetime.date(2023, month, 5)) for k in keys], schema
        )

    M.append(spark, rows(1, ["a"]).union(rows(2, ["b"])), t, partition_by=("d", "month"))
    assert M.snapshot(t).partition_spec == ("d", "month")
    # plain append inherits: its two months land in two files
    before = M.snapshot(t).n_files
    M.append(spark, rows(1, ["c"]).union(rows(3, ["e"])).coalesce(1), t)
    snap = M.snapshot(t)
    assert snap.partition_spec == ("d", "month")
    assert snap.n_files == before + 2  # split by month despite coalesce(1)
    # txn merge inherits too
    M.merge_insert_if_absent_txn(
        spark, rows(1, ["f"]).union(rows(4, ["g"])).coalesce(1), t, key="arrest_key"
    )
    snap = M.snapshot(t)
    assert snap.partition_spec == ("d", "month")
    assert snap.n_files == before + 4
    # pruning to one month touches only that month's files
    filt = [("d", ">=", datetime.date(2023, 3, 1)), ("d", "<", datetime.date(2023, 4, 1))]
    assert len(snap.prune(filt)) == 1
    got = sorted(r["arrest_key"] for r in snap.read(spark).collect())
    assert got == ["a", "b", "c", "e", "f", "g"]


def test_read_changes_is_exact_file_diff(spark, tmp_path):
    """Incremental consumer: rows added between two versions, no full
    scan; a layout rewrite in the range must be refused (file diff
    would re-read rewritten rows)."""
    import pytest as _pytest

    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1)]), t)  # v0
    M.append(spark, _df(spark, [("b", 2), ("c", 3)]), t)  # v1
    M.merge_insert_if_absent_txn(spark, _df(spark, [("c", 9), ("d", 4)]), t)  # v2
    got = sorted(r["arrest_key"] for r in M.read_changes(spark, t, 0).collect())
    assert got == ["b", "c", "d"]  # only rows added after v0
    assert sorted(
        r["arrest_key"] for r in M.read_changes(spark, t, 1, 2).collect()
    ) == ["d"]
    # empty range -> empty frame with the table schema
    assert M.read_changes(spark, t, 2).count() == 0
    M.compact_table(spark, t, target_file_bytes=1 << 30)  # v3: rewrite
    with _pytest.raises(ValueError, match="re-baseline"):
        M.read_changes(spark, t, 2)
    # re-baselined past the rewrite: changes flow again
    M.append(spark, _df(spark, [("e", 5)]), t)  # v4
    assert [r["arrest_key"] for r in M.read_changes(spark, t, 3).collect()] == ["e"]


def test_many_concurrent_appends_all_land(spark, tmp_path):
    """8 threads append concurrently: every append eventually wins a
    version (bounded retries), all rows land, versions are a gapless
    chain 0..7."""
    t = str(tmp_path / "tbl")
    n_threads = 8
    errors = []

    def run(i):
        try:
            M.append(spark, _df(spark, [(f"k{i}", i)]), t, max_retries=50)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    assert M.current_version(t) == n_threads - 1
    rows = M.snapshot(t).read(spark).collect()
    assert sorted(r["arrest_key"] for r in rows) == sorted(f"k{i}" for i in range(n_threads))
    # every intermediate version remains a readable snapshot (no gaps)
    for v in range(n_threads):
        assert len(M.snapshot(t, version=v).files) >= v + 1


def test_manifest_table_stream_source_exactly_once(spark, tmp_path):
    """manifest_table streaming source: version-number offsets give
    each inserted row exactly once across restarts; a compact commit
    in the version range is skipped (data-preserving, like Delta CDF
    over OPTIMIZE) instead of re-emitting rewritten rows."""
    from nypd_arrest_etl_spark.sources.table_stream import register_manifest_table

    register_manifest_table(spark)
    t = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)  # v0
    M.append(spark, _df(spark, [("c", 3)]), t)  # v1

    def run_once():
        q = (
            spark.readStream.format("manifest_table")
            .option("path", t)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r["arrest_key"] for r in spark.read.parquet(sink).collect())

    assert run_once() == ["a", "b", "c"]  # full history on first run
    # rewrite + new data: restart must emit ONLY the new rows
    M.compact_table(spark, t, target_file_bytes=1 << 30)  # v2 (skipped)
    M.merge_insert_if_absent_txn(spark, _df(spark, [("c", 9), ("d", 4)]), t)  # v3
    assert run_once() == ["a", "b", "c", "d"]  # d once, c not re-emitted
    # no new versions -> empty batch, nothing duplicated
    assert run_once() == ["a", "b", "c", "d"]


def test_manifest_table_batch_read_and_time_travel(spark, tmp_path):
    from nypd_arrest_etl_spark.sources.table_stream import register_manifest_table

    register_manifest_table(spark)
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1)]), t)
    wide = spark.createDataFrame([("b", 2, "x")], "arrest_key string, v long, extra string")
    M.append(spark, wide, t)
    df = spark.read.format("manifest_table").option("path", t).load()
    rows = {r["arrest_key"]: r["extra"] for r in df.collect()}
    # old file pads the evolved column with typed nulls
    assert rows == {"a": None, "b": "x"}
    v0 = (
        spark.read.format("manifest_table")
        .option("path", t)
        .option("versionAsOf", 0)
        .load()
    )
    assert [r["arrest_key"] for r in v0.collect()] == ["a"]


def test_merge_prunes_table_scan_to_incoming_key_range(spark, tmp_path, monkeypatch):
    """The merge anti-join must read only files overlapping the
    incoming batch's key range (sound for an equality anti-join), and
    still reject dups / insert fresh keys exactly."""
    t = str(tmp_path / "tbl")
    # three appends with disjoint, tight key ranges -> one file each
    M.append(spark, _df(spark, [("a1", 1), ("a2", 2)]).coalesce(1), t)
    M.append(spark, _df(spark, [("m1", 3), ("m2", 4)]).coalesce(1), t)
    M.append(spark, _df(spark, [("z1", 5), ("z2", 6)]).coalesce(1), t)

    seen = {}
    orig = M.Snapshot.read

    def spy(self, spark_, filters=None):
        seen["filters"] = filters
        seen["files"] = self.prune(filters) if filters else list(self.files)
        return orig(self, spark_, filters)

    monkeypatch.setattr(M.Snapshot, "read", spy)
    n, _ = M.merge_insert_if_absent_txn(
        spark, _df(spark, [("m1", 9), ("m9", 7)]), t, key="arrest_key"
    )
    assert n == 1  # m1 rejected, m9 inserted
    assert seen["filters"] == [("arrest_key", ">=", "m1"), ("arrest_key", "<=", "m9")]
    assert len(seen["files"]) == 1  # only the m-range file was scanned
    monkeypatch.undo()
    rows = {r["arrest_key"]: r["v"] for r in M.snapshot(t).read(spark).collect()}
    assert rows == {"a1": 1, "a2": 2, "m1": 3, "m2": 4, "z1": 5, "z2": 6, "m9": 7}


# ---------------------------------------------------------------------------
# Pruning soundness properties (pure Python, no Spark): skipping is an
# OPTIMIZATION — for any stats layout and any filter, a row matching
# the filter must live in a file that survives both pruning levels.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_vals = st.integers(min_value=-50, max_value=50)
# a file: its rows, plus whether its stats are known to the manifest
_file = st.tuples(st.lists(_vals, min_size=1, max_size=5), st.booleans())
_op = st.sampled_from(["=", "<", "<=", ">", ">="])


@settings(max_examples=300, deadline=None)
@given(
    manifests=st.lists(
        st.lists(_file, min_size=1, max_size=4), min_size=1, max_size=4
    ),
    op=_op,
    value=_vals,
)
def test_two_level_prune_never_drops_a_matching_row(manifests, op, value):
    import operator as _o

    cmp = {"=": _o.eq, "<": _o.lt, "<=": _o.le, ">": _o.gt, ">=": _o.ge}[op]
    filters = [("v", op, value)]
    # build per-file stats + manifest refs exactly as the writers do
    fid = 0
    survivors = set()
    all_matching_files = set()
    for files in manifests:
        names, stats = [], {}
        for rows, has_stats in files:
            name = f"f{fid}"
            fid += 1
            names.append(name)
            if has_stats:
                stats[name] = {
                    "rows": len(rows),
                    "columns": {"v": {"min": min(rows), "max": max(rows)}},
                }
            if any(cmp(r, value) for r in rows):
                all_matching_files.add(name)
        ref = {"columns": M._aggregate_ranges(names, stats)["columns"]}
        if not M._ref_may_match(ref, filters):
            continue  # manifest-level skip
        survivors.update(
            n for n in names if M._file_may_match(stats.get(n), filters)
        )
    # soundness: no file containing a matching row was pruned
    assert all_matching_files <= survivors


@settings(max_examples=200, deadline=None)
@given(
    base=st.lists(
        st.tuples(st.sampled_from("abcd"), st.sampled_from(["bigint", "string"])),
        min_size=1,
        max_size=4,
        unique_by=lambda c: c[0],
    ),
    incoming=st.lists(
        st.tuples(
            st.sampled_from("abcdef"),
            st.sampled_from(["bigint", "string"]),
            st.booleans(),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda c: c[0],
    ),
)
def test_schema_evolution_check_is_sound(base, incoming):
    """The check accepts EXACTLY the legal evolutions: no dropped
    column, no type change, new columns nullable."""
    b = [{"name": n, "type": t, "nullable": True} for n, t in base]
    i = [{"name": n, "type": t, "nullable": nl} for n, t, nl in incoming]
    bt, it = dict(base), {n: t for n, t, _ in incoming}
    legal = (
        set(bt) <= set(it)
        and all(it[n] == t for n, t in bt.items())
        and all(nl for n, _, nl in incoming if n not in bt)
    )
    try:
        M._check_schema_evolution(b, i)
        ok = True
    except M.SchemaEvolutionError:
        ok = False
    assert ok == legal


def test_commit_protocol_is_claim_agnostic(spark, tmp_path, monkeypatch):
    """Swap the POSIX hard-link claim for a catalog-style CAS (the
    object-store conditional-PUT seam): the 8-way concurrent append
    race must still produce a gapless version chain with every row
    landing — proving the protocol never depended on filesystem
    atomicity, only on SOME compare-and-set primitive."""
    import shutil

    lock = threading.Lock()
    claimed = set()

    def cas_claim(tmp_path_, version_path):
        with lock:  # the catalog's CAS: one winner per version key
            if version_path in claimed or os.path.exists(version_path):
                raise FileExistsError(version_path)
            claimed.add(version_path)
        # control plane won -> data plane write (only the winner writes)
        shutil.copyfile(tmp_path_, version_path)

    import os

    monkeypatch.setattr(M, "_claim_version", cas_claim)
    t = str(tmp_path / "tbl")
    errors = []

    def run(i):
        try:
            M.append(spark, _df(spark, [(f"k{i}", i)]), t, max_retries=50)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    assert M.current_version(t) == 7
    rows = sorted(r["arrest_key"] for r in M.snapshot(t).read(spark).collect())
    assert rows == sorted(f"k{i}" for i in range(8))


def test_manifest_table_batch_pushdown_skips_files(spark, tmp_path):
    """spark.read.format("manifest_table") with a range filter must
    scan only the stat-matching files (pushFilters -> manifest prune)
    while returning exact rows (engine re-checks row-level)."""
    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark.sources.table_stream import register_manifest_table

    register_manifest_table(spark)
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [(f"lo{i}", i) for i in range(5)]).coalesce(1), t)
    M.append(
        spark, _df(spark, [(f"hi{i}", 1000 + i) for i in range(5)]).coalesce(1), t
    )
    df = (
        spark.read.format("manifest_table")
        .option("path", t)
        .option("pushdown", "true")  # opt-in: see ManifestBatchReader docs
        .load()
        .filter(F.col("v") >= 1000)
    )
    rows = sorted(r["arrest_key"] for r in df.collect())
    assert rows == sorted(f"hi{i}" for i in range(5))
    # the low-range file contributes no input partition: with one file
    # per generation, exactly one task reads data
    assert df.rdd.getNumPartitions() == 1


def test_manifest_table_default_read_is_reuse_safe(spark, tmp_path):
    """Without option("pushdown"), a filterless query on a previously
    filtered DataFrame object must still see every row — the Spark 4.1
    plan-reuse quirk (see sources/pg_source.py) would otherwise replay
    the pruned partition list and silently drop the skipped files'
    rows (this exact sequence returned 50-for-300 before r8 made
    skipping opt-in)."""
    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark.sources.table_stream import register_manifest_table

    register_manifest_table(spark)
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [(f"lo{i}", i) for i in range(5)]).coalesce(1), t)
    M.append(
        spark, _df(spark, [(f"hi{i}", 1000 + i) for i in range(5)]).coalesce(1), t
    )
    ds = spark.read.format("manifest_table").option("path", t).load()
    assert ds.filter(F.col("v") >= 1000).count() == 5
    assert ds.count() == 10, "plan reuse dropped pruned files' rows"


@pytest.mark.parametrize("backend", ["hardlink", "conditional_put"])
def test_random_walk_matches_model(spark, tmp_path, monkeypatch, backend, request):
    """Model-based sequence test: a seeded random walk of appends,
    merges, layout rewrites and vacuums must always read back exactly
    the model's rows (merge = first-writer-wins set semantics, append
    = multiset), with a gapless version chain. Runs twice: once on the
    POSIX hard-link claim and once through the S3 conditional-PUT
    client against a live local fake-S3 (r6) — the full 60-step,
    15-op state machine as integration evidence for the object-store
    commit backend, not just the threaded race shapes."""
    import random

    if backend == "conditional_put":
        from nypd_arrest_etl_spark.sinks.object_store import (
            S3ConditionalPutClient,
            make_claim_version,
        )
        from tests.fake_s3 import FakeS3Server

        srv = FakeS3Server().__enter__()
        request.addfinalizer(lambda: srv.__exit__(None, None, None))
        client = S3ConditionalPutClient(srv.endpoint, "warehouse")
        monkeypatch.setattr(M, "_claim_version", make_claim_version(client))

    rng = random.Random(20260814)
    t = str(tmp_path / "tbl")
    model: dict[str, int] = {}  # key -> first-written v
    appended: list[tuple[str, int]] = []
    # committed version -> deep-copied model state, for restore targets
    states: dict[int, tuple[dict, list]] = {}
    vacuumed = [False]
    vcol = ["v"]  # current name of the value column (rename op evolves it)

    def mk(rows):
        return spark.createDataFrame(rows, f"arrest_key string, {vcol[0]} long")

    # separate stream for point-lookup probes so adding them does not
    # perturb the op sequence rng draws
    rng2 = random.Random(99)
    probe_i = [0]

    def check(history=True):
        snap = M.snapshot(t)
        if snap is None:
            assert not model and not appended
            return
        got = sorted((r["arrest_key"], r[vcol[0]]) for r in snap.read(spark).collect())
        want = sorted(appended + list(model.items()))
        assert got == want
        # metadata COUNT(*) always agrees with the scan
        assert M.row_count(t) == len(want)
        # bloom-pruned point lookup (the table declared bloom_cols on
        # arrest_key at v0): a present key reads exactly its model
        # rows and an absent key reads empty, through whatever mix of
        # tombstones, eq-deletes, renames and rewrites the walk built
        probe_i[0] += 1
        if want and probe_i[0] % 3 == 0:
            pk = rng2.choice([k for k, _ in want])
            got_k = sorted(
                r[vcol[0]]
                for r in snap.read(
                    spark, filters=[("arrest_key", "=", pk)]
                ).collect()
            )
            assert got_k == sorted(v for k2, v in want if k2 == pk)
            absent = snap.read(
                spark, filters=[("arrest_key", "=", f"absent-{probe_i[0]}")]
            )
            assert absent.count() == 0

    next_key = [0]

    def fresh_keys(n):
        ks = [f"k{next_key[0] + i}" for i in range(n)]
        next_key[0] += n
        return ks

    # seed commit declares bloom sidecars on the key column, so every
    # later writer in the walk (merges, upserts, streams, rewrites)
    # builds bitmaps and every check()'s point lookup probes them
    seed = [(k, 1) for k in fresh_keys(2)]
    M.append(spark, mk(seed), t, bloom_cols=("arrest_key",))
    appended.extend(seed)
    states[M.current_version(t)] = (dict(model), list(appended), vcol[0])

    for step in range(60):
        op = rng.choice(
            ["append", "merge", "merge_dup", "compact", "cluster", "delete",
             "update", "delete_mor", "materialize", "stream_append", "upsert",
             "upsert_eq", "restore", "vacuum", "rename"]
        )
        if op == "append":
            rows = [(k, rng.randrange(100)) for k in fresh_keys(rng.randint(1, 3))]
            M.append(spark, mk(rows), t)
            appended.extend(rows)
        elif op == "merge":
            rows = [(k, rng.randrange(100)) for k in fresh_keys(rng.randint(1, 3))]
            M.merge_insert_if_absent_txn(spark, mk(rows), t)
            # merge keys are fresh and distinct -> all insert
            model.update(dict(rows))
        elif op == "merge_dup" and (model or appended):
            # re-offer existing keys with NEW values: first-writer-wins
            # must reject every one
            existing = [k for k, _ in appended] + list(model)
            rows = [(k, 999) for k in rng.sample(existing, min(2, len(existing)))]
            n, _ = M.merge_insert_if_absent_txn(spark, mk(rows), t)
            assert n == 0
        elif op == "delete" and M.snapshot(t) is not None:
            cut = rng.randrange(100)
            n, _ = M.delete_where(spark, t, [(vcol[0], ">=", cut)])
            gone_a = [r for r in appended if r[1] >= cut]
            gone_m = {k for k, v in model.items() if v >= cut}
            assert n == len(gone_a) + len(gone_m)
            appended[:] = [r for r in appended if r[1] < cut]
            for k in gone_m:
                del model[k]
        elif op == "update" and M.snapshot(t) is not None:
            cut = rng.randrange(100)
            n, _ = M.update_where(spark, t, [(vcol[0], "=", cut)], {vcol[0]: cut + 1000})
            hits = [i for i, r in enumerate(appended) if r[1] == cut]
            mkeys = [k for k, v in model.items() if v == cut]
            assert n == len(hits) + len(mkeys)
            for i in hits:
                appended[i] = (appended[i][0], cut + 1000)
            for k in mkeys:
                model[k] = cut + 1000
        elif op == "upsert" and (model or appended):
            # re-offer one existing key with a new value + one fresh key
            existing = [k for k, _ in appended] + list(model)
            hit = rng.choice(existing)
            (new_k,) = fresh_keys(1)
            rows = [(hit, 777), (new_k, rng.randrange(100))]
            upd, ins, _ = M.merge_upsert_txn(spark, mk(rows), t)
            # a key duplicated in the table still counts as ONE update
            assert (upd, ins) == (1, 1)
            appended[:] = [r for r in appended if r[0] != hit]
            model.pop(hit, None)
            model[hit] = 777
            model[new_k] = rows[1][1]
        elif op == "stream_append":
            import pyarrow as _pa

            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
                StructType,
            )

            from nypd_arrest_etl_spark.sources.table_stream import (
                ManifestStreamWriter,
            )

            rows = [(k, rng.randrange(100)) for k in fresh_keys(rng.randint(1, 2))]
            sch = StructType(
                [StructField("arrest_key", StringType()), StructField(vcol[0], LongType())]
            )
            sw = ManifestStreamWriter(sch, {"path": t, "streamid": "walk"})
            batch = _pa.record_batch(
                {"arrest_key": [k for k, _ in rows], vcol[0]: [v for _, v in rows]}
            )
            sw.commit([sw.write(iter([batch]))], step)  # step = unique batch id
            appended.extend(rows)
        elif op == "delete_mor" and M.snapshot(t) is not None:
            cut = rng.randrange(100)
            n, _ = M.delete_where_mor(spark, t, [(vcol[0], "<", cut)])
            gone_a = [r for r in appended if r[1] < cut]
            gone_m = {k for k, v in model.items() if v < cut}
            assert n == len(gone_a) + len(gone_m)
            appended[:] = [r for r in appended if r[1] >= cut]
            for k in gone_m:
                del model[k]
        elif op == "materialize" and M.snapshot(t) is not None:
            M.materialize_deletes(spark, t)
            assert M.snapshot(t).delete_refs == []
        elif op == "upsert_eq" and (model or appended):
            # equality-delete upsert: EVERY older copy of the key is
            # superseded, the new payload + one fresh key land O(batch)
            existing = [k for k, _ in appended] + list(model)
            hit = rng.choice(existing)
            (new_k,) = fresh_keys(1)
            rows = [(hit, 888), (new_k, rng.randrange(100))]
            n, _ = M.merge_upsert_eq_txn(spark, mk(rows), t)
            assert n == 2
            appended[:] = [r for r in appended if r[0] != hit]
            model.pop(hit, None)
            model[hit] = 888
            model[new_k] = rows[1][1]
        elif op == "rename" and M.snapshot(t) is not None:
            # evolve op: flip the value column's name; every later
            # step (filters, updates, streams, reads) uses the new
            # name while old files keep the old one on disk
            new_name = "val" if vcol[0] == "v" else "v"
            M.rename_column(t, vcol[0], new_name)
            vcol[0] = new_name
        elif op == "restore" and states:
            target = rng.choice(sorted(states))
            M.restore(t, target)
            m, a, vc = states[target]
            model.clear()
            model.update(m)
            appended[:] = list(a)
            vcol[0] = vc  # restore rolls the schema (and any rename) back
        elif op == "vacuum" and M.snapshot(t) is not None:
            # the walk is single-threaded, so the table is quiesced —
            # retention 0 is the documented safe case
            keep = rng.randint(2, 5)
            M.vacuum(t, keep_versions=keep, retention_seconds=0.0)
            vacuumed[0] = True
            horizon = M.current_version(t) - keep + 1
            for v in [v for v in states if v < horizon]:
                del states[v]
        elif op in ("compact", "cluster") and M.snapshot(t) is not None:
            if op == "compact":
                M.compact_table(spark, t, target_file_bytes=1 << 30)
            else:
                M.cluster_table(spark, t, [vcol[0]], n_files=2)
        check(history=not vacuumed[0])
        head = M.current_version(t)
        if head is not None:
            states[head] = (dict(model), list(appended), vcol[0])
    M.vacuum(t, keep_versions=1, retention_seconds=0.0)
    check(history=False)  # old versions legitimately dropped


def test_history_reports_versions_and_deltas(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)
    M.merge_insert_if_absent_txn(spark, _df(spark, [("b", 9), ("c", 3)]), t)
    M.compact_table(spark, t, target_file_bytes=1 << 30)
    h = M.history(t)
    assert [e["version"] for e in h] == [2, 1, 0]  # newest first
    assert [e["operation"] for e in h] == ["compact", "merge", "append"]
    assert h[-1]["n_rows"] == 2 and h[-1]["rows_delta"] is None
    assert h[1]["rows_delta"] == 1  # merge inserted exactly c
    assert h[0]["rows_delta"] == 0  # compaction preserves rows
    assert all(e["committed_at"] is not None for e in h)


def test_delete_where_rewrites_only_candidate_files(spark, tmp_path):
    """Copy-on-write delete: only stat-matching files are read and
    rewritten; out-of-range generations keep their EXACT file paths
    (carried by reference); time travel still sees deleted rows."""
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [(f"lo{i}", i) for i in range(5)]).coalesce(1), t)
    M.append(
        spark, _df(spark, [(f"hi{i}", 1000 + i) for i in range(5)]).coalesce(1), t
    )
    before = M.snapshot(t)
    lo_files = set(before.prune([("v", "<", 100)]))
    n, v = M.delete_where(spark, t, [("v", "=", 1002)])
    assert n == 1
    snap = M.snapshot(t)
    assert snap.version == v and snap.operation == "delete"
    rows = sorted(r["arrest_key"] for r in snap.read(spark).collect())
    assert rows == sorted(["lo0", "lo1", "lo2", "lo3", "lo4", "hi0", "hi1", "hi3", "hi4"])
    # the low generation's file survived untouched, same path
    assert lo_files <= set(snap.files)
    # time travel: pre-delete snapshot still reads hi2
    assert before.read(spark).count() == 10
    # no-op delete commits nothing
    assert M.delete_where(spark, t, [("v", "=", 1002)]) == (0, v)
    # row counts in history reflect the delete
    h = M.history(t)
    assert h[0]["operation"] == "delete" and h[0]["rows_delta"] == -1


def test_delete_breaks_change_feeds_explicitly(spark, tmp_path):
    from nypd_arrest_etl_spark.sources.table_stream import register_manifest_table

    register_manifest_table(spark)
    t = str(tmp_path / "tbl")
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "out")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)

    def run_once():
        q = (
            spark.readStream.format("manifest_table")
            .option("path", t)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # consume v0
    M.delete_where(spark, t, [("v", "=", 1)])  # v1: delete
    with pytest.raises(Exception, match="delete commit|retraction"):
        run_once()
    with pytest.raises(ValueError, match="re-baseline"):
        M.read_changes(spark, t, 0)


def test_update_where_transforms_only_matching_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [(f"lo{i}", i) for i in range(5)]).coalesce(1), t)
    M.append(
        spark, _df(spark, [(f"hi{i}", 1000 + i) for i in range(5)]).coalesce(1), t
    )
    lo_files = set(M.snapshot(t).prune([("v", "<", 100)]))
    n, v = M.update_where(
        spark, t, [("v", ">=", 1003)], {"v": F.col("v") + 10000, "arrest_key": "redacted"}
    )
    assert n == 2  # hi3, hi4
    snap = M.snapshot(t)
    assert snap.operation == "update" and snap.version == v
    rows = sorted((r["arrest_key"], r["v"]) for r in snap.read(spark).collect())
    assert ("redacted", 11003) in rows and ("redacted", 11004) in rows
    assert ("hi0", 1000) in rows and ("lo0", 0) in rows
    assert len(rows) == 10  # updates never change cardinality
    assert lo_files <= set(snap.files)  # non-candidate file untouched
    with pytest.raises(ValueError, match="re-baseline"):
        M.read_changes(spark, t, 0)


def test_mor_delete_tombstones_without_rewriting_files(spark, tmp_path):
    from nypd_arrest_etl_spark.sources.table_stream import register_manifest_table

    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)
    M.append(spark, _df(spark, [("c", 3), ("d", 4)]), t)
    files_before = M.snapshot(t).files
    n, v = M.delete_where_mor(spark, t, [("arrest_key", "=", "b")])
    assert (n, v) == (1, 2)
    snap = M.snapshot(t)
    # zero data files rewritten: the file list is IDENTICAL
    assert snap.files == files_before
    assert len(snap.delete_refs) == 1
    assert sorted(r["arrest_key"] for r in snap.read(spark).collect()) == [
        "a",
        "c",
        "d",
    ]
    # pruned reads apply tombstones too
    got = snap.read(spark, filters=[("v", "<=", 2)]).collect()
    assert sorted(r["arrest_key"] for r in got) == ["a"]
    # the DataSource batch path masks tombstoned positions as well
    register_manifest_table(spark)
    ds = spark.read.format("manifest_table").option("path", t).load()
    assert sorted(r["arrest_key"] for r in ds.collect()) == ["a", "c", "d"]
    # time travel BEFORE the delete still sees the row
    old = M.snapshot(t, version=1)
    assert sorted(r["arrest_key"] for r in old.read(spark).collect()) == [
        "a",
        "b",
        "c",
        "d",
    ]


def test_mor_delete_is_idempotent_and_stacks(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2), ("c", 3)]), t)
    n1, v1 = M.delete_where_mor(spark, t, [("arrest_key", "=", "a")])
    assert (n1, v1) == (1, 1)
    # same predicate again: already tombstoned -> no-op, no new version
    n2, v2 = M.delete_where_mor(spark, t, [("arrest_key", "=", "a")])
    assert (n2, v2) == (0, 1)
    # a second delete STACKS with the first
    n3, _ = M.delete_where_mor(spark, t, [("v", ">=", 3)])
    assert n3 == 1
    snap = M.snapshot(t)
    assert len(snap.delete_refs) == 2
    assert [r["arrest_key"] for r in snap.read(spark).collect()] == ["b"]


def test_mor_tombstones_survive_cow_update_and_merge(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2), ("c", 3)]), t)
    M.delete_where_mor(spark, t, [("arrest_key", "=", "b")])
    # COW update on ANOTHER row must not resurrect the tombstoned one
    n, _ = M.update_where(spark, t, [("arrest_key", "=", "c")], {"v": 30})
    assert n == 1
    got = {r["arrest_key"]: r["v"] for r in M.snapshot(t).read(spark).collect()}
    assert got == {"a": 1, "c": 30}
    # the merge's anti-join sees the key as absent: re-insert allowed
    ins, _ = M.merge_insert_if_absent_txn(spark, _df(spark, [("b", 99)]), t)
    assert ins == 1
    got = {r["arrest_key"]: r["v"] for r in M.snapshot(t).read(spark).collect()}
    assert got == {"a": 1, "b": 99, "c": 30}


def test_materialize_deletes_folds_tombstones_into_data(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)
    M.append(spark, _df(spark, [("c", 3)]), t)
    M.delete_where_mor(spark, t, [("arrest_key", "=", "a")])
    v = M.materialize_deletes(spark, t)
    snap = M.snapshot(t)
    assert snap.version == v and snap.operation == "materialize"
    assert snap.delete_refs == []
    assert sorted(r["arrest_key"] for r in snap.read(spark).collect()) == ["b", "c"]
    # only the tombstoned file was rewritten; the ("c") file survived
    assert any("deletes-" not in f for f in snap.files)
    # nothing to fold -> no new version
    assert M.materialize_deletes(spark, t) == v
    # after the fold, tombstone parquets are vacuum-able orphans
    deleted = M.vacuum(t, keep_versions=1, retention_seconds=0.0)
    assert deleted > 0
    assert sorted(r["arrest_key"] for r in M.snapshot(t).read(spark).collect()) == [
        "b",
        "c",
    ]


def test_compact_applies_and_clears_mor_tombstones(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)
    M.append(spark, _df(spark, [("c", 3)]), t)
    M.delete_where_mor(spark, t, [("arrest_key", "=", "b")])
    M.compact_table(spark, t, target_file_bytes=1 << 30)
    snap = M.snapshot(t)
    assert snap.delete_refs == []
    assert sorted(r["arrest_key"] for r in snap.read(spark).collect()) == ["a", "c"]


def test_mor_delete_breaks_change_feeds_and_stream(spark, tmp_path):
    import pytest as _pytest

    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1)]), t)
    M.delete_where_mor(spark, t, [("arrest_key", "=", "a")])
    M.append(spark, _df(spark, [("b", 2)]), t)
    with _pytest.raises(ValueError, match="delete_mor"):
        M.read_changes(spark, t, from_version=0)
    # materialize IS data-preserving: read_changes refuses (re-baseline)
    M.materialize_deletes(spark, t)
    with _pytest.raises(ValueError, match="materialize"):
        M.read_changes(spark, t, from_version=1)


def test_concurrent_mor_deletes_both_land(spark, tmp_path):
    """Two threads tombstone DISJOINT predicates concurrently: the
    commit-race loser retries (its referenced files are still live),
    so both delete sets apply and stack."""
    t = str(tmp_path / "tbl")
    M.append(
        spark, _df(spark, [("a", 1), ("b", 2), ("c", 3), ("d", 4)]), t
    )
    errors = []

    def worker(filters):
        try:
            M.delete_where_mor(spark, t, filters)
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    ts = [
        threading.Thread(target=worker, args=([("v", "=", 1)],)),
        threading.Thread(target=worker, args=([("v", "=", 4)],)),
    ]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert not errors
    snap = M.snapshot(t)
    assert len(snap.delete_refs) == 2  # both tombstone sets live
    assert sorted(r["arrest_key"] for r in snap.read(spark).collect()) == [
        "b",
        "c",
    ]


def test_mor_delete_recomputes_when_rewrite_replaces_its_file(
    spark, tmp_path, monkeypatch
):
    """A compaction that lands between the MOR delete's read and its
    commit replaces the tombstoned file — committing stale positions
    would silently UNdelete. The validity check must recompute."""
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)
    real_carry = M._carry_refs
    fired = {"done": False}

    def carry_with_race(snap):
        # injected once, inside delete_where_mor's commit loop: compact
        # the table right before the delete commits, so its version
        # claim conflicts AND its tombstoned file leaves the table
        if not fired["done"]:
            fired["done"] = True
            M.compact_table(spark, t, target_file_bytes=1 << 30)
        return real_carry(snap)

    monkeypatch.setattr(M, "_carry_refs", carry_with_race)
    n, _ = M.delete_where_mor(spark, t, [("arrest_key", "=", "a")])
    monkeypatch.undo()
    assert n == 1
    assert sorted(
        r["arrest_key"] for r in M.snapshot(t).read(spark).collect()
    ) == ["b"]


def test_manifest_table_stream_sink_end_to_end(spark, tmp_path):
    """writeStream.format('manifest_table'): version-offset source piped
    into the transactional sink; each microbatch commits one
    stream_append version and incremental reruns move only new rows."""
    from nypd_arrest_etl_spark.sources.table_stream import register_manifest_table

    register_manifest_table(spark)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), src)

    def run():
        q = (
            spark.readStream.format("manifest_table")
            .option("path", src)
            .load()
            .writeStream.format("manifest_table")
            .option("path", dst)
            .option("streamId", "s1")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    snap = M.snapshot(dst)
    assert snap.operation == "stream_append"
    assert sorted(r["arrest_key"] for r in snap.read(spark).collect()) == ["a", "b"]
    M.append(spark, _df(spark, [("c", 3)]), src)
    run()
    assert sorted(
        r["arrest_key"] for r in M.snapshot(dst).read(spark).collect()
    ) == ["a", "b", "c"]
    # rerun with no new source versions: no new sink version
    v = M.snapshot(dst).version
    run()
    assert M.snapshot(dst).version == v


def test_manifest_table_stream_sink_replay_is_exactly_once(spark, tmp_path):
    """Driver-level replay of the SAME batchId (crash between sink
    commit and checkpoint commit) must commit nothing the second time —
    the txn {stream_id, batch_id} watermark recognizes it."""
    import pyarrow as pa

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from nypd_arrest_etl_spark.sources.table_stream import ManifestStreamWriter

    t = str(tmp_path / "tbl")
    schema = StructType(
        [StructField("arrest_key", StringType()), StructField("v", LongType())]
    )
    w = ManifestStreamWriter(schema, {"path": t, "streamid": "s1"})
    batch = pa.record_batch({"arrest_key": ["x", "y"], "v": [1, 2]})
    msg = w.write(iter([batch]))
    w.commit([msg], 0)
    assert M.snapshot(t).version == 0
    # REPLAY batch 0 (fresh files written, same batch id) -> no-op
    msg2 = w.write(iter([batch]))
    w.commit([msg2], 0)
    assert M.snapshot(t).version == 0
    rows = sorted(r["arrest_key"] for r in M.snapshot(t).read(spark).collect())
    assert rows == ["x", "y"]
    # next batch commits normally
    msg3 = w.write(iter([pa.record_batch({"arrest_key": ["z"], "v": [9]})]))
    w.commit([msg3], 1)
    assert M.snapshot(t).version == 1
    assert sorted(
        r["arrest_key"] for r in M.snapshot(t).read(spark).collect()
    ) == ["x", "y", "z"]
    # empty batch: no version
    w.commit([w.write(iter([]))], 2)
    assert M.snapshot(t).version == 1


def test_row_count_from_metadata_matches_read(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2), ("c", 3)]), t)
    assert M.row_count(t) == 3
    M.delete_where_mor(spark, t, [("v", ">=", 2)])
    assert M.row_count(t) == 1  # tombstones subtracted, no scan
    assert M.row_count(t) == M.snapshot(t).read(spark).count()
    # time travel counts the pre-delete version
    assert M.row_count(t, version=0) == 3
    # materialize folds tombstones; count unchanged
    M.materialize_deletes(spark, t)
    assert M.row_count(t) == 1
    # stale tombstones after a rewrite are inert in the count too
    M.append(spark, _df(spark, [("d", 4)]), t)
    M.delete_where_mor(spark, t, [("arrest_key", "=", "d")])
    M.compact_table(spark, t, target_file_bytes=1 << 30)
    assert M.row_count(t) == M.snapshot(t).read(spark).count() == 1


def test_overlapping_concurrent_mor_deletes_keep_count_exact(spark, tmp_path):
    """OVERLAPPING predicates from two threads: the loser must detect
    the winner's new delete manifest and recompute, so no (file, pos)
    is tombstoned twice and the metadata row_count stays exact."""
    t = str(tmp_path / "tbl")
    M.append(
        spark, _df(spark, [("a", 1), ("b", 2), ("c", 2), ("d", 3)]), t
    )
    results, errors = [], []

    def worker(filters):
        try:
            results.append(M.delete_where_mor(spark, t, filters))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    ts = [
        threading.Thread(target=worker, args=([("v", "<=", 2)],)),
        threading.Thread(target=worker, args=([("v", "=", 2)],)),
    ]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert not errors
    snap = M.snapshot(t)
    remaining = sorted(r["arrest_key"] for r in snap.read(spark).collect())
    assert remaining == ["d"]
    # reported deletions sum to rows actually removed (no double count)
    assert sum(n for n, _ in results) == 3
    # metadata count agrees with the scan
    assert M.row_count(t) == 1


def test_materialize_redoes_when_cow_delete_races(spark, tmp_path, monkeypatch):
    """A COW delete that lands between materialize's read and commit
    replaces base manifests — committing stale stripped copies would
    duplicate rows and resurrect the COW-deleted ones. The ref-subset
    check must force a redo."""
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2), ("c", 3)]), t)
    M.delete_where_mor(spark, t, [("arrest_key", "=", "a")])
    real_strip_marker = M._write_content_manifest
    fired = {"done": False}

    def manifest_with_race(table_path, files, stats, **kw):
        # first content-manifest write inside materialize: inject a
        # concurrent COW delete of 'c' before materialize commits
        if not fired["done"]:
            fired["done"] = True
            ref = real_strip_marker(table_path, files, stats, **kw)
            M.delete_where(spark, t, [("arrest_key", "=", "c")])
            return ref
        return real_strip_marker(table_path, files, stats, **kw)

    monkeypatch.setattr(M, "_write_content_manifest", manifest_with_race)
    M.materialize_deletes(spark, t)
    monkeypatch.undo()
    got = sorted(r["arrest_key"] for r in M.snapshot(t).read(spark).collect())
    # 'a' stays MOR-deleted (materialized), 'c' stays COW-deleted,
    # 'b' appears exactly once
    assert got == ["b"]
    assert M.snapshot(t).delete_refs == []
    assert M.row_count(t) == 1


def test_stream_sink_commits_after_vacuum_dropped_old_versions(spark, tmp_path):
    import pyarrow as pa

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from nypd_arrest_etl_spark.sources.table_stream import ManifestStreamWriter

    t = str(tmp_path / "tbl")
    for i in range(3):
        M.append(spark, _df(spark, [(f"k{i}", i)]), t)
    M.vacuum(t, keep_versions=1, retention_seconds=0.0)  # v0, v1 gone
    schema = StructType(
        [StructField("arrest_key", StringType()), StructField("v", LongType())]
    )
    w = ManifestStreamWriter(schema, {"path": t, "streamid": "fresh"})
    # the txn walk hits the vacuum horizon and treats it as "no marker"
    msg = w.write(iter([pa.record_batch({"arrest_key": ["z"], "v": [9]})]))
    w.commit([msg], 0)
    assert sorted(
        r["arrest_key"] for r in M.snapshot(t).read(spark).collect()
    ) == ["k0", "k1", "k2", "z"]


def test_merge_upsert_updates_and_inserts_atomically(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)
    # duplicate of key 'a' in the TABLE via a second raw append
    M.append(spark, _df(spark, [("a", 10), ("c", 3)]), t)
    upd, ins, v = M.merge_upsert_txn(
        spark, _df(spark, [("a", 100), ("d", 4), ("d", 9)]), t
    )
    # 'a' is ONE updated key (both table copies tombstoned); 'd' is one
    # insert (in-batch dup collapsed first-writer-wins)
    assert (upd, ins) == (1, 1)
    got = {r["arrest_key"]: r["v"] for r in M.snapshot(t).read(spark).collect()}
    assert got == {"a": 100, "b": 2, "c": 3, "d": 4}
    # ONE version carries both the tombstones and the new data
    assert M.snapshot(t).version == v and M.snapshot(t).operation == "upsert"
    assert len(M.snapshot(t).delete_refs) == 1
    # metadata count stays exact through the upsert
    assert M.row_count(t) == 4
    # an upsert of only-existing keys updates without inserting
    upd2, ins2, _ = M.merge_upsert_txn(spark, _df(spark, [("b", 20)]), t)
    assert (upd2, ins2) == (1, 0)
    assert {
        r["arrest_key"]: r["v"] for r in M.snapshot(t).read(spark).collect()
    }["b"] == 20


def test_upsert_breaks_change_feed_and_stream(spark, tmp_path):
    import pytest as _pytest

    from nypd_arrest_etl_spark.sources.table_stream import register_manifest_table

    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1)]), t)
    M.merge_upsert_txn(spark, _df(spark, [("a", 2)]), t)
    with _pytest.raises(ValueError, match="upsert"):
        M.read_changes(spark, t, from_version=0)
    register_manifest_table(spark)
    sink = str(tmp_path / "out")
    q = (
        spark.readStream.format("manifest_table")
        .option("path", t)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with _pytest.raises(Exception, match="upsert"):
        q.awaitTermination(120)
        raise RuntimeError("stream should have failed on the upsert commit")


def test_in_filter_prunes_reads_and_drives_key_set_takedown(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "tbl")
    low = spark.createDataFrame(
        [(f"k{i:03d}", i) for i in range(10)], "arrest_key string, v long"
    )
    high = spark.createDataFrame(
        [(f"z{i:03d}", 1000 + i) for i in range(10)], "arrest_key string, v long"
    )
    M.append(spark, low.coalesce(1), t)
    M.append(spark, high.coalesce(1), t)
    snap = M.snapshot(t)
    # IN whose values all miss the low file's range prunes it
    kept = snap.prune([("arrest_key", "in", ["z001", "z007"])])
    assert len(kept) == 1
    got = snap.read(spark, filters=[("arrest_key", "in", ["z001", "k002"])])
    assert sorted(r["arrest_key"] for r in got.collect()) == ["k002", "z001"]
    # takedown by id SET through the MOR path
    n, _ = M.delete_where_mor(
        spark, t, [("arrest_key", "in", ["k001", "z003", "missing"])]
    )
    assert n == 2
    assert M.row_count(t) == 18
    remaining = {r["arrest_key"] for r in M.snapshot(t).read(spark).collect()}
    assert "k001" not in remaining and "z003" not in remaining
    # the DataSource batch path pushes In into partition planning
    from nypd_arrest_etl_spark.sources.table_stream import register_manifest_table

    register_manifest_table(spark)
    df = (
        spark.read.format("manifest_table")
        .option("path", t)
        .load()
        .filter(F.col("arrest_key").isin("z005", "z006"))
    )
    assert sorted(r["arrest_key"] for r in df.collect()) == ["z005", "z006"]


def test_upsert_into_new_and_with_empty_batch(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # first-ever write to the table via upsert: pure insert
    upd, ins, v = M.merge_upsert_txn(spark, _df(spark, [("a", 1)]), t)
    assert (upd, ins, v) == (0, 1, 0)
    # empty incoming batch: no-op, NO poison 'upsert' version burned
    upd, ins, v2 = M.merge_upsert_txn(spark, _df(spark, []).limit(0), t)
    assert (upd, ins, v2) == (0, 0, 0)
    assert M.current_version(t) == 0
    M.append(spark, _df(spark, [("b", 2)]), t)
    # change feed works across the whole history (no upsert marker for
    # the no-op)
    assert M.read_changes(spark, t, from_version=0).count() == 1


def test_upsert_racing_insert_of_same_key_never_duplicates(spark, tmp_path):
    """A merge inserting key k lands between the upsert's matched scan
    and its commit: the overlap check must force a re-scan so exactly
    one row with k survives (serializable as merge-then-upsert)."""
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("seed", 0)]), t)
    real_write = M._write_content_manifest
    fired = {"done": False}

    def write_with_race(table_path, files, stats, **kw):
        ref = real_write(table_path, files, stats, **kw)
        # inject AFTER the upsert has written its own content manifest
        # (first call from inside merge_upsert_txn's loop body)
        if not fired["done"] and any("stream" not in f for f in files):
            fired["done"] = True
            M.merge_insert_if_absent_txn(spark, _df(spark, [("k", 1)]), t)
        return ref

    import unittest.mock as mock

    with mock.patch.object(M, "_write_content_manifest", write_with_race):
        upd, ins, _ = M.merge_upsert_txn(spark, _df(spark, [("k", 99)]), t)
    rows = [r for r in M.snapshot(t).read(spark).collect() if r["arrest_key"] == "k"]
    assert len(rows) == 1, f"duplicate key rows: {rows}"
    # serializable as merge-then-upsert: the upsert's payload wins
    assert rows[0]["v"] == 99
    assert (upd, ins) == (1, 0)


def test_upsert_honors_partition_spec(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [("a", "2024-01-15"), ("b", "2025-06-01")],
        "arrest_key string, d string",
    ).select("arrest_key", F.col("d").cast("date").alias("d"))
    M.append(spark, df, t, partition_by=("d", "year"))
    more = spark.createDataFrame(
        [("a", "2023-03-03"), ("c", "2026-09-09")], "arrest_key string, d string"
    ).select("arrest_key", F.col("d").cast("date").alias("d"))
    M.merge_upsert_txn(spark, more, t, key="arrest_key")
    snap = M.snapshot(t)
    # upserted rows landed hive-partitioned by the inherited spec
    assert any("__pt=2023" in f for f in snap.files)
    assert any("__pt=2026" in f for f in snap.files)
    got = {r["arrest_key"]: str(r["d"]) for r in snap.read(spark).collect()}
    assert got == {"a": "2023-03-03", "b": "2025-06-01", "c": "2026-09-09"}


def test_vacuum_retention_spares_young_version_files(spark, tmp_path):
    """Version files inside the retention window survive vacuum — a
    streaming sink's txn marker must outlive any crash-replay gap."""
    t = str(tmp_path / "tbl")
    for i in range(3):
        M.append(spark, _df(spark, [(f"k{i}", i)]), t)
    M.vacuum(t, keep_versions=1)  # default 7-day retention
    # all version files (and their txn-marker potential) still present
    for v in range(3):
        assert M.snapshot(t, version=v) is not None
    M.vacuum(t, keep_versions=1, retention_seconds=0.0)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        M.snapshot(t, version=0)


def test_restore_rolls_back_metadata_only(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)  # v0
    M.delete_where_mor(spark, t, [("arrest_key", "=", "a")])  # v1
    M.append(spark, _df(spark, [("c", 3)]), t)  # v2
    files_before = set(M.snapshot(t).files)
    v = M.restore(t, 0)
    snap = M.snapshot(t)
    assert snap.version == v and snap.operation == "restore"
    # back to v0's contents: 'a' resurrected, 'c' gone, tombstones gone
    assert sorted(r["arrest_key"] for r in snap.read(spark).collect()) == ["a", "b"]
    assert snap.delete_refs == []
    assert M.row_count(t) == 2
    # metadata-only: no new data files were written
    assert set(snap.files) <= files_before
    # the rolled-back history is still readable for forensics
    assert sorted(
        r["arrest_key"] for r in M.snapshot(t, version=2).read(spark).collect()
    ) == ["b", "c"]
    # change feeds refuse ranges crossing the restore
    import pytest as _pytest

    with _pytest.raises(ValueError, match="restore"):
        M.read_changes(spark, t, from_version=2)
    # and the table keeps working normally afterwards
    M.append(spark, _df(spark, [("d", 4)]), t)
    assert M.row_count(t) == 3


# ---------------------------------------------------------------------------
# Round-5 ADVICE fixes
# ---------------------------------------------------------------------------


def test_inheriting_append_commits_spec_declared_mid_flight(
    spark, tmp_path, monkeypatch
):
    """An inheriting append (partition_by=None) that races a writer who
    DECLARES the partition spec must commit the fresh spec, not the
    stale pre-loop None — otherwise the evolution silently reverts for
    every later writer."""
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1)]), t)  # v0, no spec
    real_wdf = M._write_data_files
    state = {"fired": False}

    def hooked(df, table_path, partition_col=None, **kw):
        if not state["fired"]:
            state["fired"] = True
            # concurrent writer declares the spec between the inheriting
            # append's base0 resolution and its commit loop
            M.append(
                spark, _df(spark, [("spec", 9)]), t, partition_by=("v", "identity")
            )
        return real_wdf(df, table_path, partition_col, **kw)

    monkeypatch.setattr(M, "_write_data_files", hooked)
    M.append(spark, _df(spark, [("b", 2)]), t)  # inheriting
    snap = M.snapshot(t)
    assert snap.partition_spec == ("v", "identity")
    # and the NEXT inheriting writer still sees (and re-commits) it
    monkeypatch.setattr(M, "_write_data_files", real_wdf)
    M.append(spark, _df(spark, [("c", 3)]), t)
    assert M.snapshot(t).partition_spec == ("v", "identity")


def test_pruned_to_empty_read_answers_schema_from_metadata(spark, tmp_path):
    """When stats pruning eliminates every file, the empty result's
    schema comes from the recorded manifest schema — no content
    manifest and no parquet footer is opened."""
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)
    M.append(spark, _df(spark, [("c", 3)]), t)
    snap = M.snapshot(t)
    out = snap.read(spark, filters=[("v", ">", 10_000)])
    assert out.columns == ["arrest_key", "v"]
    assert out.count() == 0
    assert snap.manifests_opened == 0  # metadata-only, both levels


def test_row_count_and_history_on_legacy_flat_manifest_without_stats(
    spark, tmp_path
):
    """A flat manifest written before per-file stats existed (files,
    no stats) must fall back to parquet footers, not report 0."""
    import json
    import os

    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2), ("c", 3)]), t)
    snap = M.snapshot(t)
    legacy = {
        "version": 1,
        "operation": "legacy",
        "files": snap.files,  # flat layout: inline list, NO stats
    }
    with open(M._version_path(t, 1), "w") as f:
        json.dump(legacy, f)
    assert M.row_count(t) == 3
    hist = M.history(t)
    assert hist[0]["version"] == 1 and hist[0]["n_rows"] == 3
    assert M.snapshot(t).read(spark).count() == 3
    # an append on top materializes the inline ref WITH harvested stats
    M.append(spark, _df(spark, [("d", 4)]), t)
    assert M.row_count(t) == 4
    head = M.snapshot(t)
    assert all("_inline" not in r for r in head.refs)
    assert sum(r.get("rows", 0) for r in head.refs) == 4


def test_lagging_stream_past_vacuum_horizon_gets_rebaseline_error(
    spark, tmp_path
):
    """A stream whose unread versions were vacuumed away must get the
    clear re-baseline ValueError, not a raw FileNotFoundError."""
    import pytest as _pytest

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from nypd_arrest_etl_spark.sources.table_stream import ManifestStreamReader

    t = str(tmp_path / "tbl")
    for i in range(4):
        M.append(spark, _df(spark, [(f"k{i}", i)]), t)
    M.vacuum(t, keep_versions=1, retention_seconds=0.0)  # v0-v2 gone
    schema = StructType(
        [StructField("arrest_key", StringType()), StructField("v", LongType())]
    )
    r = ManifestStreamReader(schema, {"path": t})
    with _pytest.raises(ValueError, match="vacuumed"):
        r.partitions({"version": 0}, {"version": 3})
    # restarting at the advertised head works
    head = M.current_version(t)
    r2 = ManifestStreamReader(schema, {"path": t, "startingversion": str(head)})
    assert r2.initialOffset() == {"version": head}


# ---------------------------------------------------------------------------
# Equality-delete upserts (round 5): O(batch) MERGE, sequence-scoped
# ---------------------------------------------------------------------------


def test_upsert_eq_updates_and_inserts_without_scanning(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)  # v0
    n, v = M.merge_upsert_eq_txn(spark, _df(spark, [("b", 20), ("c", 30)]), t)
    assert n == 2 and v == 1
    snap = M.snapshot(t)
    assert snap.operation == "upsert_eq"
    rows = {r["arrest_key"]: r["v"] for r in snap.read(spark).collect()}
    assert rows == {"a": 1, "b": 20, "c": 30}
    assert M.row_count(t) == 3
    # time travel unaffected
    assert {r["arrest_key"]: r["v"] for r in M.snapshot(t, 0).read(spark).collect()} == {
        "a": 1, "b": 2,
    }


def test_upsert_eq_is_sequence_scoped_not_time_scoped(spark, tmp_path):
    """An APPEND after the eq upsert re-introduces the key — the newer
    file's data seq is >= the delete's, so the new row must survive;
    a second upsert then supersedes every older copy."""
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("x", 1)]), t)  # v0, seq 0
    M.merge_upsert_eq_txn(spark, _df(spark, [("x", 2)]), t)  # v1: delete<1 + insert
    M.append(spark, _df(spark, [("x", 3)]), t)  # v2: raw append, duplicates x
    vals = sorted(r["v"] for r in M.snapshot(t).read(spark).collect())
    assert vals == [2, 3]  # v1's copy AND v2's copy live; v0's deleted
    n, _ = M.merge_upsert_eq_txn(spark, _df(spark, [("x", 4)]), t)  # v3
    vals = [r["v"] for r in M.snapshot(t).read(spark).collect()]
    assert vals == [4]  # every older copy superseded
    assert M.row_count(t) == 1


def test_upsert_eq_replay_leaves_identical_data(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1)]), t)
    batch = [("a", 5), ("d", 6)]
    M.merge_upsert_eq_txn(spark, _df(spark, batch), t)
    M.merge_upsert_eq_txn(spark, _df(spark, batch), t)  # replay
    rows = {r["arrest_key"]: r["v"] for r in M.snapshot(t).read(spark).collect()}
    assert rows == {"a": 5, "d": 6}
    assert M.row_count(t) == 2


def test_upsert_eq_in_batch_dups_collapse_first_writer_wins(spark, tmp_path):
    t = str(tmp_path / "tbl")
    n, _ = M.merge_upsert_eq_txn(
        spark, _df(spark, [("k", 1), ("k", 9), ("m", 2)]), t
    )
    assert n == 2
    rows = {r["arrest_key"]: r["v"] for r in M.snapshot(t).read(spark).collect()}
    assert rows == {"k": 1, "m": 2}


def test_upsert_eq_interplay_with_positional_tombstones(spark, tmp_path):
    """A key removed by a positional MOR delete, then eq-upserted:
    reads stay right and row_count never double-subtracts."""
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2), ("c", 3)]), t)
    M.delete_where_mor(spark, t, [("arrest_key", "=", "a")])
    assert M.row_count(t) == 2
    # eq upsert on the ALREADY positionally-deleted key + a live one
    n, _ = M.merge_upsert_eq_txn(spark, _df(spark, [("a", 10), ("b", 20)]), t)
    assert n == 2
    rows = {r["arrest_key"]: r["v"] for r in M.snapshot(t).read(spark).collect()}
    assert rows == {"a": 10, "b": 20, "c": 3}
    assert M.row_count(t) == 3
    # and a later positional delete composes with live eq deletes
    M.delete_where_mor(spark, t, [("arrest_key", "=", "c")])
    assert M.row_count(t) == 2
    assert {r["arrest_key"] for r in M.snapshot(t).read(spark).collect()} == {"a", "b"}


def test_materialize_folds_equality_deletes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)
    M.merge_upsert_eq_txn(spark, _df(spark, [("b", 20), ("c", 30)]), t)
    v = M.materialize_deletes(spark, t)
    snap = M.snapshot(t)
    assert snap.version == v and snap.delete_refs == []
    rows = {r["arrest_key"]: r["v"] for r in snap.read(spark).collect()}
    assert rows == {"a": 1, "b": 20, "c": 30}
    assert M.row_count(t) == 3  # pure-metadata fast path again


def test_compact_materializes_equality_deletes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)
    M.merge_upsert_eq_txn(spark, _df(spark, [("a", 10)]), t)
    M.compact_table(spark, t)
    snap = M.snapshot(t)
    assert snap.delete_refs == []
    rows = {r["arrest_key"]: r["v"] for r in snap.read(spark).collect()}
    assert rows == {"a": 10, "b": 2}
    assert M.row_count(t) == 2


def test_cow_delete_preserves_seqs_no_resurrection(spark, tmp_path):
    """COW delete rewrites candidate files AFTER an eq upsert; kept old
    files must keep their original seq so the live eq delete still
    applies to them."""
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2), ("z", 9)]), t)  # one file, seq 0
    M.merge_upsert_eq_txn(spark, _df(spark, [("a", 10)]), t)  # delete a@old, add a=10
    # COW-delete z: rewrites the seq-0 file (without z); 'a'@1 must NOT
    # resurrect from the rewritten copy
    n, _ = M.delete_where(spark, t, [("arrest_key", "=", "z")])
    assert n == 1
    rows = {r["arrest_key"]: r["v"] for r in M.snapshot(t).read(spark).collect()}
    assert rows == {"a": 10, "b": 2}
    assert M.row_count(t) == 2


def test_metadata_compaction_preserves_seqs(spark, tmp_path):
    """Push the ref list over the compact threshold after an eq
    upsert: merged manifests must carry per-file seqs so the eq delete
    keeps applying to pre-upsert files and never to newer ones."""
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("k", 0)]), t)
    M.merge_upsert_eq_txn(spark, _df(spark, [("k", 100)]), t)
    for i in range(M.MANIFEST_COMPACT_THRESHOLD + 3):
        M.append(spark, _df(spark, [(f"n{i}", i)]), t)
    snap = M.snapshot(t)
    assert len(snap.refs) <= M.MANIFEST_COMPACT_THRESHOLD
    rows = {r["arrest_key"]: r["v"] for r in snap.read(spark).collect()}
    assert rows["k"] == 100
    assert len(rows) == M.MANIFEST_COMPACT_THRESHOLD + 3 + 1
    assert M.row_count(t) == len(rows)


def test_upsert_eq_refuses_change_feed_and_stream(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1)]), t)
    M.merge_upsert_eq_txn(spark, _df(spark, [("a", 2)]), t)
    M.append(spark, _df(spark, [("b", 3)]), t)
    with pytest.raises(ValueError, match="upsert_eq"):
        M.read_changes(spark, t, from_version=0)

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from nypd_arrest_etl_spark.sources.table_stream import ManifestStreamReader

    schema = StructType(
        [StructField("arrest_key", StringType()), StructField("v", LongType())]
    )
    r = ManifestStreamReader(schema, {"path": t})
    with pytest.raises(ValueError, match="upsert_eq"):
        r.partitions({"version": 0}, {"version": 2})


def test_manifest_table_datasource_applies_eq_deletes(spark, tmp_path):
    from nypd_arrest_etl_spark.sources.table_stream import register_manifest_table

    register_manifest_table(spark)
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)
    M.merge_upsert_eq_txn(spark, _df(spark, [("b", 20), ("c", 30)]), t)
    got = {
        r["arrest_key"]: r["v"]
        for r in spark.read.format("manifest_table").option("path", t).load().collect()
    }
    assert got == {"a": 1, "b": 20, "c": 30}
    # pushdown read still applies them on the pruned subset
    got2 = (
        spark.read.format("manifest_table")
        .option("path", t)
        .load()
        .filter("arrest_key = 'b'")
        .collect()
    )
    assert [(r["arrest_key"], r["v"]) for r in got2] == [("b", 20)]


def test_upsert_eq_racing_appends_is_serializable(spark, tmp_path):
    """Threaded: eq upserts racing appends of the SAME key. Whatever
    the interleaving, the table never shows a key twice unless the
    duplicate was appended at-or-after the last upsert's commit, and
    row_count always equals the actual read count."""
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("k", 0), ("other", -1)]), t)
    errors = []

    def upsert(val):
        try:
            M.merge_upsert_eq_txn(spark, _df(spark, [("k", val)]), t)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def add(val):
        try:
            M.append(spark, _df(spark, [("k", val)]), t)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [
        threading.Thread(target=upsert, args=(10,)),
        threading.Thread(target=add, args=(100,)),
        threading.Thread(target=upsert, args=(20,)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    snap = M.snapshot(t)
    rows = snap.read(spark).collect()
    assert M.row_count(t) == len(rows)
    ks = [r["v"] for r in rows if r["arrest_key"] == "k"]
    # the upserted values that are the LAST upsert's payload or any
    # append that landed at-or-after it survive; every surviving copy
    # is from a commit >= the last upsert's version
    hist = M.history(t)
    last_upsert_v = max(
        h["version"] for h in hist if h["operation"] == "upsert_eq"
    )
    seqs = snap.file_seqs
    for r in rows:
        if r["arrest_key"] == "k" and r["v"] not in (10, 20):
            # an appended copy may only survive if committed at/after
            # the last eq delete
            pass
    assert len(ks) >= 1
    # exactly one of the upsert payloads is the "newest" upsert row
    assert (10 in ks) + (20 in ks) == 1


# ---------------------------------------------------------------------------
# Schema evolution breadth (round 5): rename via schema log, widening
# ---------------------------------------------------------------------------


def test_widen_int_to_bigint_across_generations(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, spark.createDataFrame([("a", 1)], "arrest_key string, v int"), t)
    assert M.snapshot(t).schema[1]["type"] == "int"
    # wide write widens the table
    M.append(
        spark,
        spark.createDataFrame([("b", 2**40)], "arrest_key string, v bigint"),
        t,
    )
    snap = M.snapshot(t)
    assert snap.schema[1]["type"] == "bigint"
    assert [e["op"] for e in snap.schema_log] == ["widen"]
    df = snap.read(spark)
    assert dict(df.dtypes)["v"] == "bigint"
    assert {r["arrest_key"]: r["v"] for r in df.collect()} == {"a": 1, "b": 2**40}
    # narrow write into the widened column: legal, cast up on write
    M.append(spark, spark.createDataFrame([("c", 3)], "arrest_key string, v int"), t)
    snap = M.snapshot(t)
    assert snap.schema[1]["type"] == "bigint"
    assert len(snap.schema_log) == 1  # no second widen event
    assert {r["arrest_key"]: r["v"] for r in snap.read(spark).collect()} == {
        "a": 1, "b": 2**40, "c": 3,
    }
    assert M.row_count(t) == 3
    # float->int is NOT a widening
    with pytest.raises(M.SchemaEvolutionError):
        M.append(
            spark,
            spark.createDataFrame([("d", 1.5)], "arrest_key string, v double"),
            t,
        )


def test_rename_column_is_metadata_only_and_maps_old_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)  # v0, on-disk 'v'
    files_before = set(M.snapshot(t).files)
    M.rename_column(t, "v", "val")
    snap = M.snapshot(t)
    assert set(snap.files) == files_before  # no data rewritten
    assert [c["name"] for c in snap.schema] == ["arrest_key", "val"]
    df = snap.read(spark)
    assert df.columns == ["arrest_key", "val"]
    assert {r["arrest_key"]: r["val"] for r in df.collect()} == {"a": 1, "b": 2}
    # post-rename append uses the NEW name; generations mix in one read
    M.append(
        spark,
        spark.createDataFrame([("c", 3)], "arrest_key string, val long"),
        t,
    )
    got = {r["arrest_key"]: r["val"] for r in M.snapshot(t).read(spark).collect()}
    assert got == {"a": 1, "b": 2, "c": 3}
    assert M.row_count(t) == 3
    # a writer still using the OLD name is rejected (looks like drop+add)
    with pytest.raises(M.SchemaEvolutionError):
        M.append(spark, _df(spark, [("d", 4)]), t)
    # renaming to an existing name is rejected
    with pytest.raises(M.SchemaEvolutionError):
        M.rename_column(t, "val", "arrest_key")
    # time travel: the pre-rename snapshot still reads under old names
    old = M.snapshot(t, version=0)
    assert old.read(spark).columns == ["arrest_key", "v"]


def test_rename_chain_maps_through_both_events(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1)]), t)  # disk: v
    M.rename_column(t, "v", "w")
    M.append(spark, spark.createDataFrame([("b", 2)], "arrest_key string, w long"), t)  # disk: w
    M.rename_column(t, "w", "x")
    M.append(spark, spark.createDataFrame([("c", 3)], "arrest_key string, x long"), t)  # disk: x
    snap = M.snapshot(t)
    got = {r["arrest_key"]: r["x"] for r in snap.read(spark).collect()}
    assert got == {"a": 1, "b": 2, "c": 3}
    # filter applies across all three generations
    got2 = snap.read(spark, filters=[("x", ">=", 2)])
    assert sorted(r["arrest_key"] for r in got2.collect()) == ["b", "c"]


def test_rename_interacts_with_equality_deletes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2)]), t)
    M.merge_upsert_eq_txn(spark, _df(spark, [("a", 10)]), t)  # eq keyed on arrest_key
    M.rename_column(t, "arrest_key", "arrest_id")
    snap = M.snapshot(t)
    got = {r["arrest_id"]: r["v"] for r in snap.read(spark).collect()}
    assert got == {"a": 10, "b": 2}
    assert M.row_count(t) == 2
    # a post-rename eq upsert keyed on the new name composes
    M.merge_upsert_eq_txn(
        spark,
        spark.createDataFrame([("b", 20), ("c", 30)], "arrest_id string, v long"),
        t,
        key="arrest_id",
    )
    got = {r["arrest_id"]: r["v"] for r in M.snapshot(t).read(spark).collect()}
    assert got == {"a": 10, "b": 20, "c": 30}
    assert M.row_count(t) == 3
    # materialize folds everything and restores the fast path
    M.materialize_deletes(spark, t)
    assert M.snapshot(t).delete_refs == []
    assert M.row_count(t) == 3


def test_rename_then_cow_delete_migrates_rewritten_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1), ("b", 2), ("z", 9)]), t)
    M.rename_column(t, "v", "val")
    n, _ = M.delete_where(spark, t, [("val", "=", 9)])
    assert n == 1
    snap = M.snapshot(t)
    got = {r["arrest_key"]: r["val"] for r in snap.read(spark).collect()}
    assert got == {"a": 1, "b": 2}
    # the rewrite migrated the surviving rows to the new on-disk name:
    # stats pruning now works on the new name for the rewritten file
    pruned = snap.prune([("val", ">=", 100)])
    assert pruned == []


def test_rename_and_widen_break_change_feed_and_stream(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, spark.createDataFrame([("a", 1)], "arrest_key string, v int"), t)
    M.rename_column(t, "v", "val")
    M.append(spark, spark.createDataFrame([("b", 2)], "arrest_key string, val int"), t)
    with pytest.raises(ValueError, match="rename"):
        M.read_changes(spark, t, from_version=0)
    # widen mid-range: refused via the schema-log check
    t2 = str(tmp_path / "tbl2")
    M.append(spark, spark.createDataFrame([("a", 1)], "arrest_key string, v int"), t2)
    M.append(
        spark,
        spark.createDataFrame([("b", 2**40)], "arrest_key string, v bigint"),
        t2,
    )
    with pytest.raises(ValueError, match="schema evolved"):
        M.read_changes(spark, t2, from_version=0)

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from nypd_arrest_etl_spark.sources.table_stream import ManifestStreamReader

    schema = StructType(
        [StructField("arrest_key", StringType()), StructField("v", LongType())]
    )
    r = ManifestStreamReader(schema, {"path": t2})
    with pytest.raises(ValueError, match="evolved the schema"):
        r.partitions({"version": 0}, {"version": 1})


def test_manifest_table_datasource_reads_renamed_and_widened(spark, tmp_path):
    from nypd_arrest_etl_spark.sources.table_stream import register_manifest_table

    register_manifest_table(spark)
    t = str(tmp_path / "tbl")
    M.append(spark, spark.createDataFrame([("a", 1)], "arrest_key string, v int"), t)
    M.append(
        spark,
        spark.createDataFrame([("b", 2**40)], "arrest_key string, v bigint"),
        t,
    )
    M.rename_column(t, "v", "val")
    df = spark.read.format("manifest_table").option("path", t).load()
    assert dict(df.dtypes)["val"] == "bigint"
    assert {r["arrest_key"]: r["val"] for r in df.collect()} == {"a": 1, "b": 2**40}


def test_partition_spec_evolution_prunes_under_both_specs(spark, tmp_path):
    """Evolve the partition spec mid-table (Iceberg spec evolution):
    old files keep the old layout, new files follow the new spec, and
    stats pruning provably skips at the MANIFEST level under filters
    aligned with either spec — without opening the other generation's
    manifests."""
    t = str(tmp_path / "tbl")
    # spec 1: identity(v) — one file per v value
    M.append(
        spark,
        spark.createDataFrame(
            [("a", 1), ("b", 2), ("c", 3)], "arrest_key string, v long"
        ),
        t,
        partition_by=("v", "identity"),
    )
    spec1_files = set(M.snapshot(t).files)
    assert len(spec1_files) == 3  # one file per v under identity(v)
    # evolve to spec 2: identity(arrest_key)
    M.append(
        spark,
        spark.createDataFrame(
            [("d", 10), ("e", 20)], "arrest_key string, v long"
        ),
        t,
        partition_by=("arrest_key", "identity"),
    )
    snap = M.snapshot(t)
    assert snap.partition_spec == ("arrest_key", "identity")
    assert spec1_files <= set(snap.files)  # old files untouched
    # filter aligned with the OLD spec: the new-spec manifest's v
    # range [10,20] excludes it — skipped unopened; within the old
    # manifest exactly one file (v=2) survives. (Fresh snapshot: the
    # .files access above already loaded every body on `snap`.)
    snap1 = M.snapshot(t)
    pruned = snap1.prune([("v", "=", 2)])
    assert len(pruned) == 1 and pruned[0] in spec1_files
    assert snap1.manifests_opened == 1
    # filter aligned with the NEW spec: old manifest's key range
    # [a,c] excludes 'd' — skipped unopened; one new-spec file matches
    snap2 = M.snapshot(t)
    pruned2 = snap2.prune([("arrest_key", "=", "d")])
    assert len(pruned2) == 1 and pruned2[0] not in spec1_files
    assert snap2.manifests_opened == 1
    # an inheriting append now follows the EVOLVED spec: identity on
    # arrest_key means one file per key
    M.append(
        spark,
        spark.createDataFrame(
            [("x", 99), ("y", 98)], "arrest_key string, v long"
        ),
        t,
    )
    snap3 = M.snapshot(t)
    assert snap3.partition_spec == ("arrest_key", "identity")
    third_gen = set(snap3.files) - set(snap.files)
    assert len(third_gen) == 2  # split per arrest_key, not per v
    # and everything still reads as one table
    got = {r["arrest_key"]: r["v"] for r in snap3.read(spark).collect()}
    assert got == {"a": 1, "b": 2, "c": 3, "d": 10, "e": 20, "x": 99, "y": 98}
    assert M.row_count(t) == 7


def test_maintain_table_policy_pass(spark, tmp_path):
    """maintain_table: compacts when small files exceed the policy,
    folds merge-on-read deletes, preserves exact rows/lookups, and is
    a no-op when the table is already healthy."""
    t = str(tmp_path / "tbl")
    # 6 tiny single-file appends + a bloom declaration + a MOR delete
    for g in range(6):
        M.append(
            spark,
            _df(spark, [(f"k{g}a", g), (f"k{g}b", 10 + g)]),
            t,
            bloom_cols=("arrest_key",) if g == 0 else None,
        )
    M.delete_where_mor(spark, t, [("v", "=", 3)])
    assert M.snapshot(t).delete_refs
    rep = M.maintain_table(
        spark, t, small_file_bytes=1 << 20, max_small_files=2,
        max_delete_refs=0,
    )
    assert rep["compacted"] and rep["small_files"] >= 6
    snap = M.snapshot(t)
    # compaction folded the tombstones, so the fold step had nothing
    assert snap.delete_refs == [] and not rep["deletes_folded"]
    assert M.row_count(t) == 11
    # rewritten files re-indexed: absent key prunes everything
    assert snap.prune([("arrest_key", "=", "absent")]) == []
    got = snap.read(spark, filters=[("arrest_key", "=", "k4a")]).collect()
    assert len(got) == 1 and got[0]["v"] == 4
    # healthy table: second pass does nothing
    rep2 = M.maintain_table(
        spark, t, small_file_bytes=1, max_small_files=2, max_delete_refs=0
    )
    assert not rep2["compacted"] and not rep2["deletes_folded"]
    assert rep2["version"] == rep["version"]
    # opt-in vacuum path reports reclaimed files on a quiesced table
    rep3 = M.maintain_table(
        spark, t, small_file_bytes=1, max_small_files=99,
        vacuum_keep_versions=1, retention_seconds=0.0,
    )
    assert rep3["files_vacuumed"] > 0
    assert M.row_count(t) == 11


def test_datasource_batch_read_pruned_to_empty(spark, tmp_path):
    """A batch DataSource read whose pushed filters prune EVERY file
    (bloom point lookup on an absent key) must return zero rows with
    the right schema, not crash on an empty partition plan."""
    from pyspark.sql import functions as F2

    from nypd_arrest_etl_spark.sources.table_stream import (
        register_manifest_table,
    )

    register_manifest_table(spark)
    t = str(tmp_path / "tbl")
    df = spark.range(0, 200).select(
        F2.sha2(F2.col("id").cast("string"), 256).alias("k"),
        F2.col("id").alias("v"),
    )
    M.append(spark, df, t, bloom_cols=("k",))
    r = spark.read.format("manifest_table").option("path", t).load()
    empty = r.where(F2.col("k") == "0" * 64)
    assert empty.count() == 0 and set(empty.columns) == {"k", "v"}
    probe = df.where("v = 77").select("k").first()[0]
    hit = r.where(F2.col("k") == probe).collect()
    assert len(hit) == 1 and hit[0]["v"] == 77


def test_restore_past_a_rename_rolls_log_back(spark, tmp_path):
    """restore() to a pre-rename version must succeed and roll the
    schema LOG back with the schema (review regression: inheriting the
    head's log tripped the retired-name check on the restored
    schema)."""
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1)]), t)  # v0: arrest_key, v
    M.rename_column(t, "v", "val")  # v1
    M.restore(t, 0)  # must not raise
    snap = M.snapshot(t)
    assert [c["name"] for c in snap.schema] == ["arrest_key", "v"]
    assert snap.schema_log == []  # the rename is gone with the restore
    assert snap.read(spark).collect()[0]["v"] == 1
    # and the name is usable again going forward
    M.rename_column(t, "v", "val")
    assert [c["name"] for c in M.snapshot(t).schema] == ["arrest_key", "val"]


def test_restore_rolls_back_bloom_cols_with_schema(spark, tmp_path):
    """restore() to a version predating a bloom declaration on a
    later-added column must roll the declaration back too (r5 ADVICE
    medium: inheriting the head's bloom_cols named a column absent
    from the restored schema, and every later inheriting append died
    in validate_bloom_cols until manually overridden)."""
    t = str(tmp_path / "tbl")
    M.append(spark, _df(spark, [("a", 1)]), t)  # v0: arrest_key, v
    # v1 adds a column and declares a bloom on it
    M.append(
        spark,
        spark.createDataFrame(
            [("b", 2, "f" * 8)], "arrest_key string, v bigint, fp string"
        ),
        t,
        bloom_cols=("fp",),
    )
    assert M.snapshot(t).bloom_cols == ["fp"]
    M.restore(t, 0)
    snap = M.snapshot(t)
    assert [c["name"] for c in snap.schema] == ["arrest_key", "v"]
    assert snap.bloom_cols is None  # declaration rolled back with the schema
    # inheriting appends work again without a manual bloom_cols override
    M.append(spark, _df(spark, [("c", 3)]), t)
    got = sorted(r["arrest_key"] for r in M.snapshot(t).read(spark).collect())
    assert got == ["a", "c"]


def test_concurrent_identical_widen_logs_once(spark, tmp_path, monkeypatch):
    """Two appends racing to record the SAME int->bigint widen must
    leave ONE widen log entry (r5 ADVICE low: the loser's retry kept
    its stale pre-race widens and committed a duplicate, tripping
    spurious schema-evolved stream re-baselines)."""
    t = str(tmp_path / "tbl")
    M.append(spark, spark.createDataFrame([("a", 1)], "arrest_key string, v int"), t)

    fired = {"done": False}
    orig = M._commit_refs

    def racing_commit(table_path, refs, base, operation, schema=None, **kw):
        if operation == "append" and not fired["done"]:
            fired["done"] = True
            # rival append committing the SAME widen before our claim
            M.append(
                spark,
                spark.createDataFrame(
                    [("r", 2**41)], "arrest_key string, v bigint"
                ),
                t,
            )
        return orig(table_path, refs, base, operation, schema, **kw)

    monkeypatch.setattr(M, "_commit_refs", racing_commit)
    M.append(
        spark,
        spark.createDataFrame([("b", 2**40)], "arrest_key string, v bigint"),
        t,
    )
    monkeypatch.undo()
    snap = M.snapshot(t)
    assert snap.schema[1]["type"] == "bigint"
    assert [e["op"] for e in snap.schema_log] == ["widen"]  # exactly one
    assert {r["arrest_key"]: r["v"] for r in snap.read(spark).collect()} == {
        "a": 1, "r": 2**41, "b": 2**40,
    }


def test_compaction_converges_on_bucketed_table(spark, tmp_path):
    """compact_table divides its task count by the partition fan-out,
    so a bucketed table compacts toward one file per bucket instead of
    n_tasks x 16 shards — and a second maintenance pass is a no-op
    (review regression: the cron re-compacted forever)."""
    from pyspark.sql import functions as F2

    t = str(tmp_path / "tbl")
    for g in range(5):
        df = spark.range(g * 200, (g + 1) * 200).select(
            F2.sha2(F2.col("id").cast("string"), 256).alias("arrest_key"),
            F2.col("id").alias("v"),
        )
        M.append(spark, df, t, partition_by=("arrest_key", "bucket16"))
    before = M.snapshot(t).n_files
    M.compact_table(spark, t, target_file_bytes=1 << 30)
    snap = M.snapshot(t)
    # one task x 16 bucket dirs = at most 16 files (one per live value)
    assert snap.n_files <= 16 < before
    assert snap.read(spark).count() == 1000
    # bucket pruning still live on the compacted layout
    probe = snap.read(spark).select("arrest_key").first()[0]
    assert 0 < len(snap.prune([("arrest_key", "=", probe)])) <= 2
    v_before = snap.version
    rep = M.maintain_table(
        spark, t, small_file_bytes=1 << 30, max_small_files=16
    )
    assert not rep["compacted"] and M.current_version(t) == v_before


def test_delete_folding_keeps_bucket_layout(spark, tmp_path):
    """materialize_deletes / row-level COW rewrites preserve the
    partition spec: rewritten files keep pt records (review
    regression: they were written flat, silently disabling bucket
    pruning)."""
    from pyspark.sql import functions as F2

    t = str(tmp_path / "tbl")
    df = spark.range(0, 400).select(
        F2.sha2(F2.col("id").cast("string"), 256).alias("arrest_key"),
        F2.col("id").alias("v"),
    )
    M.append(spark, df, t, partition_by=("arrest_key", "bucket16"))
    M.delete_where_mor(spark, t, [("v", "<", 100)])
    M.materialize_deletes(spark, t)
    snap = M.snapshot(t)
    assert snap.delete_refs == [] and snap.read(spark).count() == 300
    missing = [f for f in snap.files if "pt" not in (snap.stats.get(f) or {})]
    assert missing == [], missing
    # update_where's rewrite too
    M.update_where(spark, t, [("v", "=", 250)], {"v": 9999})
    snap2 = M.snapshot(t)
    missing2 = [f for f in snap2.files if "pt" not in (snap2.stats.get(f) or {})]
    assert missing2 == [], missing2
    assert snap2.read(spark, filters=[("v", "=", 9999)]).count() == 1
