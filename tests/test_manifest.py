"""Versioned-manifest table: commit atomicity, snapshot isolation,
serializable concurrent merges, time travel, vacuum."""

import threading

import pytest

from nypd_arrest_etl_spark.sinks import manifest as M


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
    deleted = M.vacuum(t, keep_versions=1)
    assert deleted >= 1
    snap = M.snapshot(t)
    assert sorted(r["arrest_key"] for r in snap.read(spark).collect()) == ["a", "b"]
    # superseded manifest dropped; latest survives
    with pytest.raises(FileNotFoundError):
        M.snapshot(t, version=0)
    assert M.current_version(t) == 1


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
