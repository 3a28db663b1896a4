"""Conditional-PUT commit backend (sinks/object_store.py) against a
live local fake-S3 (tests/fake_s3.py): client semantics, then the
SAME threaded commit races the hard-link backend passes — the 100 TB
deployment story ends at a tested client, not a seam."""

import os
import threading

import pytest

from nypd_arrest_etl_spark.sinks import manifest as M
from nypd_arrest_etl_spark.sinks.object_store import (
    ObjectStoreError,
    S3ConditionalPutClient,
    make_claim_version,
)
from tests.fake_s3 import FakeS3Server


def _df(spark, rows):
    return spark.createDataFrame(rows, "arrest_key string, v bigint")


def test_client_put_if_absent_and_get():
    with FakeS3Server() as srv:
        c = S3ConditionalPutClient(srv.endpoint, "tbl")
        assert c.get("a/v000000.json") is None
        assert c.put_if_absent("a/v000000.json", b"first") is True
        # the loser's conditional PUT must NOT overwrite the winner
        assert c.put_if_absent("a/v000000.json", b"second") is False
        assert c.get("a/v000000.json") == b"first"
        # distinct key is independent
        assert c.put_if_absent("a/v000001.json", b"x") is True


def test_client_raises_on_transport_failure():
    with FakeS3Server() as srv:
        c = S3ConditionalPutClient(srv.endpoint, "tbl")
    # context exited: server is gone — the claim must surface an
    # OSError (retryable by the caller), never a silent False
    with pytest.raises(OSError):
        c.put_if_absent("k", b"x")
    with pytest.raises(ValueError):
        S3ConditionalPutClient("ftp://nope", "tbl")
    assert isinstance(ObjectStoreError("x"), OSError)


def test_client_cas_is_atomic_under_thread_storm():
    """64 threads race one key: exactly one winner, body = winner's."""
    with FakeS3Server() as srv:
        c = S3ConditionalPutClient(srv.endpoint, "tbl")
        wins = []

        def run(i):
            if c.put_if_absent("race/v1", b"w%d" % i):
                wins.append(i)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(64)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(wins) == 1
        assert c.get("race/v1") == b"w%d" % wins[0]


def test_commit_races_green_under_conditional_put_backend(
    spark, tmp_path, monkeypatch
):
    """The 8-way concurrent append race from the hard-link suite, run
    through the real HTTP client against the fake-S3: gapless version
    chain, every row lands, and the store holds every version file
    byte-identical to the local mirror."""
    with FakeS3Server() as srv:
        client = S3ConditionalPutClient(srv.endpoint, "warehouse")
        monkeypatch.setattr(M, "_claim_version", make_claim_version(client))
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
        rows = sorted(
            r["arrest_key"] for r in M.snapshot(t).read(spark).collect()
        )
        assert rows == sorted(f"k{i}" for i in range(8))
        # store is authoritative and byte-identical to the local mirror
        for v in range(8):
            p = M._version_path(t, v)
            assert client.get(p) == open(p, "rb").read()


def test_dead_winner_backfilled_by_losers(spark, tmp_path, monkeypatch):
    """A winner dying between its store-side PUT and its local mirror
    must not wedge the table (r6 review finding): the next committer
    loses the CAS, backfills the missing local version file from the
    authoritative store, and its retry commits on top — with the dead
    winner's rows visible."""
    with FakeS3Server() as srv:
        client = S3ConditionalPutClient(srv.endpoint, "warehouse")
        monkeypatch.setattr(M, "_claim_version", make_claim_version(client))
        t = str(tmp_path / "tbl")
        M.append(spark, _df(spark, [("base", 0)]), t)  # v0

        # winner whose process dies right after the PUT: simulate by
        # making the local mirror step crash once
        real_link = os.link
        crashed = {"done": False}

        def dying_link(src, dst):
            if not crashed["done"] and "/v" in dst:
                crashed["done"] = True
                raise RuntimeError("simulated crash after PUT")
            return real_link(src, dst)

        monkeypatch.setattr(os, "link", dying_link)
        with pytest.raises(RuntimeError):
            M.append(spark, _df(spark, [("dead_winner", 1)]), t)
        monkeypatch.setattr(os, "link", real_link)
        # store holds v1; local FS does not
        assert client.get(M._version_path(t, 1)) is not None
        assert not os.path.exists(M._version_path(t, 1))

        # next committer heals the chain and lands on v2
        M.append(spark, _df(spark, [("later", 2)]), t)
        assert M.current_version(t) == 2
        rows = sorted(
            r["arrest_key"] for r in M.snapshot(t).read(spark).collect()
        )
        assert rows == ["base", "dead_winner", "later"]


def test_backfill_refuses_vacuumed_version(spark, tmp_path, monkeypatch):
    """If the dead winner's content manifests were ALREADY vacuumed
    (no committer for a whole retention window), the loser must NOT
    resurrect the version — committing on top of missing files would
    be quiet corruption; a loudly wedged table (CommitConflict) is the
    correct terminal state."""
    import glob

    with FakeS3Server() as srv:
        client = S3ConditionalPutClient(srv.endpoint, "warehouse")
        monkeypatch.setattr(M, "_claim_version", make_claim_version(client))
        t = str(tmp_path / "tbl")
        M.append(spark, _df(spark, [("base", 0)]), t)  # v0
        before = set(glob.glob(os.path.join(t, "_manifest", "m-*.json")))
        real_link = os.link
        crashed = {"done": False}

        def dying_link(src, dst):
            if not crashed["done"] and "/v" in dst:
                crashed["done"] = True
                raise RuntimeError("simulated crash after PUT")
            return real_link(src, dst)

        monkeypatch.setattr(os, "link", dying_link)
        with pytest.raises(RuntimeError):
            M.append(spark, _df(spark, [("dead_winner", 1)]), t)
        monkeypatch.setattr(os, "link", real_link)
        # simulate vacuum having reclaimed the dead winner's manifest
        for m in set(glob.glob(os.path.join(t, "_manifest", "m-*.json"))) - before:
            os.remove(m)
        with pytest.raises(M.CommitConflict):
            M.append(spark, _df(spark, [("later", 2)]), t, max_retries=3)
        assert not os.path.exists(M._version_path(t, 1))  # never resurrected
        # readable state is still the pre-crash table
        assert [r["arrest_key"] for r in M.snapshot(t).read(spark).collect()] == ["base"]


def test_backfill_refuses_when_data_files_vacuumed(spark, tmp_path, monkeypatch):
    """Validation is transitive: the dead winner's manifest may have
    survived while its DATA files were reclaimed — backfill must open
    the new ref's body and refuse on a missing parquet too."""
    import glob
    import json as _json

    with FakeS3Server() as srv:
        client = S3ConditionalPutClient(srv.endpoint, "warehouse")
        monkeypatch.setattr(M, "_claim_version", make_claim_version(client))
        t = str(tmp_path / "tbl")
        M.append(spark, _df(spark, [("base", 0)]), t)  # v0
        before = set(glob.glob(os.path.join(t, "_manifest", "m-*.json")))
        real_link = os.link
        crashed = {"done": False}

        def dying_link(src, dst):
            if not crashed["done"] and "/v" in dst:
                crashed["done"] = True
                raise RuntimeError("simulated crash after PUT")
            return real_link(src, dst)

        monkeypatch.setattr(os, "link", dying_link)
        with pytest.raises(RuntimeError):
            M.append(spark, _df(spark, [("dead_winner", 1)]), t)
        monkeypatch.setattr(os, "link", real_link)
        # the winner's manifest survives; delete one of its DATA files
        new_m = set(glob.glob(os.path.join(t, "_manifest", "m-*.json"))) - before
        body = _json.load(open(next(iter(new_m))))
        os.remove(os.path.join(t, body["files"][0]))
        with pytest.raises(M.CommitConflict):
            M.append(spark, _df(spark, [("later", 2)]), t, max_retries=3)
        assert not os.path.exists(M._version_path(t, 1))


def test_backfill_validates_legacy_flat_layout_and_inline_refs(tmp_path):
    """r6 ADVICE (low): a version body with no 'manifests' key (legacy
    flat layout) produced an EMPTY ref list, so backfill resurrected it
    with zero existence checks — the exact quiet corruption the
    function exists to refuse. Flat-layout 'files' lists and pathless
    inline refs must validate like any new ref body."""
    import json as _json

    from nypd_arrest_etl_spark.sinks.object_store import _backfill

    with FakeS3Server() as srv:
        client = S3ConditionalPutClient(srv.endpoint, "warehouse")
        t = str(tmp_path / "tbl")
        os.makedirs(os.path.join(t, "_manifest"))
        vp = os.path.join(t, "_manifest", "v000000.json")

        # flat layout referencing a vacuumed data file: refused
        flat = {"version": 0, "files": ["part-gone.parquet"], "stats": {}}
        assert client.put_if_absent(vp, _json.dumps(flat).encode())
        _backfill(client, vp)
        assert not os.path.exists(vp)

        # same body once the data file exists: backfilled
        open(os.path.join(t, "part-gone.parquet"), "wb").close()
        _backfill(client, vp)
        assert _json.load(open(vp)) == flat
        os.remove(vp)

        # flat layout with a malformed files field: refused
        vp_bad = os.path.join(t, "_manifest", "v000001.json")
        assert client.put_if_absent(
            vp_bad, _json.dumps({"version": 1, "files": "not-a-list"}).encode()
        )
        _backfill(client, vp_bad)
        assert not os.path.exists(vp_bad)

        # pathless inline ref inside a manifests list: validated, not
        # skipped — refused while its file is missing, landed after
        vp2 = os.path.join(t, "_manifest", "v000002.json")
        inline = {
            "version": 2,
            "manifests": [{"_inline": {"files": ["part-inline.parquet"]}}],
        }
        assert client.put_if_absent(vp2, _json.dumps(inline).encode())
        _backfill(client, vp2)
        assert not os.path.exists(vp2)
        open(os.path.join(t, "part-inline.parquet"), "wb").close()
        _backfill(client, vp2)
        assert _json.load(open(vp2)) == inline


def test_transient_get_failure_stays_a_retryable_conflict(
    spark, tmp_path, monkeypatch
):
    """A transient store error on the loser's backfill GET must stay a
    FileExistsError (routine retried conflict), never escape as a hard
    ObjectStoreError the retry loops don't catch."""
    with FakeS3Server() as srv:
        client = S3ConditionalPutClient(srv.endpoint, "warehouse")
        flaky = {"n": 0}
        real_get = client.get

        def flaky_get(key):
            flaky["n"] += 1
            raise ObjectStoreError("simulated 503")

        monkeypatch.setattr(M, "_claim_version", make_claim_version(client))
        t = str(tmp_path / "tbl")
        M.append(spark, _df(spark, [("a", 0)]), t)  # v0
        # force a conflict: pre-claim v1 at the store with valid bytes
        # (no local mirror), with GET failing when the loser backfills
        import json as _json

        m = _json.load(open(M._version_path(t, 0)))
        m["version"] = 1
        assert client.put_if_absent(
            M._version_path(t, 1), _json.dumps(m).encode()
        )
        monkeypatch.setattr(client, "get", flaky_get)
        with pytest.raises(M.CommitConflict):
            M.append(spark, _df(spark, [("b", 1)]), t, max_retries=2)
        assert flaky["n"] >= 1  # the backfill was attempted and failed softly
        monkeypatch.setattr(client, "get", real_get)
        # with the store healthy again the chain heals and commits
        M.append(spark, _df(spark, [("c", 2)]), t)
        assert M.current_version(t) == 2


def test_overlapping_merges_green_under_conditional_put_backend(
    spark, tmp_path, monkeypatch
):
    """Concurrent overlapping insert-if-absent merges through the HTTP
    backend: first-writer-wins stays global (no duplicated key)."""
    with FakeS3Server() as srv:
        client = S3ConditionalPutClient(srv.endpoint, "warehouse")
        monkeypatch.setattr(M, "_claim_version", make_claim_version(client))
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
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=run, args=(b,)) for b in batches]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors
        got = [r["arrest_key"] for r in M.snapshot(t).read(spark).collect()]
        assert sorted(got) == ["k1", "k2", "k3", "k4", "seed", "shared"]
        assert len(got) == len(set(got))
