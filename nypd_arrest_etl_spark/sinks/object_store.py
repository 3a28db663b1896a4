"""Conditional-PUT commit backend for the manifest table format.

The commit protocol's ONE pluggable primitive is
``manifest._claim_version(tmp_path, version_path)`` — publish the
staged version file iff nobody else has (POSIX hard link by default).
Object stores offer the same primitive as a conditional write: S3's
``PUT`` with ``If-None-Match: *`` succeeds only if the key does not
exist (HTTP 412 Precondition Failed when it does; 409 when another
conditional write on the same key is mid-flight) — the documented
public semantics GCS (``x-goog-if-generation-match: 0``) and Azure
(``If-None-Match: *``) share. This module turns that seam into a
TESTED client:

- :class:`S3ConditionalPutClient` — stdlib ``http.client`` only, no
  SDK: one ``put_if_absent(key, body)`` call per claim. Unsigned
  requests by design (point it at a private endpoint / sigv4 proxy /
  IAM-free MinIO; request signing is deployment plumbing, the atomic
  claim is the protocol-relevant part).
- :func:`make_claim_version` — adapts the client to the
  ``_claim_version`` signature so the whole commit stack
  (append / merge / upsert / compaction retry loops) runs unchanged
  against an object store: the store's CAS is authoritative for WHO
  wins a version; the winner then mirrors the immutable version file
  locally so same-process readers keep working. tests/test_manifest.py
  re-runs the threaded commit races against a local fake-S3 server
  (ThreadingHTTPServer implementing the same status codes) through
  this client.

At 100 TB: a version claim is one ~KB conditional PUT per commit —
the same O(1) metadata cost as the hard link, with S3's
read-after-write consistency giving losers an immediate 412 instead
of an EEXIST.
"""

from __future__ import annotations

import http.client
import os
import urllib.parse


class ObjectStoreError(OSError):
    """Non-conflict failure talking to the store (5xx, transport)."""


class S3ConditionalPutClient:
    """Minimal S3-compatible conditional-write client (stdlib only).

    ``endpoint`` is ``http://host:port`` (or https). Keys are
    URL-quoted into ``/{bucket}/{key}``. Thread-safe: one short-lived
    connection per call — claim traffic is one request per COMMIT, so
    connection reuse buys nothing and shared sockets would need locks.
    """

    def __init__(self, endpoint: str, bucket: str, timeout: float = 10.0):
        u = urllib.parse.urlparse(endpoint)
        if u.scheme not in ("http", "https") or not u.netloc:
            raise ValueError(f"endpoint must be http(s)://host[:port], got {endpoint!r}")
        self._https = u.scheme == "https"
        self._netloc = u.netloc
        self.bucket = bucket.strip("/")
        self.timeout = timeout

    def _connect(self) -> http.client.HTTPConnection:
        cls = http.client.HTTPSConnection if self._https else http.client.HTTPConnection
        return cls(self._netloc, timeout=self.timeout)

    def _url(self, key: str) -> str:
        return f"/{self.bucket}/" + urllib.parse.quote(key.lstrip("/"), safe="/")

    def put_if_absent(self, key: str, body: bytes) -> bool:
        """True iff this call created the object. False on 412
        (exists) and on 409 (a concurrent conditional write raced us —
        either way WE did not claim it, which is all the commit
        protocol needs to know). Raises :class:`ObjectStoreError` on
        anything else."""
        conn = self._connect()
        try:
            conn.request(
                "PUT",
                self._url(key),
                body=body,
                headers={
                    "If-None-Match": "*",
                    "Content-Length": str(len(body)),
                    "Content-Type": "application/json",
                },
            )
            resp = conn.getresponse()
            resp.read()  # drain so the connection closes cleanly
            if resp.status in (200, 201):
                return True
            if resp.status in (409, 412):
                return False
            raise ObjectStoreError(
                f"PUT {key}: unexpected status {resp.status} {resp.reason}"
            )
        finally:
            conn.close()

    def get(self, key: str) -> bytes | None:
        """Object bytes, or None when absent (404)."""
        conn = self._connect()
        try:
            conn.request("GET", self._url(key))
            resp = conn.getresponse()
            data = resp.read()
            if resp.status == 200:
                return data
            if resp.status == 404:
                return None
            raise ObjectStoreError(
                f"GET {key}: unexpected status {resp.status} {resp.reason}"
            )
        finally:
            conn.close()


def _backfill(client: S3ConditionalPutClient, version_path: str) -> None:
    """Mirror a store-held version file to the local path — only when
    everything it references still exists locally. If vacuum already
    reclaimed any of it (a winner died, then NO commit was attempted
    for the whole retention window), resurrecting the version would
    commit on top of missing files; leaving it un-backfilled keeps the
    table loudly wedged instead of quietly corrupt.

    Validation is transitive where it matters: content AND delete
    manifest refs must exist; refs the current LOCAL head also carries
    are live by definition (vacuum keeps them), while the dead
    winner's NEW refs — O(one batch) of them — get their bodies
    opened and their data files and bloom sidecars existence-checked.
    Staged under a uuid-suffixed ``.tmp-`` name (concurrent losers
    must not truncate each other's in-flight copy; the orphan of a
    crash is reclaimed by the vacuum cleanup)."""
    import json

    from . import manifest as _m

    remote = client.get(version_path)
    if remote is None:
        return
    mdir = os.path.dirname(version_path)
    table_path = os.path.dirname(mdir)
    try:
        mf = json.loads(remote)
    except ValueError:
        return
    if not isinstance(mf, dict):
        return
    if "manifests" not in mf:
        # Legacy flat layout: the file list is inline at the top level,
        # so there are no refs to walk — but "no refs" must mean "fully
        # validated", not "validation vacuously passed" (r6 ADVICE: a
        # flat-layout version used to resurrect with ZERO existence
        # checks — the exact quiet corruption this function refuses).
        # Validate the inline list the same way a new ref's body is.
        files = mf.get("files")
        if not isinstance(files, list):
            return
        for fp in files:
            if not os.path.exists(os.path.join(table_path, fp)):
                return
        _publish_backfill(mdir, version_path, remote)
        return
    refs = list(mf.get("manifests") or []) + list(mf.get("delete_manifests") or [])
    head_refs: set = set()
    head_v = _m.current_version(table_path)
    if head_v is not None:
        hm = _m._load_manifest(table_path, head_v)
        head_refs = {
            r.get("path")
            for r in list(hm.get("manifests") or [])
            + list(hm.get("delete_manifests") or [])
            if isinstance(r, dict)
        }
    def _body_ok(body: dict) -> bool:
        for fp in list(body.get("files") or []) + list(body.get("data_files") or []):
            if not os.path.exists(os.path.join(table_path, fp)):
                return False
        for recs in (body.get("bloom") or {}).get("cols", {}).values():
            for rec in recs.values():
                if not os.path.exists(os.path.join(mdir, rec[0])):
                    return False
        return True

    for ref in refs:
        if not isinstance(ref, dict):
            return
        p = ref.get("path")
        if p is None:
            # pathless ref: content travels in the version file — its
            # file list validates like any other ref body (r6 ADVICE:
            # these used to be skipped outright)
            inline = ref.get("_inline")
            if not isinstance(inline, dict) or not _body_ok(inline):
                return
            continue
        full = os.path.join(mdir, p)
        if not os.path.exists(full):
            return
        if p in head_refs:
            continue  # carried from the live head: vacuum keeps it
        # the dead winner's NEW manifest: its data files and bloom
        # sidecars must have survived too
        try:
            with open(full) as fh:
                body = json.load(fh)
        except ValueError:
            return
        if not isinstance(body, dict) or not _body_ok(body):
            return
    _publish_backfill(mdir, version_path, remote)


def _publish_backfill(mdir: str, version_path: str, remote: bytes) -> None:
    """Atomically land validated store bytes at the local version
    path. Staged under a uuid-suffixed ``.tmp-`` name (concurrent
    losers must not truncate each other's in-flight copy; the orphan
    of a crash is reclaimed by the vacuum cleanup)."""
    import uuid

    tmp2 = os.path.join(
        mdir,
        f".tmp-backfill-{uuid.uuid4().hex}-{os.path.basename(version_path)}",
    )
    with open(tmp2, "wb") as f:
        f.write(remote)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp2, version_path)


def make_claim_version(client: S3ConditionalPutClient):
    """A drop-in for ``manifest._claim_version`` backed by the store's
    conditional PUT. The object key is the version file's path (unique
    per table); the store is authoritative for who wins. The winner
    mirrors the immutable version file to the local path so
    same-process snapshot readers are unchanged; losers raise
    ``FileExistsError`` exactly like the hard-link primitive, feeding
    the existing retry loops."""

    def claim(tmp_path: str, version_path: str) -> None:
        with open(tmp_path, "rb") as f:
            body = f.read()
        if not client.put_if_absent(version_path, body):
            # Losing the CAS means SOMEONE holds this version at the
            # store — but if that winner died between its PUT and its
            # local mirror, no local copy exists and every later
            # snapshot() would pin the same stale base forever (412 on
            # every retry). Backfill the missing version from the
            # authoritative store before reporting the conflict, so
            # the retry loop sees the real head. The backfill is
            # strictly best-effort: ANY failure still raises
            # FileExistsError (a routine, retried conflict), never a
            # hard error the retry loops don't catch — including
            # non-OSError transport surprises (http BadStatusLine) and
            # malformed store bytes.
            try:
                if not os.path.exists(version_path):
                    _backfill(client, version_path)
            except Exception:
                pass
            raise FileExistsError(version_path)
        # Mirror ATOMICALLY (hard link of the already-staged tmp, the
        # same primitive the local backend uses): a concurrent reader
        # listing versions must never json.load a half-copied file.
        # We won the store's CAS, so a racing local claim is
        # impossible; a pre-existing local file could only be our own
        # bytes from a torn earlier attempt of THIS version.
        try:
            os.link(tmp_path, version_path)
        except FileExistsError:
            pass

    return claim


__all__ = ["S3ConditionalPutClient", "ObjectStoreError", "make_claim_version"]
