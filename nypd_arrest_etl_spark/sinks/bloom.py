"""Per-file Bloom-filter sidecars for the manifest table format.

Min/max range stats (manifest.py) cannot skip files on UNIFORM keys —
a content fingerprint, a UUID, a hashed user id spreads across the full
value range in every file, so every point lookup and every
insert-if-absent merge scans the whole key column of the table. This
module adds the lakehouse answer (the shape of Iceberg's Puffin blob
sidecars / Parquet column bloom filters, built from public primitives):

- Each content manifest may carry ONE binary sidecar file
  (``_manifest/bloom-<hex>.bin``) holding a fixed-width Bloom bitmap
  per (declared column, data file), referenced by offset from the
  manifest JSON. Manifests stay small; bitmap bytes live off to the
  side and are read lazily, a seek+read of ``m/8`` bytes per probed
  file — planning never loads data.
- Bitmaps are built EXECUTOR-SIDE in one distributed pass over only
  the newly written files (``xxhash64`` positions computed in the JVM,
  bits set in numpy via ``applyInPandas``); the driver collects just
  ``m/8`` bytes per file.
- Probing needs NO Spark job: the same hash chain is reimplemented in
  pure Python (``xxh64`` below, parity-tested against Spark's
  ``xxhash64`` expression), so ``Snapshot.prune`` can test ``=`` /
  ``in`` filter values against candidate files entirely driver-side —
  including from the DataSource planner, where no job may run.

Hash design: position ``i`` of value ``v`` is
``pmod(xxhash64(cast(v as string), lit(str(i))), m)`` — Spark chains
multi-argument xxhash64 by feeding each result as the next seed, so
the Python twin is ``xxh64(str(i), seed=xxh64(utf8(v), 42)) % m``.
Casting through STRING pins one canonical byte representation on both
sides; bloom columns are therefore restricted to string / integral
types, whose casts agree between Spark and ``str()`` (floats, bools,
dates do not — they are rejected at declaration).

False-positive budget: ``BITS_PER_ROW = 16`` and ``K = 7`` give
``(1 - e^(-7/16))^7 ~= 7e-4`` per probe — small enough that a
200-key merge batch keeps a non-matching file with probability
~0.13, i.e. prunes ~87% of a cold table's files, while costing 2
bytes of sidecar per row (0.2% of a typical 1 KB row).
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BITS_PER_ROW = 16
K = 7
MIN_M = 8 * 1024          # floor: tiny files still get a real filter
MAX_M = 8 * (1 << 20)     # cap: 1 MiB of sidecar per file
#: types whose Spark cast-to-string matches Python ``str()`` exactly
BLOOMABLE_TYPES = {"string", "int", "bigint", "smallint", "tinyint", "long"}

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int) -> int:
    """Pure-Python XXH64 (public xxHash spec) over ``data`` with
    ``seed``, returned as an UNSIGNED 64-bit int. Parity with Spark's
    ``xxhash64`` expression is asserted by tests (Spark returns the
    same value as a signed long)."""
    seed &= _MASK
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            x1, x2, x3, x4 = struct.unpack_from("<QQQQ", data, i)
            v1, v2, v3, v4 = (
                _round(v1, x1),
                _round(v2, x2),
                _round(v3, x3),
                _round(v4, x4),
            )
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        (x,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, x)
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i <= n - 4:
        (x,) = struct.unpack_from("<I", data, i)
        h ^= (x * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxh64_long(v: int, seed: int) -> int:
    """Twin of Spark's ``xxhash64`` over a BIGINT/LONG column only:
    XXH64 over the 8-byte little-endian encoding (parity-tested).
    Narrow integral columns take the 4-byte path — use
    :func:`xxh64_int` for those. Unsigned result."""
    return xxh64(struct.pack("<q", v), seed)


def xxh64_int(v: int, seed: int) -> int:
    """Twin of Spark's ``xxhash64`` over a TINYINT/SMALLINT/INT
    column: Spark's ``hashInt`` path is exactly XXH64 over the 4-byte
    little-endian two's-complement encoding (parity-tested against
    live Spark for all three widths incl. negatives and extremes).
    Unsigned result."""
    return xxh64(struct.pack("<i", v), seed)


#: integral simpleString() names. NOTE: Spark's xxhash64 does NOT hash
#: them uniformly — bigint/long take the 8-byte path (xxh64_long);
#: tinyint/smallint/int take the 4-byte hashInt path (xxh64_int).
#: Bloom probing is unaffected (both sides hash the cast-to-STRING
#: bytes), but any raw-column use of the twins must pick by width —
#: see manifest._bucket_of and the per-width parity tests.
LONG_TYPES = {"bigint", "long"}
NARROW_INT_TYPES = {"tinyint", "smallint", "int"}
INTEGRAL_TYPES = LONG_TYPES | NARROW_INT_TYPES


def probe_positions(value, m: int, k: int = K) -> list[int] | None:
    """The ``k`` bit positions of ``value`` in an ``m``-bit filter, or
    ``None`` when the value's type cannot be canonically stringified
    (caller must then keep the file — never prune on ignorance).
    Mirrors the Spark-side build chain exactly. THE single probe-side
    hash implementation: every prober path must call this (or the
    typed wrapper below), never re-derive the chain."""
    if isinstance(value, bool) or not isinstance(value, (str, int)):
        return None
    b = str(value).encode("utf-8")
    h1 = xxh64(b, 42)
    return [xxh64(str(i).encode("ascii"), h1) % m for i in range(k)]


def probe_positions_typed(value, m: int, k: int, col_type: str | None):
    """Positions for a FILTER literal against a column of declared
    ``col_type`` — None (keep the file) whenever the literal's Python
    type does not canonically match the column's bytes. Spark's
    residual row comparison type-coerces (``'0123' = 123`` is true;
    ``bigint_col = '7.0'`` is true), but the bitmap holds the column's
    exact cast-to-string bytes, so probing a coerced literal's OWN
    string would wrongly prune the holder file. Unknown/undeclared
    column type also refuses — never prune on ignorance."""
    if col_type == "string":
        if not isinstance(value, str):
            return None
    elif col_type in INTEGRAL_TYPES:
        if isinstance(value, bool) or not isinstance(value, int):
            return None
    else:
        return None
    return probe_positions(value, m, k)


def _position_cols(value_col, m: int) -> list:
    """Spark twin of :func:`probe_positions`: K position columns for a
    STRING column. ``pmod`` of the signed hash equals Python's ``%``
    on the unsigned value for positive m."""
    return [
        F.pmod(F.xxhash64(value_col, F.lit(str(i))), F.lit(m)).alias(f"p{i}")
        for i in range(K)
    ]


def size_for(avg_rows: float) -> int:
    """Bitmap width (bits) for an expected per-file row count: the
    BITS_PER_ROW budget rounded up to a power of two, floored/capped.
    One width per manifest keeps sidecar offsets implicit-friendly and
    the probe math uniform."""
    m = MIN_M
    target = max(MIN_M, int(avg_rows * BITS_PER_ROW))
    while m < target and m < MAX_M:
        m *= 2
    return m


def build_entry(
    spark: SparkSession,
    table_path: str,
    rels: list[str],
    stats: dict,
    cols: list[str],
) -> dict | None:
    """Compute per-(col, file) Bloom bitmaps for newly written files,
    write them to ONE sidecar, and return the manifest ``bloom`` entry
    ``{"cols": {col: {rel: [sidecar, offset, m, k]}}}`` (each file
    self-describing, so metadata compaction can merge entries from
    manifests built with different widths without rewriting bitmaps);
    None when there is nothing to index.

    ONE distributed pass for ALL declared columns over ONLY the new
    files (their position columns computed side by side, one shuffle
    on the file name): hash positions in the JVM, every column's
    bitmap assembled in the same numpy kernel per file, and the
    sidecar SEGMENTS written executor-side — one ``bloom-*.bin`` per
    non-empty task, each record self-describing
    ``[sidecar, offset, m, k]`` so readers, metadata compaction and
    vacuum never care how many segments a commit produced. The driver
    collects only (file, sidecar, offset) records: O(new files) SMALL
    rows, never bitmap bytes — a 10k-file bulk load stages kilobytes
    on the driver, not gigabytes. O(new data) executor work per
    commit, independent of table size and of the number of declared
    columns (beyond the extra position expressions in the same
    scan).

    DEPLOYMENT REQUIREMENT: segment writes happen in EXECUTOR tasks,
    so ``table_path/_manifest`` must be storage every executor AND the
    driver can reach (shared filesystem / NFS / fuse-mounted object
    store) — the same requirement Spark itself places on the table's
    data directory, but worth stating because the rest of the manifest
    layer writes driver-side only (the object_store commit seam,
    sinks/object_store.py, covers the version-claim leg; sidecar
    segments ride the data path). On a non-shared deployment a
    segment would land on executor-local disk while its collected
    offset records reference it — so assembly below VERIFIES every
    referenced segment is visible here and raises instead of
    committing dangling references."""
    if not rels or not cols:
        return None
    total_rows = sum(stats[r]["rows"] for r in rels if r in stats)
    m = size_for(total_rows / max(1, len(rels)))
    nbytes = m // 8

    import numpy as np
    import pandas as pd

    ncols = len(cols)

    def _bitmaps(pdf: pd.DataFrame) -> pd.DataFrame:
        out: dict = {"f": [pdf["f"].iloc[0]]}
        for ci in range(ncols):
            bs = np.zeros(nbytes, dtype=np.uint8)
            for i in range(K):
                s = pdf[f"c{ci}p{i}"].dropna()
                if len(s):
                    idx = s.to_numpy(dtype="int64")
                    np.bitwise_or.at(
                        bs, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8)
                    )
            out[f"bm{ci}"] = [bs.tobytes()]
        return pd.DataFrame(out)

    mdir = os.path.join(table_path, "_manifest")
    os.makedirs(mdir, exist_ok=True)

    def _write_segment(batches):
        """Per-TASK sidecar segment: stream this task's (file, bitmaps)
        rows into one local blob, publish it atomically (tmp + fsync +
        rename — same protocol as manifests; a retried/speculated
        task's duplicate segment is an unreferenced orphan vacuum
        reclaims), and emit only (file, segment name, base offset)."""
        import uuid as _uuid

        name = f"bloom-{_uuid.uuid4().hex}.bin"
        blob = bytearray()
        fs: list[str] = []
        offs: list[int] = []
        for pdf in batches:
            for j in range(len(pdf)):
                fs.append(pdf["f"].iloc[j])
                offs.append(len(blob))
                for ci in range(ncols):
                    blob.extend(pdf[f"bm{ci}"].iloc[j])
        if not blob:
            return
        tmp = os.path.join(mdir, f".tmp-{name}")
        with open(tmp, "wb") as fh:
            fh.write(bytes(blob))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(mdir, name))
        yield pd.DataFrame({"f": fs, "sidecar": name, "off": offs})

    # ONE distributed pass for every declared column: position columns
    # for all of them computed side by side (a null value yields null
    # positions, dropped in the bitmap kernel — filters never match
    # null, so unset bits for nulls are correct), one shuffle on the
    # file name, all bitmaps assembled in the same pandas call.
    poscols = []
    for ci, c in enumerate(cols):
        v = F.col(c).cast("string")
        for i, pc in enumerate(_position_cols(v, m)):
            poscols.append(F.when(v.isNotNull(), pc).alias(f"c{ci}p{i}"))
    # URI -> rel mapping by matching the path's FULL rel-depth tail
    # against this commit's rels — exact and O(distinct depths) per
    # file. NOT by basename: Spark's dynamic partition writer reuses
    # the same part-file basename across every partition directory a
    # task writes, so a hive-partitioned commit collides on nearly
    # every name. NOT by os.path.relpath against abspath(table_path):
    # the JVM qualifies input_file_name against ITS working directory,
    # so a relative table_path plus an os.chdir (or a scheme-qualified
    # path) would silently unmap every file. And NOT by O(files)
    # suffix scan (the r5 shape, O(files^2) per commit). Every rel is
    # anchored at its own component tuple, so a tail matches at most
    # one rel; an unmapped file is left unprunable, never wrongly
    # pruned.
    by_tail: dict[tuple, str] = {}
    depths: set[int] = set()
    for r in rels:
        t = tuple(r.replace(os.sep, "/").split("/"))
        depths.add(len(t))
        by_tail[t] = r

    def _rel_of(uri: str) -> str | None:
        from urllib.parse import unquote, urlparse

        p = unquote(urlparse(uri).path or uri).replace(os.sep, "/")
        segs = tuple(p.split("/"))
        # require a UNIQUE match across depths: with mixed-depth rels
        # a shallow rel's tuple can equal the tail of a deeper file's
        # path — ambiguity maps bitmaps to the wrong file (WRONG
        # pruning), so an ambiguous file is left unprunable instead
        hits = [r for d in depths if (r := by_tail.get(segs[-d:])) is not None]
        return hits[0] if len(hits) == 1 else None

    paths = [os.path.join(table_path, r) for r in rels]
    recs = (
        spark.read.parquet(*paths)
        .select(F.input_file_name().alias("f"), *poscols)
        .groupBy("f")
        .applyInPandas(
            _bitmaps,
            schema="f string, "
            + ", ".join(f"bm{ci} binary" for ci in range(ncols)),
        )
        .mapInPandas(_write_segment, schema="f string, sidecar string, off long")
        .collect()
    )
    # fail LOUDLY on a segment the driver can't see: committing the
    # entry anyway would publish offset records pointing at bytes that
    # exist only on some executor's local disk (docstring requirement)
    missing = {
        s
        for s in {r["sidecar"] for r in recs}
        if not os.path.exists(os.path.join(mdir, s))
    }
    if missing:
        raise OSError(
            f"bloom sidecar segment(s) {sorted(missing)} written by executor "
            f"tasks are not visible at {mdir!r} — _manifest must be on "
            "storage shared between executors and the driver"
        )
    entry: dict[str, dict] = {}
    for r in recs:
        rel = _rel_of(r["f"])
        if rel is None:  # unexpected path shape: leave unprunable
            continue
        for ci, c in enumerate(cols):
            entry.setdefault(c, {})[rel] = [
                r["sidecar"], r["off"] + ci * nbytes, m, K,
            ]
    return {"cols": entry} if entry else None


def merge_entries(entries: list[dict | None]) -> dict | None:
    """Union bloom entries from manifests being metadata-compacted into
    one: per-file records are self-describing, so merging is a dict
    union referencing the ORIGINAL sidecars (no bitmap rewrite — the
    same carry-by-reference discipline as content manifests)."""
    cols: dict[str, dict] = {}
    for e in entries:
        for c, files in (e or {}).get("cols", {}).items():
            cols.setdefault(c, {}).update(files)
    return {"cols": cols} if cols else None


def restrict_entry(entry: dict | None, files: list[str]) -> dict | None:
    """A bloom entry narrowed to ``files`` (metadata compaction drops
    records for files no longer in the manifest)."""
    if not entry:
        return None
    fs = set(files)
    cols = {
        c: kept
        for c, recs in entry.get("cols", {}).items()
        if (kept := {f: r for f, r in recs.items() if f in fs})
    }
    return {"cols": cols} if cols else None


class BloomProber:
    """Lazy reader over bloom sidecars for one prune call: ONE
    seek+read of ``m/8`` bytes per probed (col, file) — the bitmap is
    held for the duration of that file's filters, so an ``in`` list of
    5000 keys tests 5000 position sets against bytes already in memory
    (only the last bitmap is retained: O(1) memory, and a file's
    probes are consecutive). Value->positions memoized per
    (value, m, k, col_type) via the single authoritative
    :func:`probe_positions_typed`. Conservative everywhere: unknown
    column, type-mismatched or unhashable literal, missing or short
    bitmap all keep the file."""

    def __init__(self, table_path: str, types: dict | None = None):
        self.mdir = os.path.join(table_path, "_manifest")
        #: declared column type per name — the probe-side guard against
        #: Spark's type-coercing equality (see probe_positions_typed)
        self.types = types or {}
        self._fhs: dict[str, object] = {}
        self._pos: dict[tuple, list[int] | None] = {}
        self._last_bm: tuple | None = None  # ((sidecar, off, m), bytes)

    def _positions(self, value, m: int, k: int, col_type) -> list[int] | None:
        key = (value, m, k, col_type)
        if key not in self._pos:
            self._pos[key] = probe_positions_typed(value, m, k, col_type)
        return self._pos[key]

    def _bitmap(self, sidecar: str, off: int, m: int) -> bytes | None:
        key = (sidecar, off, m)
        if self._last_bm is not None and self._last_bm[0] == key:
            return self._last_bm[1]
        fh = self._fhs.get(sidecar)
        if fh is None:
            try:
                fh = open(os.path.join(self.mdir, sidecar), "rb")
            except OSError:
                self._fhs[sidecar] = False
                return None
            self._fhs[sidecar] = fh
        elif fh is False:
            return None
        fh.seek(off)
        bm = fh.read(m // 8)
        bm = bm if len(bm) == m // 8 else None
        self._last_bm = (key, bm)
        return bm

    @staticmethod
    def _hit(bm: bytes, pos: list[int]) -> bool:
        return all(bm[p >> 3] & (1 << (p & 7)) for p in pos)

    def file_passes(self, bloom: dict | None, rel: str, filters) -> bool:
        """Probe every ``=`` / ``in`` filter whose column this
        manifest's bloom entry indexes against one file."""
        if not bloom:
            return True
        cols = bloom.get("cols", {})
        for name, op, value in filters:
            recs = cols.get(name)
            if recs is None or rel not in recs:
                continue
            sidecar, off, m, k = recs[rel]
            off, m, k = int(off), int(m), int(k)
            ct = self.types.get(name)
            if op == "=":
                pos = self._positions(value, m, k, ct)
                if pos is None:
                    continue
                bm = self._bitmap(sidecar, off, m)
                if bm is not None and not self._hit(bm, pos):
                    return False
            elif op == "in":
                probed = [self._positions(v, m, k, ct) for v in value]
                if any(p is None for p in probed):
                    continue  # some value unprobeable: cannot exclude
                bm = self._bitmap(sidecar, off, m)
                if bm is not None and not any(
                    self._hit(bm, p) for p in probed
                ):
                    return False
        return True

    def close(self) -> None:
        for fh in self._fhs.values():
            if fh not in (None, False):
                fh.close()
        self._fhs = {}
        self._last_bm = None


def validate_bloom_cols(schema: list[dict] | None, cols) -> list[str]:
    """Declaration-time check: bloom columns must exist with a type
    whose Spark string-cast is canonical (string / integral). Raises
    on anything else so a misdeclaration fails loudly at write time,
    not silently at probe time."""
    out = list(cols)
    if schema is None:
        return out
    types = {c["name"]: c["type"] for c in schema}
    for c in out:
        t = types.get(c)
        if t is None:
            raise ValueError(f"bloom column {c!r} not in table schema")
        if t not in BLOOMABLE_TYPES:
            raise ValueError(
                f"bloom column {c!r} has type {t!r}; bloom filters need "
                f"canonical string casts — one of {sorted(BLOOMABLE_TYPES)}"
            )
    return out
