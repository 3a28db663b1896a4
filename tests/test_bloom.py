"""Per-file Bloom sidecars (sinks/bloom.py): hash parity with Spark,
file skipping on uniform keys, merge integration, rewrite re-indexing,
metadata-compaction carry, vacuum liveness, rename safety."""

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from nypd_arrest_etl_spark.sinks import bloom as B
from nypd_arrest_etl_spark.sinks import manifest as M

# Long-running suite (streaming drains / live servers / storage-format
# e2e / property fuzz / soak): excluded from the default gate run by
# pytest.ini's `-m "not slow"`; run with -m "" or SPARK_GRAFT_FULL_TESTS=1.
pytestmark = pytest.mark.slow



def _fp(i) -> str:
    return hashlib.sha256(str(i).encode()).hexdigest()


def _keys_df(spark, lo, hi, parts=4):
    return (
        spark.range(lo, hi)
        .select(
            F.sha2(F.col("id").cast("string"), 256).alias("k"),
            F.col("id").alias("v"),
        )
        .repartition(parts)
    )


@pytest.fixture()
def bloom_table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _keys_df(spark, 0, 1000), t, bloom_cols=("k",))
    M.append(spark, _keys_df(spark, 1000, 2000), t)  # inherits declaration
    M.append(spark, _keys_df(spark, 2000, 3000), t)
    return t


def test_bulk_load_assembles_sidecars_executor_side(spark, tmp_path):
    """A bulk load (5k data files) must index in per-task sidecar
    SEGMENTS written executor-side — the r5 design collected one
    bitmap per file to the driver and assembled one blob there, so a
    10k-file load staged gigabytes driver-side and the path-matching
    loop was O(files^2). Asserts: every file indexed, multiple
    segments on disk (no single driver-assembled blob), total sidecar
    bytes exactly n_files * m/8, and probing still prunes to the
    holder file / to nothing."""
    t = str(tmp_path / "bulk")
    # AQE's post-shuffle coalescing governs segment fan-out: at real
    # scale the 64MB advisory bounds each task's bitmap mass, but this
    # test's 5k tiny bitmaps coalesce to ONE task — disable coalescing
    # here so the multi-segment path is actually exercised.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        # round-robin repartition leaves some of the 8000 target
        # partitions empty; whatever lands is still thousands of files
        M.append(spark, _keys_df(spark, 0, 8000, parts=8000), t,
                 bloom_cols=("k",))
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    snap = M.snapshot(t)
    n_files = snap.n_files
    assert n_files >= 5000
    # every data file carries a bloom record
    recs = {}
    for ref in snap.refs:
        body = ref.get("_inline") or M._load_content_manifest(t, ref["path"])
        recs.update((body.get("bloom") or {}).get("cols", {}).get("k", {}))
    assert set(recs) == set(snap.files)
    # executor-side segments: more than one sidecar, sizes sum exactly
    segs = glob.glob(os.path.join(t, "_manifest", "bloom-*.bin"))
    assert len(segs) > 1
    m = next(iter(recs.values()))[2]
    assert sum(os.path.getsize(s) for s in segs) == n_files * (m // 8)
    # probe: point lookup keeps ~1 file; absent key prunes everything
    kept = snap.prune([("k", "=", _fp(123))])
    assert 1 <= len(kept) <= 3
    got = snap.read(spark, filters=[("k", "=", _fp(123))]).collect()
    assert len(got) == 1 and got[0]["v"] == 123
    assert snap.prune([("k", "=", "0" * 64)]) == []


def test_missing_executor_segment_fails_loudly(spark, tmp_path, monkeypatch):
    """r6 ADVICE (low): segments are written by EXECUTOR tasks, so on a
    deployment where _manifest is not shared storage they would land on
    executor-local disks while the collected offset records reference
    them. Assembly must refuse to return an entry whose segments the
    driver cannot see (simulated by blinding the visibility check),
    not commit dangling references."""
    t = str(tmp_path / "tbl")
    _keys_df(spark, 0, 100, parts=2).write.parquet(t)
    rels = [os.path.basename(p) for p in glob.glob(os.path.join(t, "*.parquet"))]
    stats = {r: {"rows": 50} for r in rels}
    real_exists = os.path.exists

    def blind_to_segments(p):
        return False if "bloom-" in str(p) else real_exists(p)

    monkeypatch.setattr(B.os.path, "exists", blind_to_segments)
    with pytest.raises(OSError, match="not visible"):
        B.build_entry(spark, t, rels, stats, ["k"])


def test_partitioned_write_indexes_every_file(spark, tmp_path):
    """Blooms declared on a hive-partitioned (bucket16) table must
    index EVERY data file (r6 review regression: basename-keyed
    file->rel mapping collided on partitioned writes — Spark reuses
    part-file basenames across partition dirs — silently recording
    ZERO bloom records)."""
    t = str(tmp_path / "ptbl")
    df = spark.range(0, 2000).select(
        F.sha2(F.col("id").cast("string"), 256).alias("k"),
        F.col("id").alias("v"),
    )
    M.append(spark, df.repartition(8), t,
             partition_by=("k", "bucket16"), bloom_cols=("k",))
    snap = M.snapshot(t)
    recs = {}
    for ref in snap.refs:
        body = ref.get("_inline") or M._load_content_manifest(t, ref["path"])
        recs.update((body.get("bloom") or {}).get("cols", {}).get("k", {}))
    assert set(recs) == set(snap.files)  # every partitioned file indexed
    # probe composes with bucket16 pruning and reads exactly
    probe = _fp(777)
    kept = snap.prune([("k", "=", probe)])
    assert 0 < len(kept) <= 2
    got = snap.read(spark, filters=[("k", "=", probe)]).collect()
    assert len(got) == 1 and got[0]["v"] == 777
    assert snap.prune([("k", "=", "0" * 64)]) == []


def test_vacuum_reclaims_aged_tmp_staging_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _keys_df(spark, 0, 10, parts=1), t, bloom_cols=("k",))
    stale = os.path.join(t, "_manifest", ".tmp-bloom-deadbeef.bin")
    open(stale, "wb").write(b"x" * 64)
    os.utime(stale, (1, 1))  # ancient: a task killed mid-write long ago
    fresh = os.path.join(t, "_manifest", ".tmp-bloom-cafef00d.bin")
    open(fresh, "wb").write(b"y")  # in-flight writer: must survive
    M.vacuum(t, keep_versions=1, retention_seconds=3600.0)
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)


# ---------------------------------------------------------------------------
# hash parity: the pure-Python probe twin must equal Spark's xxhash64
# ---------------------------------------------------------------------------


def test_xxh64_matches_spark_all_tail_lengths(spark):
    # lengths 0..40 cover every tail path (32-byte stripes, 8-, 4-,
    # 1-byte remainders); unicode exercises multi-byte UTF-8
    vals = ["x" * n for n in range(41)] + ["héllo ☃ wörld", "", "0", str(2**62)]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v string")
        .select(
            "v",
            F.xxhash64("v").alias("h1"),
            F.xxhash64("v", F.lit("5")).alias("h5"),
        )
        .collect()
    )
    for r in rows:
        b = r["v"].encode("utf-8")
        u1 = B.xxh64(b, 42)
        assert u1 - (1 << 64) * (u1 >> 63) == r["h1"]
        u5 = B.xxh64(b"5", u1)
        assert u5 - (1 << 64) * (u5 >> 63) == r["h5"]


def test_probe_positions_reject_uncanonical_types():
    assert B.probe_positions(1.5, 8192) is None
    assert B.probe_positions(True, 8192) is None
    assert B.probe_positions(None, 8192) is None
    assert B.probe_positions("s", 8192) is not None
    assert B.probe_positions(7, 8192) == B.probe_positions("7", 8192)


# ---------------------------------------------------------------------------
# declaration + skipping
# ---------------------------------------------------------------------------


def test_point_lookup_skips_files_range_stats_cannot(spark, bloom_table):
    snap = M.snapshot(bloom_table)
    assert snap.bloom_cols == ["k"]
    total = snap.n_files
    assert total >= 12
    present = _fp(123)
    # range stats are useless on sha256 keys: every file spans ~the
    # full hex range, so without blooms nothing would prune
    kept = snap.prune([("k", "=", present)])
    assert 1 <= len(kept) <= 2  # the holder (+ rare false positive)
    rows = snap.read(spark, filters=[("k", "=", present)]).collect()
    assert len(rows) == 1 and rows[0]["v"] == 123
    # absent key: every file bloom-excluded (fp ~7e-4 per file)
    assert len(snap.prune([("k", "=", _fp(10**9))])) <= 1


def test_in_filter_probes_every_value(spark, bloom_table):
    snap = M.snapshot(bloom_table)
    keys = [_fp(5), _fp(1500), _fp(2999)]
    kept = snap.prune([("k", "in", keys)])
    assert 1 <= len(kept) <= 5
    got = snap.read(spark, filters=[("k", "in", keys)]).count()
    assert got == 3
    # unhashable value in the list -> cannot exclude, keeps all
    assert len(snap.prune([("k", "in", [1.5])])) == snap.n_files


def test_bloom_validation_rejects_bad_columns(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([("a", 1.0)], "k string, x double")
    with pytest.raises(ValueError, match="canonical"):
        M.append(spark, df, t, bloom_cols=("x",))
    with pytest.raises(ValueError, match="not in table schema"):
        M.append(spark, df, t, bloom_cols=("missing",))


def test_retire_declaration_with_empty_tuple(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _keys_df(spark, 0, 100, parts=2), t, bloom_cols=("k",))
    M.append(spark, _keys_df(spark, 100, 200, parts=2), t, bloom_cols=())
    snap = M.snapshot(t)
    assert snap.bloom_cols is None
    # earlier files' bitmaps still prune; later files are unprunable
    kept = snap.prune([("k", "=", _fp(10**9))])
    assert len(kept) == 2  # only the post-retirement files survive


def test_pre_declaration_files_stay_unprunable_until_rewrite(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _keys_df(spark, 0, 500, parts=3), t)
    M.append(spark, _keys_df(spark, 500, 1000, parts=3), t, bloom_cols=("k",))
    snap = M.snapshot(t)
    absent = _fp(10**9)
    # first 3 files lack bitmaps -> kept conservatively
    assert len(snap.prune([("k", "=", absent)])) == 3
    M.compact_table(spark, t)
    snap2 = M.snapshot(t)
    assert len(snap2.prune([("k", "=", absent)])) == 0
    # and the data still reads exactly
    assert snap2.read(spark).count() == 1000


# ---------------------------------------------------------------------------
# merge + upsert integration
# ---------------------------------------------------------------------------


def test_merge_insert_if_absent_uses_bloom_and_stays_exact(spark, bloom_table):
    batch = spark.createDataFrame(
        [(_fp(i), i) for i in range(50)]
        + [(_fp(i + 10_000_000), i + 10_000_000) for i in range(50)],
        "k string, v long",
    )
    n, _v = M.merge_insert_if_absent_txn(spark, batch, bloom_table, key="k")
    assert n == 50
    assert M.row_count(bloom_table) == 3050
    # idempotent re-run
    n2, _v2 = M.merge_insert_if_absent_txn(spark, batch, bloom_table, key="k")
    assert n2 == 0
    # merged files are themselves indexed: their keys now probe positive
    snap = M.snapshot(bloom_table)
    assert len(snap.prune([("k", "=", _fp(10_000_007))])) >= 1
    assert (
        snap.read(spark, filters=[("k", "=", _fp(10_000_007))]).count() == 1
    )


def test_upsert_eq_files_are_indexed(spark, bloom_table):
    batch = spark.createDataFrame([(_fp(3), -3)], "k string, v long")
    M.merge_upsert_eq_txn(spark, batch, bloom_table, key="k")
    snap = M.snapshot(bloom_table)
    rows = snap.read(spark, filters=[("k", "=", _fp(3))]).collect()
    assert len(rows) == 1 and rows[0]["v"] == -3
    assert M.row_count(bloom_table) == 3000


def test_cow_delete_preserves_bloom_on_survivors(spark, bloom_table):
    M.delete_where(spark, bloom_table, [("k", "=", _fp(42))])
    snap = M.snapshot(bloom_table)
    assert snap.read(spark, filters=[("k", "=", _fp(42))]).count() == 0
    # untouched keys still bloom-prune to their holder
    assert 1 <= len(snap.prune([("k", "=", _fp(77))])) <= 2
    assert snap.read(spark, filters=[("k", "=", _fp(77))]).count() == 1


# ---------------------------------------------------------------------------
# metadata lifecycle
# ---------------------------------------------------------------------------


def test_metadata_compaction_carries_bloom_records(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(M, "MANIFEST_COMPACT_THRESHOLD", 4)
    t = str(tmp_path / "tbl")
    for g in range(6):
        M.append(
            spark,
            _keys_df(spark, g * 100, (g + 1) * 100, parts=1),
            t,
            bloom_cols=("k",) if g == 0 else None,
        )
    snap = M.snapshot(t)
    assert len(snap.refs) < 6  # compaction actually ran
    # records merged across manifests still point at original sidecars
    assert 1 <= len(snap.prune([("k", "=", _fp(437))])) <= 2
    assert snap.read(spark, filters=[("k", "=", _fp(437))]).count() == 1
    assert len(snap.prune([("k", "=", _fp(10**9))])) <= 1


def test_vacuum_keeps_live_sidecars_reclaims_dead(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _keys_df(spark, 0, 300, parts=3), t, bloom_cols=("k",))
    M.compact_table(spark, t)  # supersedes the first sidecar's manifest
    n_before = len(glob.glob(os.path.join(t, "_manifest", "bloom-*.bin")))
    assert n_before == 2
    M.vacuum(t, retention_seconds=0)
    alive = glob.glob(os.path.join(t, "_manifest", "bloom-*.bin"))
    assert len(alive) == 1  # superseded sidecar reclaimed, live one kept
    snap = M.snapshot(t)
    assert 1 <= len(snap.prune([("k", "=", _fp(123))])) <= 2
    assert snap.read(spark, filters=[("k", "=", _fp(123))]).count() == 1


def test_rename_never_wrongly_prunes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _keys_df(spark, 0, 200, parts=2), t, bloom_cols=("k",))
    M.rename_column(t, "k", "fingerprint")
    snap = M.snapshot(t)
    assert snap.bloom_cols == ["fingerprint"]
    # old bitmaps are keyed by the old name -> no probe, files kept
    kept = snap.prune([("fingerprint", "=", _fp(3))])
    assert len(kept) == 2
    assert (
        snap.read(spark, filters=[("fingerprint", "=", _fp(3))]).count() == 1
    )
    # post-rename writes index under the new name and prune again
    M.append(
        spark,
        _keys_df(spark, 200, 400, parts=2).withColumnRenamed("k", "fingerprint"),
        t,
    )
    snap2 = M.snapshot(t)
    new_key = _fp(321)
    kept2 = snap2.prune([("fingerprint", "=", new_key)])
    assert 3 <= len(kept2) <= 4  # 2 legacy unprunable + the holder (+fp)
    assert (
        snap2.read(spark, filters=[("fingerprint", "=", new_key)]).count() == 1
    )


def test_false_positive_rate_within_budget(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.append(spark, _keys_df(spark, 0, 2000, parts=2), t, bloom_cols=("k",))
    snap = M.snapshot(t)
    # probe 300 absent keys; expected per-file fp ~7e-4 -> ~0.4
    # expected survivors over 600 probes-by-file; allow generous slack
    hits = sum(
        len(snap.prune([("k", "=", _fp(10**8 + i))])) for i in range(300)
    )
    assert hits <= 6


# ---------------------------------------------------------------------------
# bucket16 transform-aware pruning (manifest.py _pt_may_match)
# ---------------------------------------------------------------------------


def test_xxh64_long_matches_spark(spark):
    vals = [0, 1, -1, 5, 42, 2**31, -(2**31) - 7, 2**62, -(2**63), 2**63 - 1]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v long")
        .select("v", F.xxhash64("v").alias("h"))
        .collect()
    )
    for r in rows:
        u = B.xxh64_long(r["v"], 42)
        assert u - (1 << 64) * (u >> 63) == r["h"], r["v"]


def test_bucket_of_matches_spark_pmod(spark):
    from nypd_arrest_etl_spark.sinks.manifest import _bucket_of

    svals = [_fp(i) for i in range(8)] + ["", "héllo"]
    ivals = [0, 7, -3, 12345678901234, -(2**40)]
    rows = (
        spark.createDataFrame([(s,) for s in svals], "v string")
        .select("v", F.pmod(F.xxhash64("v"), F.lit(16)).alias("b"))
        .collect()
    )
    for r in rows:
        assert _bucket_of(r["v"], 16, "string") == r["b"], r["v"]
    rows = (
        spark.createDataFrame([(v,) for v in ivals], "v long")
        .select("v", F.pmod(F.xxhash64("v"), F.lit(16)).alias("b"))
        .collect()
    )
    for r in rows:
        assert _bucket_of(r["v"], 16, "bigint") == r["b"], r["v"]
    # Narrow ints take Spark's 4-byte hashInt path, NOT the long path:
    # hashing 123 as a long gives bucket 9, but an int column gives 6.
    # A long-path twin here silently pruned the holder file (r5 ADVICE).
    narrow = {
        "tinyint": [0, 1, -1, 123, 127, -128],
        "smallint": [0, 1, -1, 123, 32767, -32768],
        "int": [0, 1, -1, 123, 2**31 - 1, -(2**31), 999999],
    }
    for t, vv in narrow.items():
        rows = (
            spark.createDataFrame([(v,) for v in vv], f"v {t}")
            .select("v", F.pmod(F.xxhash64("v"), F.lit(16)).alias("b"))
            .collect()
        )
        for r in rows:
            assert _bucket_of(r["v"], 16, t) == r["b"], (t, r["v"])
    # out-of-range literal for the declared width → refuse to prune
    assert _bucket_of(999999, 16, "smallint") is None
    assert _bucket_of(2**40, 16, "int") is None
    assert _bucket_of(2**63, 16, "bigint") is None


def test_xxh64_int_matches_spark(spark):
    vals = [0, 1, -1, 123, 127, -128, 32767, -32768, 2**31 - 1, -(2**31)]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v int")
        .select("v", F.xxhash64("v").alias("h"))
        .collect()
    )
    for r in rows:
        u = B.xxh64_int(r["v"], 42)
        assert u - (1 << 64) * (u >> 63) == r["h"], r["v"]


@pytest.fixture()
def bucketed_table(spark, tmp_path):
    t = str(tmp_path / "btbl")
    M.append(
        spark, _keys_df(spark, 0, 600), t, partition_by=("k", "bucket16")
    )
    M.append(spark, _keys_df(spark, 600, 1200), t)  # inherits the spec
    return t


def test_bucket16_point_lookup_prunes_to_one_bucket(spark, bucketed_table):
    snap = M.snapshot(bucketed_table)
    probe = _fp(123)  # sha256 of "123" — present
    kept = snap.prune([("k", "=", probe)])
    # one bucket out of 16, two appends: kept files must all live in
    # the matching bucket dir and be a small fraction of the table
    assert 0 < len(kept) <= len(snap.files) // 4
    got = snap.read(spark, filters=[("k", "=", probe)]).collect()
    assert len(got) == 1 and got[0]["k"] == probe


def test_bucket16_in_filter_prunes_and_reads_exact(spark, bucketed_table):
    snap = M.snapshot(bucketed_table)
    probes = [_fp(i) for i in (5, 77, 950)]
    kept = snap.prune([("k", "in", probes)])
    assert 0 < len(kept) < len(snap.files)
    rows = snap.read(spark, filters=[("k", "in", probes)]).collect()
    assert sorted(r["k"] for r in rows) == sorted(probes)


def test_bucket16_prune_is_conservative_on_type_mismatch(spark, bucketed_table):
    # an int literal on the string column cannot be hashed as Spark
    # hashes the column: pruning must keep every range-surviving file
    snap = M.snapshot(bucketed_table)
    kept = snap.prune([("k", "=", 123)])
    assert kept == snap.prune([])


def test_bucket16_on_int_column_reads_exact(spark, tmp_path):
    """Regression (r5 ADVICE high): bucket16 on a narrow-int column.
    Spark buckets int columns via the 4-byte hashInt path; a long-path
    driver twin pruned the holder file and silently dropped rows."""
    t = str(tmp_path / "itbl")
    df = spark.range(0, 400).select(
        F.col("id").cast("int").alias("k"), (F.col("id") * 2).alias("v")
    )
    M.append(spark, df, t, partition_by=("k", "bucket16"))
    snap = M.snapshot(t)
    for probe in (123, 0, 399):
        kept = snap.prune([("k", "=", probe)])
        assert 0 < len(kept) < len(snap.files), probe
        got = snap.read(spark, filters=[("k", "=", probe)]).collect()
        assert len(got) == 1 and got[0]["k"] == probe
    rows = snap.read(spark, filters=[("k", "in", [5, 77, 350])]).collect()
    assert sorted(r["k"] for r in rows) == [5, 77, 350]


def test_bucket16_prune_survives_spec_evolution(spark, bucketed_table):
    # evolve the spec to identity on v: old files keep their bucket16
    # pt records (still prunable on k), new files record the new spec
    t = bucketed_table
    from pyspark.sql import functions as F2

    M.append(
        spark,
        _keys_df(spark, 1200, 1300).withColumn("v", F2.col("v")),
        t,
        partition_by=("v", "identity"),
    )
    snap = M.snapshot(t)
    probe = _fp(50)  # lives in the bucketed generation
    kept = snap.prune([("k", "=", probe)])
    got = snap.read(spark, filters=[("k", "=", probe)]).collect()
    assert len(got) == 1
    # old-generation files outside the probe's bucket were pruned
    assert len(kept) < len(snap.files)


def test_merge_declares_blooms_and_later_batches_inherit(spark, tmp_path):
    """merge_insert_if_absent_txn(bloom_cols=...) declares sidecars at
    table creation (the curation-loop path); later merge batches
    inherit the declaration, index their own files, and the snapshot
    prunes point lookups into BOTH generations."""
    t = str(tmp_path / "mtbl")
    df1 = _keys_df(spark, 0, 500).withColumnRenamed("k", "fingerprint")
    M.merge_insert_if_absent_txn(
        spark, df1, t, key="fingerprint", bloom_cols=("fingerprint",)
    )
    snap = M.snapshot(t)
    assert snap.bloom_cols == ["fingerprint"]
    # one merged file at gen 1: the probe keeps it (present key) and
    # an absent key prunes everything — the bitmap is live
    kept = snap.prune([("fingerprint", "=", _fp(7))])
    assert 0 < len(kept) <= len(snap.files)
    assert snap.prune([("fingerprint", "=", "0" * 64)]) == []
    # idempotent re-offer: no new version, declaration untouched
    n, _ = M.merge_insert_if_absent_txn(spark, df1, t, key="fingerprint")
    assert n == 0 and M.snapshot(t).bloom_cols == ["fingerprint"]
    # fresh batch WITHOUT the kwarg inherits and indexes its files
    df2 = _keys_df(spark, 500, 600).withColumnRenamed("k", "fingerprint")
    n2, _ = M.merge_insert_if_absent_txn(spark, df2, t, key="fingerprint")
    assert n2 == 100
    snap2 = M.snapshot(t)
    kept2 = snap2.prune([("fingerprint", "=", _fp(550))])
    assert 0 < len(kept2) < len(snap2.files)
    rows = snap2.read(
        spark, filters=[("fingerprint", "=", _fp(550))]
    ).collect()
    assert len(rows) == 1 and rows[0]["v"] == 550


# ---------------------------------------------------------------------------
# round-5 review regressions
# ---------------------------------------------------------------------------


def test_type_coerced_filter_never_bloom_prunes(spark, tmp_path):
    """Spark's residual '=' type-coerces ('0123' = 123 is true), but
    bitmaps hold the column's exact string bytes: a literal whose
    Python type mismatches the declared column type must be KEPT by
    the bloom probe, so the pruned read equals unpruned read+filter."""
    t = str(tmp_path / "tc")
    df = spark.createDataFrame([("0123", 1), ("0456", 2)], "k string, v long")
    M.append(spark, df, t, bloom_cols=("k",))
    snap = M.snapshot(t)
    # int literal on a string column: ANSI casts the column, so
    # '0123' = 123 matches — but the bitmap holds '0123', so a probe
    # of '123' would miss every bit and wrongly drop the file
    got = snap.read(spark, filters=[("k", "=", 123)]).collect()
    assert len(got) == 1 and got[0]["v"] == 1
    # and the integral mirror: '07' casts to 7 and matches the long
    # column, but its own string hashes to different bits than "7"
    t2 = str(tmp_path / "tc2")
    df2 = spark.createDataFrame([(7, "a")], "k long, v string")
    M.append(spark, df2, t2, bloom_cols=("k",))
    got2 = M.snapshot(t2).read(spark, filters=[("k", "=", "07")]).collect()
    assert len(got2) == 1 and got2[0]["v"] == "a"
    # the well-typed probe still prunes: absent string key drops all
    assert snap.prune([("k", "=", "nope")]) == []


def test_rename_cannot_reuse_another_columns_name(spark, tmp_path):
    import pytest as _pytest

    t = str(tmp_path / "rn")
    M.append(
        spark,
        spark.createDataFrame([("x", 1, 2)], "a string, b long, c long"),
        t,
    )
    M.rename_column(t, "a", "a2")
    # a different column may NOT take the retired name 'a'
    with _pytest.raises(M.SchemaEvolutionError, match="different column"):
        M.rename_column(t, "c", "a")
    # the SAME column may rename back to its own earlier name
    M.rename_column(t, "a2", "a")
    assert [c["name"] for c in M.snapshot(t).schema] == ["a", "b", "c"]


def test_append_cannot_readd_retired_name(spark, tmp_path):
    import pytest as _pytest

    t = str(tmp_path / "ra")
    M.append(spark, spark.createDataFrame([("x", 1)], "a string, b long"), t)
    M.rename_column(t, "a", "a2")
    bad = spark.createDataFrame(
        [("x", 1, 9)], "a2 string, b long, a long"
    )  # "adds" nullable column under the retired name
    with _pytest.raises(M.SchemaEvolutionError, match="retired"):
        M.append(spark, bad, t)


def test_upsert_eq_redo_path_keeps_pt_records(spark, tmp_path):
    """A concurrent widen between an eq-upsert's first write and its
    commit forces the rewrite branch; the rewritten files must still
    record their bucket16 pt values (review finding: the redo write
    dropped spec=spec0, permanently exempting those files from
    bucket pruning)."""
    import unittest.mock as mock

    from pyspark.sql import functions as F

    t = str(tmp_path / "up")
    base = spark.createDataFrame([(f"k{i}", i) for i in range(50)], "k string, v int")
    M.append(spark, base, t, partition_by=("k", "bucket16"))

    real_wdf = M._write_data_files
    fired = {"done": False}

    def hooked(df, table_path, partition_col=None, **kw):
        out = real_wdf(df, table_path, partition_col, **kw)
        if not fired["done"]:
            fired["done"] = True
            # concurrent writer widens v int -> long
            M.append(
                spark,
                spark.createDataFrame([("zz", 2**40)], "k string, v long"),
                t,
                partition_by=("k", "bucket16"),
            )
        return out

    with mock.patch.object(M, "_write_data_files", hooked):
        M.merge_upsert_eq_txn(
            spark,
            spark.createDataFrame([("k1", 999), ("new1", 7)], "k string, v int"),
            t,
            key="k",
        )
    snap = M.snapshot(t)
    missing = [f for f in snap.files if "pt" not in (snap.stats.get(f) or {})]
    assert missing == [], missing
    # and the lookup actually works through the mixed generations
    got = snap.read(spark, filters=[("k", "=", "k1")]).collect()
    assert len(got) == 1 and got[0]["v"] == 999


def test_rewrite_preserves_bucket16_layout_and_pruning(spark, bucketed_table):
    M.compact_table(spark, bucketed_table, target_file_bytes=1 << 30)
    snap = M.snapshot(bucketed_table)
    probe = _fp(123)
    kept = snap.prune([("k", "=", probe)])
    # rewritten files carry fresh pt records: still one bucket of 16
    assert 0 < len(kept) <= max(1, len(snap.files) // 4), (
        len(kept), len(snap.files))
    got = snap.read(spark, filters=[("k", "=", probe)]).collect()
    assert len(got) == 1 and got[0]["k"] == probe
    assert snap.read(spark).count() == 1200
