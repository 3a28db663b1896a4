"""End-to-end incremental corpus curation: manifest-table version
stream -> fingerprint dedup -> serializable merge into a curated
manifest table. The full 100 TB curation loop at test scale."""

from pyspark.sql import functions as F

from nypd_arrest_etl_spark.sinks import manifest as M

import pytest

# Long-running suite (streaming drains / live servers / storage-format
# e2e / property fuzz / soak): excluded from the default gate run by
# pytest.ini's `-m "not slow"`; run with -m "" or SPARK_GRAFT_FULL_TESTS=1.
pytestmark = pytest.mark.slow



def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _curated_texts(spark, path):
    snap = M.snapshot(path)
    return sorted(
        r["text"] for r in snap.read(spark).select("text").collect()
    )


def test_incremental_curation_end_to_end(spark, tmp_path):
    from nypd_arrest_etl_spark.streaming.curation import curate_incremental

    raw = str(tmp_path / "raw")
    curated = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: docs 3 and 4 duplicate doc 1's content (modulo case/ws)
    M.append(
        spark,
        _docs(
            spark,
            [
                (1, "alpha beta gamma"),
                (2, "delta epsilon zeta"),
                (3, "Alpha  Beta gamma"),
                (4, "alpha beta gamma"),
            ],
        ),
        raw,
    )
    q = curate_incremental(spark, raw, curated, ckpt)
    q.awaitTermination(120)
    assert _curated_texts(spark, curated) == [
        "alpha beta gamma",
        "delta epsilon zeta",
    ]

    # batch 2: doc 5 repeats doc 2's content ACROSS batches; doc 6 new.
    # The version stream must emit only the new files, and the
    # fingerprint merge must drop the cross-batch duplicate.
    M.append(
        spark,
        _docs(spark, [(5, "delta epsilon zeta"), (6, "eta theta iota")]),
        raw,
    )
    q = curate_incremental(spark, raw, curated, ckpt)
    q.awaitTermination(120)
    assert _curated_texts(spark, curated) == [
        "alpha beta gamma",
        "delta epsilon zeta",
        "eta theta iota",
    ]
    v_after_two = M.snapshot(curated).version

    # replay with no new raw versions: empty batch, no new curated
    # version (the merge is a no-op, not a rewrite)
    q = curate_incremental(spark, raw, curated, ckpt)
    q.awaitTermination(120)
    assert M.snapshot(curated).version == v_after_two
    assert _curated_texts(spark, curated) == [
        "alpha beta gamma",
        "delta epsilon zeta",
        "eta theta iota",
    ]


def test_incremental_curation_quality_gate(spark, tmp_path):
    from nypd_arrest_etl_spark.streaming.curation import curate_incremental

    raw = str(tmp_path / "raw")
    curated = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    M.append(
        spark,
        _docs(spark, [(1, "one two three four"), (2, "x")]),
        raw,
    )
    q = curate_incremental(
        spark,
        raw,
        curated,
        ckpt,
        keep_if=F.size(F.split("text", r"\s+")) >= 3,
    )
    q.awaitTermination(120)
    # the short doc is rejected batch-side and never reaches the table
    assert _curated_texts(spark, curated) == ["one two three four"]


def _neardup_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_neardup_curation_across_and_within_batches(spark, tmp_path):
    from nypd_arrest_etl_spark.streaming.curation import curate_incremental_neardup

    raw = str(tmp_path / "raw")
    curated = str(tmp_path / "curated")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")  # high bigram overlap
    far = "completely different words about spark manifests and parquet files"

    # batch 1: base + an IN-BATCH near-dup of it + one distinct doc
    M.append(
        spark, _neardup_docs(spark, [(1, base), (2, near), (3, far)]), raw
    )
    run = lambda: curate_incremental_neardup(
        spark, raw, curated, index, ckpt, threshold=0.6
    ).awaitTermination(180)
    run()
    kept = sorted(
        r["doc_id"] for r in M.snapshot(curated).read(spark).collect()
    )
    assert kept == [1, 3]  # 2 lost the in-batch tie to the lower id

    # batch 2: a CROSS-BATCH near-dup of doc 1, an exact dup of doc 3,
    # and one genuinely new doc
    near2 = base.replace("again and again", "again & again &")
    M.append(
        spark,
        _neardup_docs(
            spark,
            [(10, near2), (11, far), (12, "entirely novel content with unique tokens")],
        ),
        raw,
    )
    run()
    kept = sorted(
        r["doc_id"] for r in M.snapshot(curated).read(spark).collect()
    )
    assert kept == [1, 3, 12]
    # replaying the whole history against a FRESH checkpoint must
    # change nothing: both merges are content-keyed no-ops
    v_cur = M.snapshot(curated).version
    v_idx = M.snapshot(index).version
    curate_incremental_neardup(
        spark, raw, curated, index, str(tmp_path / "ckpt2"), threshold=0.6
    ).awaitTermination(180)
    assert M.snapshot(curated).version == v_cur
    assert M.snapshot(index).version == v_idx
    kept2 = sorted(
        r["doc_id"] for r in M.snapshot(curated).read(spark).collect()
    )
    assert kept2 == [1, 3, 12]


def test_neardup_band_collision_alone_never_drops(spark, tmp_path):
    """A band collision with NO real text overlap must be vetoed by the
    Jaccard verify (phantom-index safety path)."""
    from nypd_arrest_etl_spark.operators.dedup import minhash_band_keys
    from nypd_arrest_etl_spark.streaming.curation import curate_incremental_neardup

    raw = str(tmp_path / "raw")
    curated = str(tmp_path / "curated")
    index = str(tmp_path / "index")
    M.append(
        spark,
        _neardup_docs(spark, [(1, "alpha beta gamma delta epsilon zeta")]),
        raw,
    )
    curate_incremental_neardup(
        spark, raw, curated, index, str(tmp_path / "c1")
    ).awaitTermination(180)
    # plant a PHANTOM: index rows for a doc that is not in curated
    phantom = _neardup_docs(spark, [(99, "unrelated text about data engines")])
    from pyspark.sql import functions as F

    rows = (
        minhash_band_keys(phantom)
        .select(
            F.md5(F.concat_ws("|", "band_key", F.lit("phantom-fp"))).alias("key"),
            "band_key",
            F.lit("phantom-fp").alias("fingerprint"),
        )
    )
    M.merge_insert_if_absent_txn(spark, rows, index, key="key")
    # a new doc band-colliding with the phantom must still be inserted
    M.append(
        spark,
        _neardup_docs(spark, [(2, "unrelated text about data engines")]),
        raw,
    )
    curate_incremental_neardup(
        spark, raw, curated, index, str(tmp_path / "c1")
    ).awaitTermination(180)
    kept = sorted(r["doc_id"] for r in M.snapshot(curated).read(spark).collect())
    assert kept == [1, 2]


def test_neardup_recovers_from_crash_between_index_and_curated(spark, tmp_path):
    """Crash after the FIRST batch's index commit, before the curated
    commit: curated table does not exist yet but the index does. The
    replay must not crash and must land the doc."""
    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark.operators.dedup import (
        canonical_fingerprint,
        minhash_band_keys,
    )
    from nypd_arrest_etl_spark.streaming.curation import curate_incremental_neardup

    raw = str(tmp_path / "raw")
    curated = str(tmp_path / "curated")
    index = str(tmp_path / "index")
    doc = (1, "alpha beta gamma delta epsilon zeta eta theta")
    M.append(spark, _neardup_docs(spark, [doc]), raw)
    # simulate the half-committed state: index rows exist, curated none
    d = _neardup_docs(spark, [doc]).withColumn(
        "fingerprint", canonical_fingerprint("text")
    )
    rows = (
        minhash_band_keys(d)
        .join(d.select("doc_id", "fingerprint"), "doc_id")
        .select(
            F.md5(F.concat_ws("|", "band_key", "fingerprint")).alias("key"),
            "band_key",
            "fingerprint",
        )
    )
    M.merge_insert_if_absent_txn(spark, rows, index, key="key")
    assert M.snapshot(curated) is None
    curate_incremental_neardup(
        spark, raw, curated, index, str(tmp_path / "ck")
    ).awaitTermination(180)
    kept = [r["doc_id"] for r in M.snapshot(curated).read(spark).collect()]
    assert kept == [1]
    # the replayed index merge was a no-op (content-keyed)
    assert M.snapshot(index).version == 0


# ---------------------------------------------------------------------------
# Full streaming crawl chain (r10 verdict task 7): robots gate ->
# per-domain quota -> quality -> incremental near-dup curation, each
# link previously green in isolation, composed end to end.
# ---------------------------------------------------------------------------

_CRAWL_SCHEMA = "doc_id long, url string, ts timestamp, text string"
_BASE = "the quick brown fox jumps over the lazy dog again and again today"
_NEAR = _BASE.replace("today", "tonight")  # high bigram overlap
_FAR = "completely different words about spark manifests and parquet files"
_SPAM = "nav\nnav\nnav\nnav"  # dup_line_frac = 0.75 -> quality-dropped


def _crawl_rows(spark, rows):
    return spark.createDataFrame(
        [(i, u, __import__("datetime").datetime.fromisoformat(ts), t)
         for i, u, ts, t in rows],
        _CRAWL_SCHEMA,
    )


def _crawl_rules(spark):
    from nypd_arrest_etl_spark.operators.web import robots_rules

    body = "User-agent: *\nDisallow: /tmp/\nDisallow: /*.pdf$\n"
    robots = spark.createDataFrame([("a.com", body)], ["h", "txt"])
    return robots_rules(robots, "h", "txt", agent="trainbot")


def test_crawl_chain_composes_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark.streaming.curation import crawl_curate_pipeline

    raw = str(tmp_path / "raw")
    work = str(tmp_path / "work")
    rules = _crawl_rules(spark)

    M.append(spark, _crawl_rows(spark, [
        (1, "http://a.com/doc/1", "2020-01-01T00:00:00", _BASE),
        (2, "http://a.com/tmp/2", "2020-01-01T00:00:01", _FAR),       # robots
        (3, "http://a.com/doc/3.pdf", "2020-01-01T00:00:02", _FAR),   # robots *$
        (4, "http://a.com/doc/4", "2020-01-01T00:00:03", _FAR),       # admitted
        (5, "http://a.com/doc/5", "2020-01-01T00:00:04", "quota victim text"),
        (6, "http://a.com/doc/6", "2020-01-02T00:00:00", _NEAR),      # day 2
        (7, "http://b.com/any/7", "2020-01-01T00:00:00", _SPAM),      # quality
    ]), raw)

    run = lambda: crawl_curate_pipeline(
        spark, raw, rules, work, cap=2,
        quality_keep=F.col("dup_line_frac") <= 0.5,
        threshold=0.6,
    )
    out = run()

    # robots dropped 2+3; quota (cap=2/day) admitted 1,4 on day 1 and
    # dropped 5; 6 rode day 2's fresh quota; 7 passed robots+quota.
    admitted = sorted(
        r["doc_id"] for r in M.snapshot(out["admissions"]).read(spark).collect()
    )
    assert admitted == [1, 4, 6, 7]
    # quality dropped 7 (0.75 dup-line fraction); curation then
    # near-dup-dropped 6 against 1 (bigram jaccard past threshold).
    assert sorted(
        r["doc_id"] for r in M.snapshot(out["admitted_docs"]).read(spark).collect()
    ) == [1, 4, 6]
    assert sorted(
        r["doc_id"] for r in M.snapshot(out["curated"]).read(spark).collect()
    ) == [1, 4]

    # Replaying the WHOLE pipeline (same checkpoints) must commit
    # nothing anywhere: admission is checkpoint-skipped, the doc_id
    # merge re-inserts nothing, curation's drain sees no new versions.
    versions = {k: M.snapshot(p).version for k, p in out.items()}
    run()
    assert {k: M.snapshot(p).version for k, p in out.items()} == versions

    # Incremental: one new raw doc flows the whole chain and ONLY the
    # affected tables advance by exactly its commits.
    M.append(spark, _crawl_rows(spark, [
        (9, "http://b.com/ok/9", "2020-01-03T00:00:00",
         "entirely novel content with unique tokens"),
    ]), raw)
    out2 = run()
    assert sorted(
        r["doc_id"] for r in M.snapshot(out2["curated"]).read(spark).collect()
    ) == [1, 4, 9]


def _warc_capture_records(rows, shapes=True):
    """(doc_id, url, ts, text) -> write_warc record dicts, cycling the
    chunked/gzip body shapes like the oracle fixture does."""
    recs = []
    for i, (doc_id, url, ts, text) in enumerate(rows):
        recs.append({
            "url": url,
            "date": ts.replace(" ", "T") + "Z",
            "body": text.encode(),
            "http_headers": [("Content-Type", "text/html"),
                             ("X-Doc", str(doc_id))],
            "gzip_content": shapes and i % 4 in (1, 3),
            "chunked": shapes and i % 4 in (2, 3),
        })
    return recs


def test_crawl_chain_from_warc_is_one_exactly_once_graph(spark, tmp_path):
    """r11 verdict task 2: capture -> curated as ONE streaming graph —
    the WARC file-discovery head (file-name-watermark offsets) feeds
    the same robots -> quota -> quality -> near-dup chain, and
    replaying the WHOLE pipeline commits nothing anywhere."""
    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark.sources.warc import write_warc
    from nypd_arrest_etl_spark.streaming.curation import (
        crawl_curate_pipeline_from_warc,
    )

    cap = tmp_path / "cap"
    cap.mkdir()
    work = str(tmp_path / "work")
    rules = _crawl_rules(spark)

    day1 = [
        (1, "http://a.com/doc/1", "2020-01-01T00:00:00", _BASE),
        (2, "http://a.com/tmp/2", "2020-01-01T00:00:01", _FAR),      # robots
        (3, "http://a.com/doc/3.pdf", "2020-01-01T00:00:02", _FAR),  # robots *$
        (4, "http://a.com/doc/4", "2020-01-01T00:00:03", _FAR),      # admitted
        (5, "http://a.com/doc/5", "2020-01-01T00:00:04", "quota victim text"),
    ]
    day2 = [
        (6, "http://a.com/doc/6", "2020-01-02T00:00:00", _NEAR),
        (7, "http://b.com/any/7", "2020-01-01T00:00:00", _SPAM),
    ]
    write_warc(str(cap / "part-00000.warc.gz"),
               _warc_capture_records(day1))
    write_warc(str(cap / "part-00001.warc.gz"),
               _warc_capture_records(day2))

    run = lambda: crawl_curate_pipeline_from_warc(  # noqa: E731
        spark, str(cap), rules, work, cap=2,
        quality_keep=F.col("dup_line_frac") <= 0.5,
        threshold=0.6,
    )
    out = run()

    # the capture head decoded all four body shapes into the raw table
    raw_rows = {r["doc_id"]: r["text"]
                for r in M.snapshot(out["raw"]).read(spark).collect()}
    assert sorted(raw_rows) == [1, 2, 3, 4, 5, 6, 7]
    assert raw_rows[1] == _BASE and raw_rows[4] == _FAR  # byte-exact
    # same chain semantics as the manifest-headed twin
    assert sorted(
        r["doc_id"] for r in M.snapshot(out["admissions"]).read(spark).collect()
    ) == [1, 4, 6, 7]
    assert sorted(
        r["doc_id"] for r in M.snapshot(out["curated"]).read(spark).collect()
    ) == [1, 4]

    # whole-graph replay: every table's version is untouched — the
    # capture stream is offset-skipped, everything below is idempotent
    versions = {k: M.snapshot(p).version for k, p in out.items()}
    assert run() == out
    assert {k: M.snapshot(p).version for k, p in out.items()} == versions

    # drop NEW capture files: one good doc and one whose declared gzip
    # body is garbage — the body_decoded gate must keep the latter out
    # of the raw table entirely
    write_warc(str(cap / "part-00002.warc.gz"), _warc_capture_records([
        (9, "http://b.com/ok/9", "2020-01-03T00:00:00",
         "entirely novel content with unique tokens"),
    ]))
    bad_block = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Content-Length: 8\r\n\r\nnot gzip"
    )
    (cap / "part-00003.warc").write_bytes(
        b"WARC/1.1\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:bad>\r\n"
        b"WARC-Target-URI: http://b.com/ok/10\r\n"
        b"WARC-Date: 2020-01-03T00:00:01Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: %d\r\n\r\n" % len(bad_block)
        + bad_block + b"\r\n\r\n"
    )
    out2 = run()
    assert sorted(
        r["doc_id"] for r in M.snapshot(out2["raw"]).read(spark).collect()
    ) == [1, 2, 3, 4, 5, 6, 7, 9]  # 10 gated by body_decoded
    assert sorted(
        r["doc_id"] for r in M.snapshot(out2["curated"]).read(spark).collect()
    ) == [1, 4, 9]
