"""End-to-end incremental corpus curation: manifest-table version
stream -> fingerprint dedup -> serializable merge into a curated
manifest table. The full 100 TB curation loop at test scale."""

from pyspark.sql import functions as F

from nypd_arrest_etl_spark.sinks import manifest as M


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
