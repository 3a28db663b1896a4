"""Multimodal plumbing: schemas, mapInPandas kernels, frame fan-out.
Decode kernels are deterministic fakes (no PIL/ffmpeg in this image);
the Spark-side shapes are the real product."""

import hashlib

import pytest
from pyspark.sql import functions as F

from nypd_arrest_etl_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
    extract_features,
    sample_frames,
)


def _media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", "web"), (2, "x" * 1000, "book")],
        "doc_id long, text string, source string",
    )
    return documents_as_media(docs)


def test_decode_metadata_matches_payload(spark):
    rows = {r["media_id"]: r for r in decode_media(_media(spark)).collect()}
    assert rows[1]["n_bytes"] == 11
    assert rows[1]["sha256"] == hashlib.sha256(b"hello world").hexdigest()
    assert rows[1]["width"] == 11 % 640 + 1 and rows[1]["duration_ms"] == 110
    assert rows[2]["n_bytes"] == 1000 and rows[2]["height"] == 1 % 480 + 1
    # payload must NOT survive decode (heavy bytes dropped early)
    assert "payload" not in decode_media(_media(spark)).columns


def test_features_are_normalized_histograms(spark):
    feats = {r["media_id"]: r["features"] for r in extract_features(_media(spark)).collect()}
    for v in feats.values():
        assert len(v) == 16
        assert abs(sum(v) - 1.0) < 1e-5
    # 'x'*1000 is a single byte value -> all mass in one bin
    assert max(feats[2]) == pytest.approx(1.0)


def test_real_decoder_is_explicitly_stubbed(spark):
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        decode_media(_media(spark), fake=False).collect()


def test_sample_frames_fan_out(spark):
    frames = sample_frames(_media(spark), n_frames=4)
    got = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert {r["media_id"]: r["n"] for r in got} == {1: 4, 2: 4}
    b = {
        (r["media_id"], r["frame_idx"]): bytes(r["frame_bytes"])
        for r in frames.collect()
    }
    assert b[(1, 0)].startswith(b"hel")  # frame 0 starts at byte 0


def test_resize_media_fixed_output_size_and_determinism(spark):
    from nypd_arrest_etl_spark.operators.multimodal import resize_media

    media = _media(spark)
    out = resize_media(media, width=8, height=8).collect()
    assert all(len(r.payload) == 64 for r in out)
    assert all((r.width, r.height) == (8, 8) for r in out)
    again = {r.media_id: bytes(r.payload) for r in resize_media(media, 8, 8).collect()}
    assert {r.media_id: bytes(r.payload) for r in out} == again


def test_read_media_dir_binary_file_source(spark, tmp_path):
    from nypd_arrest_etl_spark.operators.multimodal import (
        decode_media,
        read_media_dir,
    )

    (tmp_path / "a.img").write_bytes(b"\x89fakepng" * 10)
    (tmp_path / "b.img").write_bytes(b"RIFFfake" * 5)
    (tmp_path / "skip.txt").write_text("not media")
    df = read_media_dir(spark, str(tmp_path), glob="*.img")
    rows = df.collect()
    assert len(rows) == 2  # glob pruned the .txt at listing time
    assert {len(r["payload"]) for r in rows} == {80, 40}
    assert all(r["meta"]["path"].endswith(".img") for r in rows)
    # composes with the decode kernel unchanged
    dec = decode_media(df).collect()
    assert {d["n_bytes"] for d in dec} == {80, 40}
