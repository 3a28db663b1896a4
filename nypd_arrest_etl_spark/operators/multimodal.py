"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata, processed with Arrow-batched Pandas UDFs.

The decode libraries (PIL/torchaudio/ffmpeg) are NOT in this image, so
the decode kernels are stubbed: ``fake=True`` (default) derives
deterministic metadata/features from the bytes themselves;
``fake=False`` raises NotImplementedError at the point a real decoder
would run. Everything Spark-side — schema, partitioning, mapInPandas
batch iteration, UDF signatures — is real and tested, so swapping in a
real decoder is a one-function change.

Scale notes: payloads stay in executor memory one Arrow batch at a
time (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
bytes); feature extraction is embarrassingly parallel; nothing
shuffles until an explicit aggregation.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

DECODED_SCHEMA = (
    "media_id long, media_type string, n_bytes long, sha256 string, "
    "width int, height int, duration_ms long"
)

FEATURE_DIM = 16
FEATURE_SCHEMA = f"media_id long, features array<float>"


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads —
    lets the multimodal plumbing run on the driver's test tables."""
    from nypd_arrest_etl_spark.functions import spread

    return spread(docs).select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("image").alias("media_type"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image/video decoder: dimensions
    derived from payload size (stable across runs and engines)."""
    n = len(payload)
    return (n % 640 + 1, (n // 640) % 480 + 1, n * 10)


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode: bytes -> typed metadata. One Arrow batch in,
    one out; payload column is dropped on output so downstream stages
    don't carry the heavy bytes."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not in this image"
                )
            payloads = pdf["payload"]
            dims = payloads.map(lambda b: _fake_decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len),
                    "sha256": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                    "duration_ms": dims.map(lambda d: d[2]),
                }
            )

    return df.mapInPandas(op, schema=DECODED_SCHEMA)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Pandas-UDF feature extractor: bytes -> fixed-dim float vector.
    Fake mode: normalized 16-bin byte histogram (deterministic); real
    mode would call an encoder model here."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                raise NotImplementedError("real feature extraction needs a model runtime")
            feats = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype("float32")
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """'Video' frame sampling: split the payload into n_frames even
    byte-chunks (stand-in for ffmpeg keyframe extraction). Emits one
    row per frame — a controlled fan-out, shuffle-free."""
    frame_idx = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_frames - 1)),
            lambda i: F.substring(
                F.col("payload"),
                (i * (F.octet_length("payload") / n_frames)).cast("int") + 1,
                1024,
            ),
        )
    )
    return df.select("media_id", frame_idx.alias("frame_idx", "frame_bytes"))


RESIZED_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_media(
    df: DataFrame, width: int = 64, height: int = 64, fake: bool = True
) -> DataFrame:
    """mapInPandas resize: bytes -> fixed-target bytes. The Spark-side
    plumbing (Arrow batch shape, binary column in AND out, schema) is
    the real contract; the kernel is a deterministic stride resample
    of the raw bytes standing in for PIL ``Image.resize`` (not in
    this image). Narrow and shuffle-free: resizing a 100 TB media
    corpus is a pure map stage whose parallelism equals input splits,
    with the payload column rewritten in place so downstream stages
    carry the small fixed-size version."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        target = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real resize requires PIL — not in this image")
            out = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if len(arr) == 0:
                    arr = np.zeros(1, dtype=np.uint8)
                idx = (np.arange(target) * len(arr) // target) % len(arr)
                out.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": out,
                }
            )

    return df.mapInPandas(op, schema=RESIZED_SCHEMA)


def read_media_dir(
    spark, path: str, glob: str = "*", media_type: str = "image"
) -> DataFrame:
    """Ingest raw media files through Spark's ``binaryFile`` source —
    the production entry for image/audio/video corpora: each file
    becomes one row (path, modificationTime, length, content) with
    the bytes read ONCE, split-parallel, no driver involvement.
    ``pathGlobFilter`` prunes non-media files at listing time.

    The output is MEDIA_SCHEMA-shaped so every downstream kernel
    (decode_media / extract_features / sample_frames / resize_media)
    composes unchanged; media_id is the path hash (stable across
    re-ingests of the same layout), original path kept in meta."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.col("content").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.create_map(
            F.lit("path"), F.col("path"),
            F.lit("bytes"), F.col("length").cast("string"),
        ).alias("meta"),
    )
