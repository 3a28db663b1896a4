"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata, processed with Arrow-batched Pandas UDFs.

Decode kernels, round 4: ``fake=False`` now REALLY decodes every
format parseable with stdlib + numpy — PCM WAV (``wave`` module:
channels/rate/frames -> duration; real sample decode feeds the audio
feature kernel), BMP (header dims + 24-bit pixel array -> real
nearest-neighbor resize), and PNG/GIF/JPEG header dimension parsing.
``NotImplementedError`` remains ONLY for formats that genuinely need
an external runtime (compressed video, JPEG pixel data, model-based
features), raised at the exact seam a PIL/ffmpeg/torch call would
occupy — and since round 9 those seams TRY-IMPORT the library first
(:func:`_optional`): with PIL installed, unknown image formats decode
and resize for real; with soundfile installed, FLAC/OGG decode to
durations and spectral features. Absent (this image), the documented
error stands and the contract tests skip. ``fake=True`` (default) stays the deterministic bytes-derived
stand-in so driver-gate queries over text payloads are stable.

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


# ---------------------------------------------------------------------------
# Real decoders (stdlib + numpy only — no PIL/ffmpeg in this image)
# ---------------------------------------------------------------------------


def _decode_wav(payload: bytes) -> tuple[None, None, int]:
    """PCM WAV via the stdlib ``wave`` module: duration from
    frames/rate; image dims are null for audio."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        frames, rate = w.getnframes(), w.getframerate()
    return None, None, int(frames * 1000 / rate) if rate else 0


def _wav_samples(payload: bytes):
    """Decoded mono float32 samples in [-1, 1] (averages channels)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload)) as w:
        nch, width, frames = w.getnchannels(), w.getsampwidth(), w.getnframes()
        raw = w.readframes(frames)
    # 8-bit PCM WAV is UNSIGNED (0-255, silence at 128) per the RIFF
    # spec; 16/32-bit are signed two's-complement.
    dt = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dt is None:
        raise NotImplementedError(f"{width * 8}-bit WAV needs an audio library")
    arr = np.frombuffer(raw, dtype=dt).astype("float32")
    if width == 1:
        arr -= 128.0
    if nch > 1:
        arr = arr[: len(arr) - len(arr) % nch].reshape(-1, nch).mean(axis=1)
    peak = float(1 << (width * 8 - 1))
    return arr / peak


def _decode_bmp_header(payload: bytes) -> tuple[int, int, None]:
    import struct

    w, h = struct.unpack_from("<ii", payload, 18)
    return w, abs(h), None  # negative height = top-down row order


def _bmp_pixels(payload: bytes):
    """24-bit uncompressed BMP -> (H, W, 3) RGB array. The one image
    format fully decodable without a codec library."""
    import struct

    import numpy as np

    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"{bpp}-bpp/compression={compression} BMP needs PIL")
    top_down, h = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=data_off)
    px = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR->RGB
    return px if top_down else px[::-1]


def _decode_png(payload: bytes) -> tuple[int, int, None]:
    import struct

    w, h = struct.unpack_from(">II", payload, 16)  # IHDR is always first
    return w, h, None


def _decode_gif(payload: bytes) -> tuple[int, int, None]:
    import struct

    w, h = struct.unpack_from("<HH", payload, 6)
    return w, h, None


def _decode_jpeg(payload: bytes) -> tuple[int, int, None]:
    """Walk JPEG marker segments to the SOF frame header for dims —
    pixel decode (huffman+DCT) is where a real codec takes over."""
    import struct

    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):  # SOFn
            h, w = struct.unpack_from(">HH", payload, i + 5)
            return w, h, None
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        i += 2 + struct.unpack_from(">H", payload, i + 2)[0]
    raise ValueError("no SOF marker found")


def _optional(module: str):
    """Try-import seam for optional media libraries (mirrors the TWS
    env-skip pattern): returns the module when the runtime carries it,
    None when it doesn't — callers fall through to the documented
    ``NotImplementedError``. Executor-side: called inside UDF kernels,
    so a library present on the CLUSTER lights the path up even when
    the driver image lacks it."""
    import importlib

    try:
        return importlib.import_module(module)
    except ImportError:
        return None


def _pil_decode_dims(payload: bytes) -> tuple[int, int, None] | None:
    """Image dims via PIL when installed (lazy: header-only, no full
    pixel decode for most formats); None when PIL is absent or the
    payload isn't an image it recognizes."""
    pil_image = _optional("PIL.Image")
    if pil_image is None:
        return None
    import io

    try:
        with pil_image.open(io.BytesIO(payload)) as im:
            return im.width, im.height, None
    except Exception:
        return None  # not an image PIL knows: fall through to audio


def _soundfile_duration(payload: bytes) -> tuple[None, None, int] | None:
    """Audio duration via soundfile (FLAC/OGG/AIFF/...) when
    installed; None when absent or unparseable."""
    sf = _optional("soundfile")
    if sf is None:
        return None
    import io

    try:
        with sf.SoundFile(io.BytesIO(payload)) as f:
            rate = f.samplerate
            return None, None, int(len(f) * 1000 / rate) if rate else 0
    except Exception:
        return None


def _real_decode(payload: bytes) -> tuple[int | None, int | None, int | None]:
    """Dispatch on magic bytes; stdlib kernels first, then the
    optional-library seams (PIL for images, soundfile for audio);
    raise ONLY when no available runtime can decode the payload.
    A known-magic payload the stdlib kernel can't parse (IEEE-float
    WAV, SOF-less JPEG) ALSO falls through to the optional seams —
    the libraries decode strictly more than the stdlib, so magic must
    not pin a payload to the weaker kernel (r9 review find)."""
    stdlib_err: Exception | None = None
    try:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _decode_wav(payload)
        if payload[:2] == b"BM":
            return _decode_bmp_header(payload)
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_png(payload)
        if payload[:4] in (b"GIF8",):
            return _decode_gif(payload)
        if payload[:2] == b"\xff\xd8":
            return _decode_jpeg(payload)
    except Exception as exc:  # known magic, stdlib kernel failed
        stdlib_err = exc
    decoded = _pil_decode_dims(payload) or _soundfile_duration(payload)
    if decoded is not None:
        return decoded
    if stdlib_err is not None:
        raise stdlib_err  # no optional lib could rescue it either
    raise NotImplementedError(
        "payload is not WAV/BMP/PNG/GIF/JPEG — this container decodes "
        "those without external libs; other formats need PIL (images) "
        "or soundfile (audio), neither installed here"
    )


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode: bytes -> typed metadata. One Arrow batch in,
    one out; payload column is dropped on output so downstream stages
    don't carry the heavy bytes."""

    decode = _fake_decode if fake else _real_decode

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = payloads.map(lambda b: decode(bytes(b)))
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


def _soundfile_samples(payload: bytes):
    """Decoded mono float samples via soundfile when installed; None
    when absent or the payload isn't audio it recognizes."""
    sf = _optional("soundfile")
    if sf is None:
        return None
    import io

    try:
        data, _rate = sf.read(io.BytesIO(payload), dtype="float32")
    except Exception:
        return None
    return data.mean(axis=1) if data.ndim > 1 else data


def _audio_features(payload: bytes) -> list[float]:
    """REAL 16-dim audio descriptor from decoded WAV samples: RMS
    level, zero-crossing rate, then 14 log-energy bins of the rFFT
    magnitude spectrum — the classic pre-neural audio fingerprint,
    computed entirely in numpy."""
    return _sample_features(_wav_samples(payload))


def _sample_features(s) -> list[float]:
    import numpy as np

    if len(s) == 0:
        return [0.0] * FEATURE_DIM
    rms = float(np.sqrt(np.mean(s * s)))
    zcr = float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1])))
    spec = np.abs(np.fft.rfft(s))
    bins = np.array_split(spec, FEATURE_DIM - 2)
    energies = [float(np.log1p(b.sum())) for b in bins]
    return [rms, zcr] + energies


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Pandas-UDF feature extractor: bytes -> fixed-dim float vector.
    Fake mode: normalized 16-bin byte histogram (deterministic). Real
    mode decodes PCM WAV payloads and computes RMS/ZCR/spectral-bin
    features in numpy; non-audio payloads are where an encoder MODEL
    would run, so they still raise at that seam."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                b = bytes(b)
                if not fake:
                    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                        try:
                            feats.append(_audio_features(b))
                            continue
                        except Exception:
                            # non-PCM WAV the stdlib can't read: give
                            # soundfile a chance before failing
                            pass
                    samples = _soundfile_samples(b)
                    if samples is not None:
                        # soundfile present: FLAC/OGG/AIFF (and WAV
                        # encodings beyond stdlib PCM) decode to the
                        # same spectral descriptor
                        feats.append(_sample_features(samples))
                        continue
                    raise NotImplementedError(
                        "feature extraction needs stdlib-PCM WAV, "
                        "soundfile (other audio), or a model runtime "
                        "(image embeddings)"
                    )
                arr = np.frombuffer(b, dtype=np.uint8)
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
            out = []
            for b in pdf["payload"]:
                b = bytes(b)
                if not fake:
                    # REAL nearest-neighbor resize of a decoded 24-bit
                    # BMP pixel array; output is raw RGB888 (W*H*3).
                    # Other formats — and BMP variants beyond the
                    # stdlib kernel (8-bpp, RLE) — light up when PIL
                    # is installed (same output contract).
                    bmp_err: Exception | None = None
                    if b[:2] == b"BM":
                        try:
                            px = _bmp_pixels(b)
                            ys = (np.arange(height) * px.shape[0]) // height
                            xs = (np.arange(width) * px.shape[1]) // width
                            out.append(px[ys][:, xs].tobytes())
                            continue
                        except Exception as exc:
                            bmp_err = exc
                    pil_image = _optional("PIL.Image")
                    if pil_image is not None:
                        import io

                        with pil_image.open(io.BytesIO(b)) as im:
                            resized = im.convert("RGB").resize(
                                (width, height), pil_image.NEAREST
                            )
                            out.append(resized.tobytes())
                        continue
                    if bmp_err is not None:
                        raise bmp_err
                    raise NotImplementedError("non-BMP resize requires PIL")
                arr = np.frombuffer(b, dtype=np.uint8)
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
