"""Unit tests for the multimodal operators: Arrow/mapInPandas plumbing,
deterministic fake decode math, 1->N frame expansion, feature content."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from metrics_service_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_payload,
    decode_audio,
    decode_image,
    frame_sample,
    image_features,
    resize_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "a" * 1000),
            (3, "héllo ünïcode"),  # multi-byte UTF-8: byte length != char length
            (4, ""),
        ],
        "doc_id long, text string",
    )
    return attach_payload(docs, id_col="doc_id", text_col="text").cache()


def test_payload_is_binary_with_meta(media):
    schema = dict(media.dtypes)
    assert schema["payload"] == "binary"
    row = media.filter(F.col("media_id") == 3).first()
    assert row.media_meta.n_bytes == len("héllo ünïcode".encode())


def test_decode_image_fake_dims(media):
    rows = {r.media_id: r for r in decode_image(media).collect()}
    n = len("héllo ünïcode".encode())
    assert rows[3].width == 64 + n % 577
    assert rows[3].height == 64 + (n * 7) % 417
    assert rows[3].channels == 3
    assert rows[4].n_bytes == 0


def test_decode_real_seams(media):
    # image real=True decodes PNG/JPEG/GIF (see the tests below); on
    # the text-derived fixture payloads it fails at collect with a
    # clear format error rather than fake numbers
    with pytest.raises(Exception, match="unrecognized image format"):
        decode_image(media, real=True).collect()
    # audio real=True decodes PCM WAV; non-WAV payloads fail at
    # collect rather than returning fake numbers
    with pytest.raises(Exception, match="(?i)riff|wave|file does not"):
        decode_audio(media, real=True).collect()


def test_resize_preserves_aspect_and_bounds(media):
    out = resize_plan(decode_image(media), max_side=100).collect()
    for r in out:
        assert 1 <= r.out_width <= 100 and 1 <= r.out_height <= 100
        # aspect preserved within floor rounding
        if r.width >= r.height:
            assert r.out_width >= r.out_height
        else:
            assert r.out_height >= r.out_width


def test_frame_sample_expansion(media):
    frames = frame_sample(media, stride=4, fps=24, max_frames=24).collect()
    by_id: dict[int, list] = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    n2 = 1000  # doc 2 payload bytes
    expect = list(range(0, 1 + n2 % 24, 4))
    got = sorted(r.frame_idx for r in by_id[2])
    assert got == expect
    # empty payload still yields its single frame 0
    assert [r.frame_idx for r in by_id[4]] == [0]
    for r in frames:
        assert r.frame_ts_ms == r.frame_idx * 1000 // 24


def test_image_features_match_numpy(media):
    feats = {r.media_id: r for r in image_features(media).collect()}
    raw = "hello world".encode()
    arr = np.frombuffer(raw, dtype=np.uint8)
    hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
    expect = hist / hist.sum()
    got = np.array(feats[1].feature)
    assert np.allclose(got, expect, atol=1e-6)
    assert abs(float(got.sum()) - 1.0) < 1e-5
    # empty payload: all-zero vector, no NaN
    assert not np.isnan(np.array(feats[4].feature)).any()


# --- real PNG decode path ---------------------------------------------------
def _encode_png(px, filter_type=0):
    """Minimal PNG encoder for tests: 8-bit RGB/RGBA/gray, one filter
    type for all scanlines (inverse of the decoder's unfilter)."""
    import struct
    import zlib

    import numpy as np

    h, w, c = px.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    stride = w * c
    flat = px.reshape(h, stride).astype(np.int32)
    raw = b""
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        filt = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            left = int(cur[x - c]) if x >= c else 0
            up = int(prev[x])
            ul = int(prev[x - c]) if x >= c else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = left
            elif filter_type == 2:
                pred = up
            elif filter_type == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc_) else (up if pb <= pc_ else ul)
            filt[x] = (cur[x] - pred) % 256
        raw += bytes([filter_type]) + bytes(filt.astype(np.uint8))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def test_png_pixels_roundtrip_all_filters():
    """The unfilter path (None/Sub/Up/Average/Paeth) reproduces pixels
    exactly for every filter type and channel count."""
    import numpy as np

    from metrics_service_spark.operators.multimodal import png_meta, png_pixels

    rng = np.random.RandomState(7)
    for c in (1, 3, 4):
        px = rng.randint(0, 256, size=(5, 4, c)).astype("uint8")
        for ftype in range(5):
            data = _encode_png(px, filter_type=ftype)
            assert png_meta(data) == (4, 5, c)
            assert (png_pixels(data) == px).all(), (c, ftype)


def test_decode_image_real_png_through_spark(spark):
    """mm decode with real=True runs an ACTUAL PNG (the checked-in
    fixture) through the same mapInPandas plan as the fake path."""
    import os

    from metrics_service_spark.operators.multimodal import decode_image

    fixture = os.path.join(os.path.dirname(__file__), "data", "tiny_rgb.png")
    with open(fixture, "rb") as f:
        png = f.read()
    media = spark.createDataFrame(
        [(1, bytearray(png))], "media_id long, payload binary"
    )
    rows = decode_image(media, real=True).collect()
    assert [(r["media_id"], r["width"], r["height"], r["channels"], r["n_bytes"]) for r in rows] == [
        (1, 6, 4, 3, len(png))
    ]


def test_decode_image_real_rejects_non_png(spark):
    from metrics_service_spark.operators.multimodal import decode_image

    media = spark.createDataFrame(
        [(1, bytearray(b"not a png at all, just bytes"))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="unrecognized image format"):
        decode_image(media, real=True).collect()


def test_decode_audio_real_wav_through_spark(spark, tmp_path):
    """mm audio decode with real=True runs an ACTUAL PCM WAV (written
    with the stdlib wave module) through the same mapInPandas plan as
    the fake path."""
    import io
    import wave

    from metrics_service_spark.operators.multimodal import decode_audio

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01" * 2 * 4000)  # 4000 frames = 500 ms
    payload = buf.getvalue()
    media = spark.createDataFrame(
        [(7, bytearray(payload))], "media_id long, payload binary"
    )
    rows = decode_audio(media, real=True).collect()
    assert [
        (r["media_id"], r["sample_rate"], r["duration_ms"], r["n_bytes"])
        for r in rows
    ] == [(7, 8000, 500, len(payload))]


# --- JPEG / GIF header decode + format dispatch -----------------------------
def _minimal_jpeg(w, h, ncomp=3):
    """Hand-built JPEG byte stream: SOI, an APP0 to exercise segment
    skipping, a DQT, then SOF0 with the given dims."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + bytes(65)
    sof_body = struct.pack(">BHHB", 8, h, w, ncomp) + bytes(3 * ncomp)
    sof = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_body)) + sof_body
    return b"\xff\xd8" + app0 + dqt + sof


def _minimal_gif(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def test_jpeg_meta_parses_sof_after_skipped_segments():
    from metrics_service_spark.operators.multimodal import jpeg_meta

    assert jpeg_meta(_minimal_jpeg(640, 480)) == (640, 480, 3)
    assert jpeg_meta(_minimal_jpeg(17, 9, ncomp=1)) == (17, 9, 1)
    # progressive (SOF2) dims parse the same way
    prog = _minimal_jpeg(33, 44).replace(b"\xff\xc0", b"\xff\xc2")
    assert jpeg_meta(prog) == (33, 44, 3)
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg_meta(b"\x89PNG\r\n\x1a\n")
    # DHT (C4) must NOT be mistaken for a SOF; with no SOF before SOS
    # the parser reports the absence
    import struct
    dht = b"\xff\xc4" + struct.pack(">H", 5) + bytes(3)
    sos = b"\xff\xda" + struct.pack(">H", 2)
    with pytest.raises(ValueError, match="no SOF"):
        jpeg_meta(b"\xff\xd8" + dht + sos)


def test_gif_meta_and_dispatch():
    from metrics_service_spark.operators.multimodal import gif_meta, image_meta

    assert gif_meta(_minimal_gif(320, 200)) == (320, 200, 3)
    with pytest.raises(ValueError, match="not a GIF"):
        gif_meta(b"NOTGIF" + bytes(8))
    # dispatch sniffs each signature
    assert image_meta(_minimal_jpeg(5, 6)) == (5, 6, 3)
    assert image_meta(_minimal_gif(7, 8)) == (7, 8, 3)
    import numpy as np
    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
    assert image_meta(_encode_png(px)) == (4, 3, 3)
    with pytest.raises(ValueError, match="unrecognized"):
        image_meta(b"RIFF....WEBP")


def test_synthesize_png_roundtrip_through_spark(spark):
    """encode_png output is a genuine PNG: the full pixel decoder
    reproduces the deterministic pattern, and the Spark pipeline
    (synthesize_png -> decode_image(real=True)) recovers the dims for
    JPEG-free, library-free end-to-end driving of the real seam."""
    import numpy as np

    from metrics_service_spark.operators.multimodal import (
        decode_image,
        encode_png,
        png_pixels,
        synthesize_png,
    )

    data = encode_png(5, 4, seed=9)
    px = png_pixels(data)
    y, x, c = np.ogrid[0:4, 0:5, 0:3]
    assert (px == ((x * 3 + y * 7 + c * 11 + 9) % 256).astype(np.uint8)).all()

    dims = spark.createDataFrame(
        [(1, 3, 2), (2, 13, 7), (3, 1, 1)], "media_id long, w int, h int"
    )
    rows = {
        r["media_id"]: (r["width"], r["height"], r["channels"])
        for r in decode_image(synthesize_png(dims), real=True).collect()
    }
    assert rows == {1: (3, 2, 3), 2: (13, 7, 3), 3: (1, 1, 3)}


def test_encode_jpeg_roundtrip_sof0_and_sof2():
    from metrics_service_spark.operators.multimodal import encode_jpeg, jpeg_meta

    assert jpeg_meta(encode_jpeg(13, 7)) == (13, 7, 3)
    assert jpeg_meta(encode_jpeg(640, 480, progressive=True)) == (640, 480, 3)
    # the stream is a well-formed marker sequence: image_meta sniffs it
    from metrics_service_spark.operators.multimodal import image_meta

    assert image_meta(encode_jpeg(5, 9)) == (5, 9, 3)


def test_encode_gif_roundtrip():
    from metrics_service_spark.operators.multimodal import (
        encode_gif,
        gif_meta,
        image_meta,
    )

    assert gif_meta(encode_gif(21, 4)) == (21, 4, 3)
    assert image_meta(encode_gif(300, 200)) == (300, 200, 3)


def test_synthesize_images_mixed_distributed(spark):
    """All three encoders through the distributed mapInPandas encode ->
    sniff -> decode path."""
    from pyspark.sql import functions as F

    from metrics_service_spark.operators.multimodal import (
        decode_image,
        synthesize_images,
    )

    dims = spark.createDataFrame(
        [(i, 3 + i, 2 + i, ["png", "jpeg", "gif"][i % 3]) for i in range(9)],
        "media_id long, w int, h int, fmt string",
    )
    got = {
        r.media_id: (r.width, r.height, r.channels)
        for r in decode_image(synthesize_images(dims), real=True).collect()
    }
    assert got == {i: (3 + i, 2 + i, 3) for i in range(9)}
