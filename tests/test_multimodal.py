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


def test_decode_real_raises(media):
    with pytest.raises(NotImplementedError):
        decode_image(media, real=True)
    with pytest.raises(NotImplementedError):
        decode_audio(media, real=True)


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
