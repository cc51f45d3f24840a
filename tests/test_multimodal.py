"""Multimodal plumbing tests: binary payload + typed meta schema, Arrow
batch shapes through mapInPandas, deterministic fake decode, frame-sample
row explosion, and the real_decode stub contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from atd_data_lake_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_META,
    extract_features,
    fake_decode,
    fake_resize,
    frame_sample_plan,
    real_decode,
    resize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"payload-one", ("image", "png", 64, 64, None, 11)),
        (2, b"payload-two", ("image", "jpeg", 32, 32, None, 11)),
        (3, None, ("audio", "wav", None, None, 5500, 0)),
        (4, b"payload-one", ("image", "png", 64, 64, None, 11)),  # dup payload
    ]
    return spark.createDataFrame(
        rows, f"media_id long, payload binary, meta {MEDIA_META.simpleString()}"
    )


def test_extract_features_shape_and_determinism(media):
    out = extract_features(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert all(len(r["features"]) == FEATURE_DIM for r in rows.values())
    # deterministic: same payload -> same features; null payload -> zeros
    assert rows[1]["features"] == rows[4]["features"]
    assert rows[1]["features"] != rows[2]["features"]
    assert rows[3]["features"] == [0.0] * FEATURE_DIM
    assert rows[1]["n_bytes"] == 11 and rows[3]["n_bytes"] == 0
    # payload column dropped: downstream shuffles carry only vectors
    assert "payload" not in out.columns


def test_fake_decode_matches_spark_path(media):
    local = fake_decode(b"payload-one")
    spark_row = {r["media_id"]: r for r in extract_features(media).collect()}[1]
    assert np.allclose(local, spark_row["features"])


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decode(b"anything")


def test_resize_media_schema_and_meta(media):
    out = resize_media(media, width=16, height=16)
    # schema-preserving: renditions drop into the same lake layout
    assert out.schema == media.schema
    rows = {r["media_id"]: r for r in out.collect()}
    expect_len = (16 * 16) // 64
    assert len(rows[1]["payload"]) == expect_len
    assert rows[1]["meta"]["width"] == 16 and rows[1]["meta"]["height"] == 16
    assert rows[1]["meta"]["n_bytes"] == expect_len
    # untouched meta fields pass through
    assert rows[1]["meta"]["media_type"] == "image"
    assert rows[2]["meta"]["format"] == "jpeg"
    # NULL payload -> empty rendition, deterministic duplicate payloads agree
    assert rows[3]["payload"] == b"" and rows[3]["meta"]["n_bytes"] == 0
    assert rows[1]["payload"] == rows[4]["payload"]
    # matches the local stub byte-for-byte
    assert bytes(rows[1]["payload"]) == fake_resize(b"payload-one", 16, 16)


def test_frame_sample_plan_explosion(media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_ms"])
    # 5500 ms video at 1 fps -> 5 frames; stills -> 1 frame each
    assert sorted(by_id[3]) == [0, 1000, 2000, 3000, 4000]
    assert by_id[1] == [0] and by_id[2] == [0]
