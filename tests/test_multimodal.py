"""Multimodal column plumbing: binary payloads through mapInPandas."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlb_data_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_real,
    extract_features,
    fake_features,
    frame_sample_plan,
    resize_stub,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (f"m{i}", bytes([i % 256]) * (100 + i), ("image/png", 64, 48, None) if i % 2 else ("audio/mp3", None, None, 4000))
        for i in range(20)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).cache()


def test_extract_features_shape_and_determinism(spark, media):
    out = extract_features(media)
    rows = out.collect()
    assert all(len(r.features) == FEATURE_DIM for r in rows)
    by_id = {r.media_id: list(r.features) for r in rows}
    # deterministic: executor path equals driver-side fake on same bytes
    payload = bytes([3 % 256]) * 103
    expect = fake_features(payload)
    got = by_id["m3"]
    assert all(abs(a - b) < 1e-6 for a, b in zip(got, expect))
    # repartitioning does not change results
    again = {r.media_id: list(r.features) for r in extract_features(media.repartition(5)).collect()}
    assert again == by_id


def test_resize_updates_meta_only(spark, media):
    out = resize_stub(media, 32, 32)
    r = out.filter(F.col("media_id") == "m1").first()
    assert (r.meta.width, r.meta.height) == (32, 32)
    assert r.payload == media.filter(F.col("media_id") == "m1").first().payload


def test_frame_sample_counts(spark, media):
    frames = frame_sample_plan(media, every_ms=500)
    # only audio rows (duration 4000ms) sample: ceil(4000/500)=8 frames each
    n_audio = media.filter(F.col("meta.duration_ms").isNotNull()).count()
    assert frames.count() == n_audio * 8
    assert frames.groupBy("media_id").count().agg(F.max("count")).first()[0] == 8


def test_decode_real_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_real(b"", "image/png")
