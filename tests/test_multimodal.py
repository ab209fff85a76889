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


def test_sniff_media_headers():
    import io
    import wave

    from mlb_data_pipeline_spark.operators.multimodal import (
        make_gif, make_jpeg, make_png, make_wav, sniff_media,
    )

    png = sniff_media(make_png(640, 480))
    assert (png["content_type"], png["width"], png["height"]) == ("image/png", 640, 480)
    jpg = sniff_media(make_jpeg(1920, 1080))
    assert (jpg["content_type"], jpg["width"], jpg["height"]) == ("image/jpeg", 1920, 1080)
    gif = sniff_media(make_gif(320, 200))
    assert (gif["content_type"], gif["width"], gif["height"]) == ("image/gif", 320, 200)
    wav = sniff_media(make_wav(16000, 2, 8000))
    assert (wav["content_type"], wav["sample_rate"], wav["channels"], wav["duration_ms"]) == (
        "audio/wav", 16000, 2, 500,
    )
    # agreement with the stdlib writer, not just our own synthesizer
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1); w.setsampwidth(2); w.setframerate(8000); w.writeframes(bytes(8000 * 2)); w.close()
    std = sniff_media(buf.getvalue())
    assert (std["sample_rate"], std["channels"], std["duration_ms"]) == (8000, 1, 1000)
    # malformed payloads are data, not errors
    assert sniff_media(b"")["content_type"] is None
    assert sniff_media(None)["content_type"] is None
    assert sniff_media(b"\xff\xd8truncated")["content_type"] == "image/jpeg"
    assert sniff_media(_png_truncated())["content_type"] is None


def _png_truncated():
    from mlb_data_pipeline_spark.operators.multimodal import make_png

    return make_png(10, 10)[:12]


def test_parse_media_meta_distributed(spark):
    from mlb_data_pipeline_spark.operators.multimodal import (
        make_png, make_wav, parse_media_meta,
    )

    rows = [("a", make_png(5, 7)), ("b", make_wav(12000, 1, 600)), ("c", b"garbage")]
    df = spark.createDataFrame(rows, "media_id STRING, payload BINARY")
    got = {r.media_id: r.media_meta for r in parse_media_meta(df).collect()}
    assert got["a"].width == 5 and got["a"].height == 7
    assert got["b"].sample_rate == 12000 and got["b"].duration_ms == 50
    assert got["c"].content_type is None
