"""Integration tests for the env-gated real-model paths (SURVEY §2.9 U2,
§2.5 multimodal). These run ONLY when the optional libraries are
installed (never in this container — they skip cleanly here); on a real
cluster they prove the gated code paths, not just the deterministic
fakes, work through the identical Spark plumbing.

Deploy notes for wiring the real models live in docs/DEPLOY.md.
"""

from __future__ import annotations

import pytest

from mlb_data_pipeline_spark.functions.embed import _load_encoder, embed_column


def test_sentence_transformer_encoder_loads_and_encodes():
    """Real-model path of _load_encoder: requires sentence-transformers
    (reference: pipeline.py:66-68 SentenceTransformer batch encode)."""
    st = pytest.importorskip("sentence_transformers")
    assert st is not None
    encoder = _load_encoder("all-MiniLM-L6-v2")
    vecs = encoder(["hello world", "goodbye world"])
    assert len(vecs) == 2
    assert len(vecs[0]) > 0
    assert vecs[0] != vecs[1]


def test_sentence_transformer_embed_column(spark):
    """Full Spark path with the real model: iterator pandas UDF, one
    model load per worker, array<float> out — same plan as the fake."""
    pytest.importorskip("sentence_transformers")
    df = spark.createDataFrame([("a", "hello"), ("b", "world")], ["id", "text"])
    out = embed_column(df, "text", model_name="all-MiniLM-L6-v2").collect()
    assert len(out) == 2
    dims = {len(r.embedding) for r in out}
    assert len(dims) == 1  # fixed model dimension for every row


def test_encoder_raises_cleanly_when_model_lib_absent():
    """In THIS container the lib is absent: asking for a real model must
    raise NotImplementedError (declared stub), never silently fall back
    to the fake — a silent fallback would poison a production index."""
    try:
        import sentence_transformers  # noqa: F401

        pytest.skip("sentence-transformers installed; absence path not testable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="sentence-transformers"):
        _load_encoder("all-MiniLM-L6-v2")


def _png_payload(Image, w: int = 4, h: int = 4, color=(200, 10, 10)) -> bytes:
    import io

    buf = io.BytesIO()
    Image.new("RGB", (w, h), color=color).save(buf, format="PNG")
    return buf.getvalue()


def test_pil_real_features_through_extract_features(spark):
    """Real codec path (VERDICT r3 #6): a generated PNG decodes through
    ``extract_features``'s mapInPandas plumbing with ``real_features``
    (Pillow-gated) — the SAME operator and plan as the fake path, only
    the worker-side kernel differs."""
    Image = pytest.importorskip("PIL.Image")
    import math

    from mlb_data_pipeline_spark.operators.multimodal import (
        FEATURE_DIM,
        MEDIA_SCHEMA,
        extract_features,
        real_features,
    )

    df = spark.createDataFrame(
        [
            ("m1", _png_payload(Image, color=(200, 10, 10)), ("image/png", 4, 4, None)),
            ("m2", _png_payload(Image, color=(0, 255, 0)), ("image/png", 4, 4, None)),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r.features for r in extract_features(df, features_fn=real_features).collect()}
    assert len(rows["m1"]) == FEATURE_DIM
    # solid-color 4x4: channel means = color/255, stds = 0, log1p dims
    assert abs(rows["m1"][0] - 200 / 255) < 1e-6 and abs(rows["m2"][1] - 1.0) < 1e-6
    assert all(abs(s) < 1e-6 for s in rows["m1"][3:6])
    assert abs(rows["m1"][6] - math.log1p(4)) < 1e-6


def test_decode_real_raises_cleanly_when_pil_absent():
    """In THIS container Pillow is absent: the real decode must raise
    NotImplementedError (declared stub), never silently fall back to
    the fake decoder."""
    from mlb_data_pipeline_spark.operators.multimodal import decode_real

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed; absence path not testable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_real(b"\x89PNG", "image/png")


def test_decode_real_rejects_unwired_content_type():
    from mlb_data_pipeline_spark.operators.multimodal import decode_real

    with pytest.raises(NotImplementedError, match="no codec wired"):
        decode_real(b"", "audio/mpeg")
