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


def test_pil_decode_real_path(spark):
    """Real codec path for multimodal decode: requires Pillow. Verifies
    a real decoder drops in where fake_features runs (docs/DEPLOY.md)."""
    Image = pytest.importorskip("PIL.Image")
    import io

    from mlb_data_pipeline_spark.operators.multimodal import MEDIA_SCHEMA

    buf = io.BytesIO()
    Image.new("RGB", (4, 4), color=(200, 10, 10)).save(buf, format="PNG")
    payload = buf.getvalue()
    df = spark.createDataFrame(
        [("m1", payload, ("image/png", 4, 4, None))], MEDIA_SCHEMA
    )
    import pandas as pd

    def decode(batches):
        for pdf in batches:
            sizes = [Image.open(io.BytesIO(p)).size for p in pdf["payload"]]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "w": [s[0] for s in sizes], "h": [s[1] for s in sizes]}
            )

    rows = df.mapInPandas(decode, "media_id string, w int, h int").collect()
    assert rows[0].w == 4 and rows[0].h == 4
