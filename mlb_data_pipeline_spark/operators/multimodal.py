"""Multimodal columns: binary payloads + typed metadata (north star).

Images/audio/video ride through the engine as opaque ``binary`` columns
with a typed metadata struct — the reference's mp3 artifacts
(pipeline.py:317-345, content-type + derived path) generalized. The
Spark-side plumbing (schema, Arrow batching, partition-sized work
units) is real and tested; the actual codec step is STUBBED — the
image/audio libraries are not in this container, so ``decode_real``
raises ``NotImplementedError`` and tests exercise the deterministic
fake decoder through the identical mapInPandas path.

100 TB notes: binary payloads stay columnar in Parquet; decode is a
narrow mapInPandas (no shuffle) whose memory is bounded by
``maxRecordsPerBatch`` x payload size — tune that, not partitions.
Feature vectors come out as ``array<float>`` and feed the vector layer.
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
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("content_type", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def decode_real(payload: bytes, content_type: str):
    """Real codec step, gated on the optional libraries. Images decode
    via Pillow when installed (tests/test_real_models.py exercises this
    through the same ``extract_features`` plumbing as the fake);
    audio/video would gate on librosa/av the same way. Raises
    ``NotImplementedError`` when the codec library is absent — never a
    silent fallback to the fake, which would poison a production index."""
    if content_type and content_type.startswith("image/"):
        try:
            from PIL import Image  # type: ignore
        except ImportError as exc:
            raise NotImplementedError(
                "Pillow is not available in this environment; install it to "
                "decode image payloads (docs/DEPLOY.md)"
            ) from exc
        import io

        return Image.open(io.BytesIO(payload)).convert("RGB")
    raise NotImplementedError(
        f"no codec wired for content_type={content_type!r}; "
        "image/* needs Pillow, audio/video need librosa/av (docs/DEPLOY.md)"
    )


def real_features(payload: bytes, content_type: str | None, dim: int = FEATURE_DIM) -> list[float]:
    """Decode + feature-extract with the real codec: per-channel mean and
    std (6 values, scaled to [0,1]) plus log-dimensions, zero-padded to
    ``dim``. Deterministic for a given payload — same contract as
    ``fake_features``, real pixels."""
    import math

    img = decode_real(payload, content_type or "")
    px = list(img.getdata())  # [(r, g, b), ...]
    n = len(px) or 1
    means = [sum(p[c] for p in px) / n for c in range(3)]
    stds = [math.sqrt(sum((p[c] - means[c]) ** 2 for p in px) / n) for c in range(3)]
    feats = [m / 255.0 for m in means] + [s / 255.0 for s in stds]
    feats += [math.log1p(img.width), math.log1p(img.height)]
    return (feats + [0.0] * dim)[:dim]


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for decode+feature-extract: sha256 of the
    payload expanded to ``dim`` floats in [-1, 1). Exercises the full
    Spark path (Arrow transfer of binary in, array<float> out)."""
    out = []
    for i in range(dim):
        h = hashlib.sha256(bytes([i % 256]) + (payload or b"")).digest()
        out.append(int.from_bytes(h[:8], "big") / 2**63 - 1.0)
    return out


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "features",
    features_fn=None,
) -> DataFrame:
    """Decode/feature-extract over mapInPandas. Batch shape: pandas
    DataFrames of (media_id, payload bytes, meta) — exactly what a real
    decoder consumes. ``features_fn(payload, content_type) ->
    list[float]`` plugs the decoder: default is the deterministic fake;
    pass ``real_features`` for the Pillow-gated real path (identical
    plan either way — only the worker-side kernel differs)."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {out_col} array<float>"
    fn_features = features_fn or (lambda payload, content_type: fake_features(payload))
    has_meta = "meta" in df.columns

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            ctypes = (
                [m.get("content_type") if isinstance(m, dict) else None for m in pdf["meta"]]
                if has_meta
                else [None] * len(pdf)
            )
            pdf[out_col] = [fn_features(p, ct) for p, ct in zip(pdf[payload_col], ctypes)]
            yield pdf

    return df.mapInPandas(fn, out_schema)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: metadata updates JVM-side; payload transform
    would run where ``extract_features`` runs. The fake keeps the
    payload and rewrites the declared dimensions."""
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.content_type").alias("content_type"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def frame_sample_plan(df: DataFrame, every_ms: int) -> DataFrame:
    """Frame sampling *plan*: explode declared duration into frame
    timestamps JVM-side (sequence/explode); actual frame decode joins in
    through ``extract_features``'s path. One row per sampled frame."""
    return (
        df.filter(F.col("meta.duration_ms").isNotNull())
        .withColumn("frame_ms", F.explode(F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))))
        .select("media_id", "frame_ms", "payload", "meta")
    )
