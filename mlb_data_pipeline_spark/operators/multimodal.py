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


def decode_real(payload: bytes, content_type: str):  # pragma: no cover - stub
    """Real codec step — requires PIL/librosa/av, absent here."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "wire PIL/librosa behind this function on a real cluster"
    )


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for decode+feature-extract: sha256 of the
    payload expanded to ``dim`` floats in [-1, 1). Exercises the full
    Spark path (Arrow transfer of binary in, array<float> out)."""
    out = []
    for i in range(dim):
        h = hashlib.sha256(bytes([i % 256]) + (payload or b"")).digest()
        out.append(int.from_bytes(h[:8], "big") / 2**63 - 1.0)
    return out


def extract_features(df: DataFrame, payload_col: str = "payload", out_col: str = "features") -> DataFrame:
    """Decode/feature-extract over mapInPandas. Batch shape: pandas
    DataFrames of (media_id, payload bytes, meta) — exactly what a real
    decoder consumes; only the inner function differs."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {out_col} array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [fake_features(p) for p in pdf[payload_col]]
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
