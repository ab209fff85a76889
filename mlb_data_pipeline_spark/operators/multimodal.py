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


# ---------------------------------------------------------------------------
# Container-header parsing (round 7): REAL metadata decode, no codec
# library needed. PNG/JPEG/GIF/WAV headers are pure struct layout —
# parsing them needs stdlib only, so this path is NOT stubbed: it reads
# actual bytes and is what a 100 TB media-ingest runs to type/size-gate
# payloads BEFORE shipping them to GPU decode workers.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_SOF_MARKERS = set(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}  # JPEG frame headers


def sniff_media(payload: bytes | None) -> dict:
    """Parse container headers from raw bytes → typed metadata dict
    (content_type, width, height, sample_rate, channels,
    bits_per_sample, duration_ms; absent fields None). Unknown or
    truncated payloads return content_type=None rather than raising —
    at corpus scale malformed media is data, not an error."""
    none = {
        "content_type": None, "width": None, "height": None,
        "sample_rate": None, "channels": None, "bits_per_sample": None,
        "duration_ms": None,
    }
    if not payload:
        return none
    b = bytes(payload)
    try:
        if b.startswith(_PNG_SIG) and len(b) >= 24 and b[12:16] == b"IHDR":
            return {**none, "content_type": "image/png",
                    "width": int.from_bytes(b[16:20], "big"),
                    "height": int.from_bytes(b[20:24], "big")}
        if b.startswith(b"GIF87a") or b.startswith(b"GIF89a"):
            return {**none, "content_type": "image/gif",
                    "width": int.from_bytes(b[6:8], "little"),
                    "height": int.from_bytes(b[8:10], "little")}
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(b) and b[i] == 0xFF:
                marker, seglen = b[i + 1], int.from_bytes(b[i + 2 : i + 4], "big")
                if marker in _SOF_MARKERS and i + 9 <= len(b):
                    return {**none, "content_type": "image/jpeg",
                            "height": int.from_bytes(b[i + 5 : i + 7], "big"),
                            "width": int.from_bytes(b[i + 7 : i + 9], "big")}
                i += 2 + seglen
            return {**none, "content_type": "image/jpeg"}
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i, meta, data_size = 12, {}, None
            while i + 8 <= len(b):
                cid, csz = b[i : i + 4], int.from_bytes(b[i + 4 : i + 8], "little")
                if cid == b"fmt " and i + 24 <= len(b):
                    meta["channels"] = int.from_bytes(b[i + 10 : i + 12], "little")
                    meta["sample_rate"] = int.from_bytes(b[i + 12 : i + 16], "little")
                    meta["byte_rate"] = int.from_bytes(b[i + 16 : i + 20], "little")
                    meta["bits_per_sample"] = int.from_bytes(b[i + 22 : i + 24], "little")
                elif cid == b"data":
                    data_size = csz
                i += 8 + csz + (csz % 2)  # chunks are word-aligned
            if "sample_rate" in meta:
                dur = (
                    data_size * 1000 // meta["byte_rate"]
                    if data_size is not None and meta.get("byte_rate")
                    else None
                )
                return {**none, "content_type": "audio/wav",
                        "sample_rate": meta["sample_rate"],
                        "channels": meta["channels"],
                        "bits_per_sample": meta["bits_per_sample"],
                        "duration_ms": dur}
    except (IndexError, ValueError):
        pass
    return none


MEDIA_META_SCHEMA = (
    "content_type string, width int, height int, sample_rate int, "
    "channels int, bits_per_sample int, duration_ms bigint"
)


def parse_media_meta(df: DataFrame, payload_col: str = "payload", out_col: str = "media_meta") -> DataFrame:
    """Header-parse a binary column into a typed metadata struct — Arrow
    batches in, one narrow mapInPandas, no shuffle. The real-decode
    sibling of ``extract_features``' fake path."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {out_col} struct<{MEDIA_META_SCHEMA}>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [sniff_media(p) for p in pdf[payload_col]]
            yield pdf

    return df.mapInPandas(fn, out_schema)


# Synthesizers — minimal VALID containers, used by tests and by the
# oracled generate->parse round-trip query (plans/io_queries.py r14).
def make_png(width: int, height: int) -> bytes:
    ihdr = width.to_bytes(4, "big") + height.to_bytes(4, "big") + b"\x08\x02\x00\x00\x00"
    return _PNG_SIG + len(ihdr).to_bytes(4, "big") + b"IHDR" + ihdr + b"\x00\x00\x00\x00"


def make_gif(width: int, height: int) -> bytes:
    return b"GIF89a" + width.to_bytes(2, "little") + height.to_bytes(2, "little") + b"\x00\x00\x00;"


def make_jpeg(width: int, height: int) -> bytes:
    sof = b"\xff\xc0" + (8 + 3).to_bytes(2, "big") + b"\x08" + height.to_bytes(2, "big") + width.to_bytes(2, "big") + b"\x01\x11\x00"
    return b"\xff\xd8" + sof + b"\xff\xd9"


def make_wav(sample_rate: int, channels: int, n_frames: int, bits: int = 16) -> bytes:
    block = channels * bits // 8
    fmt = (
        (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little") + (sample_rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    data = bytes(n_frames * block)
    return (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )


def synth_media_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic media fixture: one REAL container per row, keyed off
    the id (PNG/JPEG/GIF/WAV cycling on id % 4, dimensions/rates derived
    from the id). Used by the oracled round-trip query — the oracle
    recomputes the derivation in SQL, so a parse bug on actual bytes
    shows up as a hash mismatch."""
    out_schema = f"{id_col} bigint, payload binary"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                m = i % 4
                if m == 0:
                    payloads.append(make_png(i % 640 + 1, i % 480 + 1))
                elif m == 1:
                    payloads.append(make_jpeg(i % 1920 + 1, i % 1080 + 1))
                elif m == 2:
                    payloads.append(make_gif(i % 320 + 1, i % 200 + 1))
                else:
                    payloads.append(
                        make_wav(8000 + (i % 8) * 1000, 1 + i % 2, 1000 + i % 500)
                    )
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(fn, out_schema)
