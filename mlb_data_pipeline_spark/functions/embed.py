"""V1 — batch text embedding as a vectorized pandas UDF (U2).

Reference: SentenceTransformer batch encode (pipeline.py:66-68), model
name from env (setup.sh:24), reloaded on every call — three separate
constructions per run (pipeline.py:66, :104, :157). The Spark-first
form is an ``Iterator[pd.Series]`` pandas UDF: the model loads ONCE per
executor python worker and is reused across Arrow batches; vectors
come back as an ``array<float>`` column.

The default encoder is a deterministic fake (sha256-seeded unit
vector) so every pipeline test is hermetic; a real sentence-transformer
drops in behind the same interface (gated import — the model lib is
not in this environment).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

DIM = 64


def fake_encode(text: str, dim: int = DIM) -> list[float]:
    """Deterministic hash-seeded embedding (SURVEY §5.2.6): sha256
    expands the text into dim pseudo-uniform values in [-1, 1), then
    L2-normalizes. Same text -> same vector, any process, any engine."""
    vals = []
    for i in range(dim):
        h = hashlib.sha256(f"{i}|{text}".encode()).digest()
        u = int.from_bytes(h[:8], "big")
        vals.append(u / 2**63 - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def _load_encoder(model_name: str | None) -> Callable[[list[str]], list[list[float]]]:
    """Executor-side encoder factory. None -> deterministic fake; a
    model name -> sentence-transformers if installed (never in tests)."""
    if model_name is None:
        return lambda texts: [fake_encode(t) for t in texts]
    try:
        from sentence_transformers import SentenceTransformer  # type: ignore

        model = SentenceTransformer(model_name)
        return lambda texts: model.encode(texts).tolist()
    except ImportError as exc:  # pragma: no cover - model lib absent here
        raise NotImplementedError(
            "sentence-transformers not available in this environment; "
            "use the deterministic fake (model_name=None)"
        ) from exc


def make_embed_udf(model_name: str | None = None):
    """Iterator pandas UDF: per-worker encoder singleton, Arrow batches.

    The iterator form is the whole point — ``_load_encoder`` runs once
    per worker process per task stream, not once per row or batch
    (the reference reloads its model per call, pipeline.py:66/104/157).
    """

    @F.pandas_udf(ArrayType(FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        encoder = _load_encoder(model_name)
        for batch in batches:
            yield pd.Series(encoder(batch.fillna("").tolist()))

    return embed


def embed_column(df, text_col: str, out_col: str = "embedding", model_name: str | None = None):
    """V1 operator: add an embedding column. Narrow (no shuffle)."""
    return df.withColumn(out_col, make_embed_udf(model_name)(F.col(text_col)))
