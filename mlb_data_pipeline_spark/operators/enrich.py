"""Enrichment / UDF surface (SURVEY §2.9 U1, U3, U4, U6).

The reference's enrichment operators are external calls: per-URL
scraping (pipeline.py:24-38), LLM completions (pipeline.py:127-140,
specialized_agents.py throughout), TTS (pipeline.py:287-325). The
engine quarantines all of that behind ``mapInPandas`` operators with a
pluggable client interface and a DETERMINISTIC mock — external services
never appear in the correctness tier (SURVEY §4.2).

U1 note: row-at-a-time Python UDFs are the slow path; they exist here
only as the interface parity for I/O-bound per-row calls and are never
used in any registered query plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# --------------------------------------------------------------------- U1

normalize_url_udf = F.udf(
    lambda u: None if u is None else u.strip().lower().rstrip("/").removeprefix("https://").removeprefix("http://"),
    StringType(),
)
"""Scalar Python UDF (U1) — URL normalization, the reference's id-key
hygiene (id=URL, pipeline.py:69). Interface demo only: in query plans
the same logic is expressed with built-ins (lower/trim/regexp_replace)."""


# --------------------------------------------------------------------- U3


def demean_per_group(df: DataFrame, group_cols: list[str], value_col: str, out_col: str) -> DataFrame:
    """Grouped-map pandas UDF (U3): per-group arithmetic in Arrow
    batches — the reference's per-group parse/structuring dispatch shape
    (orchestrator.py:337-396). Subtraction of the group min is exact in
    IEEE doubles, so results are engine-comparable bit-for-bit."""
    schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols]
        + [f"{value_col} double", f"{out_col} double"]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[group_cols + [value_col]].copy()
        out[out_col] = out[value_col] - out[value_col].min()
        return out

    return df.select(*group_cols, F.col(value_col).cast("double").alias(value_col)).groupBy(
        *group_cols
    ).applyInPandas(fn, schema)


# --------------------------------------------------------------------- U4


def rms_udaf():
    """Grouped-agg pandas UDF (U4): root-mean-square. Sums are computed
    on sorted values so the fold order is deterministic run-to-run."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def rms(v: pd.Series) -> float:
        arr = np.sort(v.to_numpy(dtype="float64"))
        return float(np.sqrt(np.sum(arr * arr) / len(arr))) if len(arr) else float("nan")

    return rms


def compression_ratio_udf():
    """Vectorized compression-ratio quality signal (U2 family): zlib
    deflate size / raw utf-8 size per document — the cheap
    model-free redundancy detector the big corpus recipes pair with
    the repeated-ngram rule (boilerplate and generated spam compress
    far below prose; high-entropy noise compresses above it). Python
    is unavoidable (no JVM-side zlib expression), so it runs as an
    Arrow-batched pandas UDF — one zlib call per row inside a batch,
    never a row-at-a-time Python UDF. Deterministic (zlib level
    pinned), hence safe anywhere in a plan; not DuckDB-oracle-able
    (no SQL zlib), so its queries stay rows-only by design.
    Empty/null docs -> 1.0 (nothing to compress)."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ratio(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None or t == "":
                return 1.0
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(one)

    return ratio


# --------------------------------------------------------------------- U6


class MockLLMClient:
    """Deterministic fake completion client: echoes a digest of the
    prompt. Same prompt -> same completion, hermetic tests."""

    def complete(self, prompts: list[str]) -> list[str]:
        return [f"[mock:{hashlib.sha256(p.encode()).hexdigest()[:12]}] {p[:48]}" for p in prompts]


def llm_enrich(
    df: DataFrame,
    prompt_col: str,
    out_col: str = "completion",
    client_factory: Callable[[], object] = MockLLMClient,
    batch_size: int = 32,
) -> DataFrame:
    """U6: LLM-call operator via mapInPandas — batched, client built
    once per partition stream (rate limiting/retry/caching belong in the
    client). Reference: rag_pipeline generation step (pipeline.py:127-140).
    Never part of the correctness tier."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {out_col} string"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        for pdf in batches:
            prompts = pdf[prompt_col].fillna("").tolist()
            outs: list[str] = []
            for i in range(0, len(prompts), batch_size):
                outs.extend(client.complete(prompts[i : i + batch_size]))
            pdf = pdf.copy()
            pdf[out_col] = outs
            yield pdf

    return df.mapInPandas(fn, out_schema)


def word_counts_udtf():
    """U5 as a REAL Python UDTF (Spark 3.5+ ``@udtf``): one row of text
    -> one row per distinct word with its count, usable in SQL via
    ``LATERAL word_counts(text)``. The parse->array->explode composition
    elsewhere in the engine is still the preferred (JVM-side) shape;
    this is the Python table function surface for parsers that cannot
    be expressed as Catalyst array ops. Deterministic output order
    (sorted words) so results are engine-comparable."""
    from collections import Counter

    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, n: int")
    class WordCounts:
        def eval(self, text: str):
            for w, n in sorted(Counter((text or "").split()).items()):
                yield w, n

    return WordCounts
