"""Catalog: named access to the engine's tables.

The driver testdata (TESTDATA.md) is a TPC-H-ish star schema plus
``events`` (stream), ``documents`` (text corpus) and ``embeddings``
(vector table), one parquet file per table under a scale-factor dir.

``load_tables`` returns plain DataFrames; ``register_views`` additionally
registers them as temp views so the SQL surface works. Reads use the
parquet footer schema (no inference cost); filters/projections push down
to the scan (Parquet row-group stats + column projection).

Loaded tables are cached per (application, sf_dir, table): a DataFrame is
an immutable analyzed plan over an immutable testdata path, so re-loading
re-pays file listing + footer analysis for nothing — a catalog's whole job
is to hand out resolved relations (same role as the oracle's DuckDB
views). The cache is keyed by applicationId so a restarted session never
sees another session's plans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Resolve ``name`` to a DataFrame over ``sf_dir``'s parquet.

    SESSION SIDE EFFECT: on a cache-miss load this pins
    ``spark.sql.session.timeZone`` to UTC — the engine's determinism
    contract (and the DuckDB oracle's naive-timestamp semantics) assume
    it, and a vanilla driver session carries the host zone. A caller who
    deliberately pinned a different zone gets it overridden; a warning
    is emitted so the override is never silent (cache hits skip the pin,
    so without the warning behavior would depend on load order).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    tz = spark.conf.get("spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC"):
        if tz:  # never silent: a deliberate caller pin is being clobbered
            import warnings

            warnings.warn(
                f"load_table is overriding session timeZone {tz!r} -> UTC "
                "(engine determinism contract); results are UTC-normalized",
                stacklevel=2,
            )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # The driver may hand us a vanilla session; this conf is
        # runtime-settable and required to read TIMESTAMP(NANOS) parquet.
        # Set only when missing so repeated loads don't churn session state.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long (nanosAsLong); values are exact
        # microseconds, so integer-divide — no precision loss.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Parquet written with isAdjustedToUTC=false reads as TIMESTAMP_NTZ;
    # the engine (and every oracle) is built on session-TZ TIMESTAMP with
    # the session pinned to UTC, where the two are value-identical but
    # NTZ breaks instant-typed functions (unix_micros etc.). Normalize at
    # the catalog boundary — a zero-cost projection, wall-clock values
    # unchanged.
    ntz_cols = [fld for fld, dtype in df.dtypes if dtype == "timestamp_ntz"]
    if ntz_cols:
        from pyspark.sql import functions as F

        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
