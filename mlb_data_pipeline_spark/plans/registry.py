"""Query registry — the correctness contract surface.

Every implemented operator from SURVEY.md §2 is exposed as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are SQL-expressible) an equivalent DuckDB oracle SQL string run
against the same parquet tables. The driver hashes both sides
(order-insensitive, column-name-sorted), so:

* every computed column is aliased identically in Spark and SQL;
* double aggregation follows the decimal-domain contract in
  ``functions.numeric`` so values are bit-identical across engines;
* no current-time functions, no approx functions in oracled queries.

Queries without an oracle (LSH internals with engine-specific hashing,
streaming state, pandas-UDF enrichment) are registered with
``oracle=None`` and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None
    covers: str  # SURVEY §2 operator ids, e.g. "J1,A2"
    bench: bool  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def query(name: str, *, oracle: str | None = None, covers: str = "", bench: bool = False):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, covers=covers, bench=bench)
        return fn

    return deco
