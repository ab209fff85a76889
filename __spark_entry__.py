"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001. ``queries()`` exposes
every implemented operator from SURVEY.md §2 as a named
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each SQL-expressible query (others get the
driver's weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mlb_data_pipeline_spark.plans import REGISTRY, load_all

load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = REGISTRY["q00_monthly_revenue_by_region"]
    return q.spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in sorted(REGISTRY.items()) if q.oracle is not None}
