"""S12 — warehouse layering: raw → staging → analytics.

The reference declares this as BigQuery datasets (terraform/main.tf:46-66)
with dbt materializations (dbt/dbt_project.yml:22-27: staging = views,
marts = tables) but ships no model SQL. The Spark-native form: one SQL
database per layer over parquet; staging models are unmaterialized views
(pure Catalyst rewrites — zero storage, predicate pushdown flows through
them into the raw scans); marts are materialized parquet tables.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

LAYERS = ("raw", "staging", "analytics")


def drop_table(spark: SparkSession, layer: str, name: str) -> None:
    """Drop a managed table AND its on-disk location. The warehouse dir
    outlives the in-memory catalog (a new session starts with an empty
    catalog over the same ``spark-warehouse/``), so a plain DROP TABLE IF
    EXISTS misses orphaned locations and the next save fails with
    LOCATION_ALREADY_EXISTS."""
    spark.sql(f"DROP TABLE IF EXISTS {layer}.{name}")
    try:
        loc = urlparse(spark.catalog.getDatabase(layer).locationUri).path
        shutil.rmtree(os.path.join(loc, name), ignore_errors=True)
    except Exception:  # layer database absent — nothing on disk to clean  # noqa: BLE001
        pass


def create_layers(spark: SparkSession, warehouse_dir: str | None = None) -> None:
    for layer in LAYERS:
        loc = f" LOCATION '{warehouse_dir}/{layer}.db'" if warehouse_dir else ""
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {layer}{loc}")


def load_raw(spark: SparkSession, name: str, df: DataFrame, partition_cols: list[str] | None = None) -> None:
    """Materialize a source table into the raw layer."""
    drop_table(spark, "raw", name)
    writer = df.write.mode("overwrite").format("parquet")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.saveAsTable(f"raw.{name}")


def create_staging_view(spark: SparkSession, name: str, sql: str) -> None:
    """Staging model = view (dbt `staging: +materialized: view`)."""
    spark.sql(f"CREATE OR REPLACE VIEW staging.{name} AS {sql}")


def materialize_mart(spark: SparkSession, name: str, sql: str) -> None:
    """Mart = materialized table (dbt `marts: +materialized: table`)."""
    drop_table(spark, "analytics", name)
    spark.sql(f"CREATE TABLE analytics.{name} USING parquet AS {sql}")
