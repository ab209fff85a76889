"""S12 — warehouse layering: raw → staging → analytics.

The reference declares this as BigQuery datasets (terraform/main.tf:46-66)
with dbt materializations (dbt/dbt_project.yml:22-27: staging = views,
marts = tables) but ships no model SQL. The Spark-native form: one SQL
database per layer over parquet; staging models are unmaterialized views
(pure Catalyst rewrites — zero storage, predicate pushdown flows through
them into the raw scans); marts are materialized parquet tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

LAYERS = ("raw", "staging", "analytics")


def create_layers(spark: SparkSession, warehouse_dir: str | None = None) -> None:
    for layer in LAYERS:
        loc = f" LOCATION '{warehouse_dir}/{layer}.db'" if warehouse_dir else ""
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {layer}{loc}")


def load_raw(spark: SparkSession, name: str, df: DataFrame, partition_cols: list[str] | None = None) -> None:
    """Materialize a source table into the raw layer."""
    writer = df.write.mode("overwrite").format("parquet")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.saveAsTable(f"raw.{name}")


def create_staging_view(spark: SparkSession, name: str, sql: str) -> None:
    """Staging model = view (dbt `staging: +materialized: view`)."""
    spark.sql(f"CREATE OR REPLACE VIEW staging.{name} AS {sql}")


def materialize_mart(spark: SparkSession, name: str, sql: str) -> None:
    """Mart = materialized table (dbt `marts: +materialized: table`)."""
    spark.sql(f"DROP TABLE IF EXISTS analytics.{name}")
    spark.sql(f"CREATE TABLE analytics.{name} USING parquet AS {sql}")
