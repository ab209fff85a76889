"""Entry point A — the daily content pipeline as ONE Spark job.

Reference task graph (mlb_pipeline_dag.py:289): fetch_urls ->
scrape_and_store -> build_prompt -> embed_update -> ... Each Airflow
task is a separate process exchanging pickled XCom; here the whole
thing is one narrow DataFrame pipeline (scan -> clean -> embed ->
upsert -> partitioned write) with shuffles only where grouping needs
them (SURVEY §3.1 engine mapping). External fetch (RSS/HTTP scrape) is
upstream of the engine: the pipeline takes an articles DataFrame (the
scraper's output schema, FIXTURES.md B1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.embed import embed_column
from ..functions.textfn import clean_tts_lines
from ..sources.writers import upsert_by_key, write_partitioned


def daily_content_pipeline(
    spark: SparkSession,
    articles: DataFrame,
    lake_path: str,
    store_path: str,
) -> DataFrame:
    """clean -> title default -> embed -> partitioned lake write +
    keyed vector-store upsert. Returns the enriched frame."""
    cleaned = (
        articles.filter(F.col("body").isNotNull() & (F.length("body") > 0))  # P4 (pipeline.py:107-109)
        .withColumn("title", F.coalesce("title", F.lit("Untitled")))  # pipeline.py:31
        .withColumn("body_clean", clean_tts_lines("body"))  # P5/T4 (pipeline.py:268-281)
        .withColumn("dt", F.to_date("scraped_at"))
    )
    embedded = embed_column(cleaned, "body_clean")  # V1 (pipeline.py:66-68)
    write_partitioned(embedded.drop("embedding"), lake_path, ["dt"])  # S8 (date-keyed layout)
    upsert_by_key(  # S11 (pipeline.py:58-77 without the destructive clear)
        spark,
        store_path,
        embedded.select("url", F.col("body_clean").alias("text"), "embedding", "dt"),
        ["url"],
    )
    return embedded
