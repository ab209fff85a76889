"""SparkSession factory.

One global config for the whole engine (BASELINE.md measurement protocol:
"no per-query tuning"). Arrow on, AQE on, UTC session timezone so
timestamp results are comparable with the DuckDB oracle (DuckDB timestamps
are UTC-naive).

At 100 TB the same settings hold except ``shuffle.partitions`` — locally we
pin it near core count; on a real cluster AQE coalescing makes the initial
number a ceiling, so a cluster deploy would set it to ~2-3x total cores and
let ``spark.sql.adaptive.coalescePartitions.enabled`` shrink per-stage.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def session_config(shuffle_partitions: int | None = None) -> dict[str, str]:
    """The engine's pinned Spark config as a dict (testable without
    building a session). Env-overridable knobs are documented in
    docs/DEPLOY.md §0."""
    cores = default_parallelism()
    return {
        "spark.sql.shuffle.partitions": str(shuffle_partitions or cores),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.parquet.filterPushdown": "true",
        # 32 MB scan splits locally: bench tables are one parquet file
        # each, and the default 128 MB would cap a 140 MB sf1 scan at 2
        # tasks on a 32-core box (measured 2x on scan-bound aggs). A
        # cluster at real scale has orders of magnitude more files than
        # cores, where 32m only inflates task counts — deployments set
        # SPARK_GRAFT_MAX_PARTITION_BYTES=128m (docs/DEPLOY.md) so the
        # local bench tuning cannot leak into production sessions.
        "spark.sql.files.maxPartitionBytes": os.environ.get(
            "SPARK_GRAFT_MAX_PARTITION_BYTES", "32m"
        ),
        # Testdata's events.ts is parquet TIMESTAMP(NANOS); Spark has no
        # nanosecond timestamp type, so read as long and convert in catalog.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # Spark's default INT96 timestamps carry NO footer statistics,
        # so a timestamp column can never prune (row groups, scan
        # manifests, lake_scan temporal boxes all blind). TIMESTAMP
        # (MICROS) is the modern parquet type every reader supports and
        # it gets min/max stats — at 100 TB this is the difference
        # between skipping and scanning on event-time predicates.
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    }


def get_spark(app_name: str = "mlb_data_pipeline_spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession with the pinned config."""
    cores = default_parallelism()
    builder = SparkSession.builder.master(
        os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    ).appName(app_name)
    for k, v in session_config(shuffle_partitions).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
