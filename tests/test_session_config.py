"""Session factory config knobs (docs/DEPLOY.md §0)."""

from __future__ import annotations

from mlb_data_pipeline_spark.session import session_config


def test_max_partition_bytes_defaults_to_local_bench_value(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_MAX_PARTITION_BYTES", raising=False)
    assert session_config()["spark.sql.files.maxPartitionBytes"] == "32m"


def test_max_partition_bytes_env_overridable(monkeypatch):
    # a cluster deploy must be able to restore the Spark default without
    # editing code — bench tuning must not leak into production sessions
    monkeypatch.setenv("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m")
    assert session_config()["spark.sql.files.maxPartitionBytes"] == "128m"


def test_shuffle_partitions_follows_cpu_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "7")
    cfg = session_config()
    assert cfg["spark.sql.shuffle.partitions"] == "7"
    assert session_config(shuffle_partitions=3)["spark.sql.shuffle.partitions"] == "3"
