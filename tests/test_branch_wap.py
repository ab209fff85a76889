"""Round 12 — branch refs: WRITE-AUDIT-PUBLISH.

A branch is a named side chain of snapshot records forked from a main
version. Staged files land invisible-to-main in the same lake dir;
audit queries read the branch head; publish fast-forwards main in one
parent-asserted commit (rebasing over concurrent main appends,
raising when main rewrote rows the audit saw). The Iceberg/Nessie WAP
pattern — how a training-data lake takes a new crawl drop."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mlb_data_pipeline_spark.operators.snapshots import (
    SnapshotConflictError,
    current_version,
    lake_branch_append,
    lake_branch_create,
    lake_branch_drop,
    lake_branches,
    lake_delete,
    lake_publish_branch,
    lake_write,
    read_branch,
    read_snapshot,
    snapshot_info,
    vacuum_lake,
)


def _kv(spark, lo, hi, tag="x"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"), F.lit(tag).alias("src")
    )


def test_wap_stage_audit_publish(spark, tmp_path):
    lake = str(tmp_path / "lake")
    lake_write(spark, _kv(spark, 0, 100, "base").coalesce(2), lake)  # v1
    lake_branch_create(lake, "drop42")
    lake_branch_append(spark, lake, "drop42", _kv(spark, 100, 150, "staged").coalesce(1))
    lake_branch_append(spark, lake, "drop42", _kv(spark, 150, 180, "staged").coalesce(1))
    # AUDIT: branch sees base + staged; MAIN sees base only
    assert read_branch(spark, lake, "drop42").count() == 180
    assert read_snapshot(spark, lake).count() == 100
    assert lake_branches(lake)["drop42"]["head"] == 3
    # quality gate passes → PUBLISH (atomic fast-forward)
    v = lake_publish_branch(lake, "drop42")
    assert v == 2 and current_version(lake) == 2
    cur = read_snapshot(spark, lake)
    assert cur.count() == 180
    assert cur.filter("src = 'staged'").count() == 80
    assert lake_branches(lake) == {}  # dropped on publish
    assert snapshot_info(lake)["op"] == "publish"


def test_publish_rebases_over_concurrent_append(spark, tmp_path):
    lake = str(tmp_path / "lake")
    lake_write(spark, _kv(spark, 0, 100, "base").coalesce(1), lake)  # v1
    lake_branch_create(lake, "b")
    lake_branch_append(spark, lake, "b", _kv(spark, 500, 520, "staged").coalesce(1))
    # main moves underneath the audit (another writer appends)
    lake_write(spark, _kv(spark, 200, 230, "other").coalesce(1), lake)  # v2
    v = lake_publish_branch(lake, "b")
    assert v == 3
    cur = read_snapshot(spark, lake)
    # serial order: both the concurrent append and the staged rows land
    assert cur.count() == 150
    assert cur.filter("src = 'other'").count() == 30
    assert cur.filter("src = 'staged'").count() == 20


def test_publish_strict_fastforward_vs_rebase(spark, tmp_path):
    """allow_rebase=False demands the Iceberg fast-forward contract:
    any main movement since the fork raises — what publishes must be
    bit-for-bit what was audited. The default rebase stays sound
    (main's deletes are NOT resurrected by the publish)."""
    lake = str(tmp_path / "lake")
    lake_write(spark, _kv(spark, 0, 100, "base").repartitionByRange(2, "k"), lake)
    lake_branch_create(lake, "b")
    lake_branch_append(spark, lake, "b", _kv(spark, 500, 510, "staged").coalesce(1))
    lake_delete(spark, lake, "k < 50", col_types={"k": "bigint"})  # rewrites base files
    with pytest.raises(SnapshotConflictError, match="re-fork"):
        lake_publish_branch(lake, "b", allow_rebase=False)
    # the branch is still there for a re-fork decision
    assert "b" in lake_branches(lake)
    # the default rebase publishes staged rows WITHOUT resurrecting
    # the rows main deleted underneath the audit
    lake_publish_branch(lake, "b")
    cur = read_snapshot(spark, lake)
    assert cur.filter("k < 50 and src = 'base'").count() == 0
    assert cur.filter("src = 'staged'").count() == 10
    assert cur.count() == 60


def test_vacuum_retains_branch_files(spark, tmp_path):
    lake = str(tmp_path / "lake")
    lake_write(spark, _kv(spark, 0, 50, "base").coalesce(1), lake)  # v1
    lake_branch_create(lake, "b")
    lake_branch_append(spark, lake, "b", _kv(spark, 100, 140, "staged").coalesce(1))
    lake_write(spark, _kv(spark, 50, 60, "main").coalesce(1), lake)  # v2
    rep = vacuum_lake(lake, keep_last=1, orphan_grace_s=0)
    assert rep["removed_files"] == 0  # branch files are referenced
    assert read_branch(spark, lake, "b").count() == 90
    # dropping the branch turns its staged files into orphans
    lake_branch_drop(lake, "b")
    rep = vacuum_lake(lake, keep_last=1, orphan_grace_s=0)
    assert rep["removed_files"] >= 1
    assert read_snapshot(spark, lake).count() == 60


def test_branch_schema_drift_rejected(spark, tmp_path):
    lake = str(tmp_path / "lake")
    lake_write(spark, _kv(spark, 0, 20, "base").coalesce(1), lake)
    lake_branch_create(lake, "b")
    bad = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="schema drift"):
        lake_branch_append(spark, lake, "b", bad)
    with pytest.raises(ValueError, match="already exists"):
        lake_branch_create(lake, "b")
    with pytest.raises(ValueError, match="no branch"):
        read_branch(spark, lake, "nope")


def test_publish_after_vacuum_expired_fork_record(spark, tmp_path):
    """ADVICE r12 #2: vacuum retains branch FILES but may expire the
    fork version's main-chain record. Publish must still work — the
    fork state comes from the branch's own v1 'branch_fork' record,
    so a routine vacuum can never strand a live, audited branch."""
    lake = str(tmp_path / "lake")
    lake_write(spark, _kv(spark, 0, 50, "base").coalesce(1), lake)  # v1
    lake_branch_create(lake, "b")
    lake_branch_append(spark, lake, "b", _kv(spark, 100, 140, "staged").coalesce(1))
    lake_write(spark, _kv(spark, 50, 60, "main").coalesce(1), lake)  # v2
    rep = vacuum_lake(lake, keep_last=1, orphan_grace_s=0)
    assert 1 not in rep["retained_versions"]  # the fork record is GONE
    v = lake_publish_branch(lake, "b")  # must not raise
    cur = read_snapshot(spark, lake)
    assert cur.count() == 100  # base 50 + main 10 + staged 40
    assert cur.filter("src = 'staged'").count() == 40
    assert cur.filter("src = 'main'").count() == 10
    assert v == 3
