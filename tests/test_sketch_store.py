"""Sketch store: union-of-sketches must equal sketch-of-union exactly,
appends must be replay-safe, and pruned rollups must match direct
sketches over the same slice."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlb_data_pipeline_spark.operators.sketch import (
    append_sketch_store,
    build_sketch_store,
    rollup_estimate,
)


def _events(spark, days=4, users=500, rows=4000):
    return spark.range(rows).select(
        (F.col("id") % days).cast("int").alias("day"),
        F.when(F.col("id") % 3 == 0, "click").otherwise("view").alias("etype"),
        ((F.col("id") * 7919) % users).alias("user_id"),
    )


def test_rollup_equals_direct_sketch(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "store")
    build_sketch_store(ev, "day", ["etype"], "user_id", path)
    got = {
        r.etype: r.n_distinct_est
        for r in rollup_estimate(spark, path, ["etype"]).collect()
    }
    # deterministic: a second rollup over the same store is identical
    again = {
        r.etype: r.n_distinct_est
        for r in rollup_estimate(spark, path, ["etype"]).collect()
    }
    assert got == again
    # within HLL tolerance of the exact count (lg_k=12 -> ~1.6% rse; 3x margin)
    exact = {r.etype: r.n for r in ev.groupBy("etype").agg(F.countDistinct("user_id").alias("n")).collect()}
    for k in exact:
        assert abs(got[k] - exact[k]) / exact[k] < 0.05


def test_append_is_replay_safe_and_visible(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "store")
    build_sketch_store(ev.filter(F.col("day") < 3), "day", ["etype"], "user_id", path)
    day3 = ev.filter(F.col("day") == 3)
    append_sketch_store(day3, "day", ["etype"], "user_id", path)
    after_first = rollup_estimate(spark, path, ["etype"]).collect()
    append_sketch_store(day3, "day", ["etype"], "user_id", path)  # replay
    after_replay = rollup_estimate(spark, path, ["etype"]).collect()
    assert sorted(map(tuple, after_first)) == sorted(map(tuple, after_replay))
    # the appended day is actually in: matches a store built whole
    whole = str(tmp_path / "whole")
    build_sketch_store(ev, "day", ["etype"], "user_id", whole)
    assert sorted(map(tuple, after_first)) == sorted(
        map(tuple, rollup_estimate(spark, whole, ["etype"]).collect())
    )


def test_partition_pruned_rollup(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "store")
    build_sketch_store(ev, "day", ["etype"], "user_id", path)
    pruned = {
        r.etype: r.n_distinct_est
        for r in rollup_estimate(spark, path, ["etype"], "day", [0, 1]).collect()
    }
    # pruning must behave exactly like a store that never saw day >= 2
    sliced = str(tmp_path / "sliced")
    build_sketch_store(ev.filter(F.col("day") < 2), "day", ["etype"], "user_id", sliced)
    direct = {
        r.etype: r.n_distinct_est
        for r in rollup_estimate(spark, sliced, ["etype"]).collect()
    }
    assert pruned == direct
    # and stays within tolerance of the exact sliced count
    exact = {
        r.etype: r.n
        for r in ev.filter(F.col("day") < 2)
        .groupBy("etype")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k in exact:
        assert abs(pruned[k] - exact[k]) / exact[k] < 0.05
