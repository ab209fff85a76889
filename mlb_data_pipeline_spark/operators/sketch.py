"""Mergeable-sketch store (round 7) — pre-aggregated distinct counts.

The 100 TB pattern for "distinct users per X, any time window": never
re-scan raw events. Each ingest partition (a day, an hour) persists ONE
Datasketches HLL sketch per group as a binary parquet cell; any later
rollup — per group across all days, per day across groups — is a
sketch UNION over the tiny store, never a raw scan. Unioning HLL
sketches adds no error over sketching the union (Datasketches HLL
property) — though the ESTIMATE can differ by a hair from a
directly-built sketch's, because a small direct sketch may still sit in
its near-exact sparse mode while the union has promoted to the dense
estimator. The store contract, pinned by test, is: deterministic,
replay-safe, and within the configured relative error of the exact
distinct count at every rollup level.

Built on Spark's Datasketches bindings (hll_sketch_agg /
hll_union_agg / hll_sketch_estimate, JVM-side, no UDF). The binary
sketches are engine-specific, so store queries register as rows-only —
the sketch-vs-exact contract is pinned in pytest instead
(tests/test_sketch_store.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # Datasketches default; ~1.6% rse, 16 KB max per sketch


def sketch_partition(
    df: DataFrame,
    part_col: str,
    group_cols: list[str],
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """One HLL sketch per (partition, group): the map-side-combinable
    pre-aggregation pass. Output is |parts|x|groups| rows regardless of
    input size."""
    return df.groupBy(part_col, *group_cols).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def build_sketch_store(
    df: DataFrame,
    part_col: str,
    group_cols: list[str],
    value_col: str,
    path: str,
    lg_k: int = DEFAULT_LG_K,
) -> None:
    """Materialize the sketch store, partitioned by ``part_col`` so an
    append or a time-windowed rollup prunes to the partitions it needs."""
    sketch_partition(df, part_col, group_cols, value_col, lg_k).write.mode(
        "overwrite"
    ).partitionBy(part_col).parquet(path.rstrip("/"))


def append_sketch_store(
    delta: DataFrame,
    part_col: str,
    group_cols: list[str],
    value_col: str,
    path: str,
    lg_k: int = DEFAULT_LG_K,
) -> None:
    """Daily-cadence maintenance: sketch ONLY the delta's partitions and
    append them. Partition-value guard (left-anti on the store's
    existing part values) makes a replayed delta a no-op — same
    append-only contract as the signature/IVF/text stores. A missing or
    still-empty store bootstraps from the first append (an empty
    partitioned parquet dir has no readable schema, so the guard treats
    it as zero existing partitions)."""
    from pyspark.errors.exceptions.captured import AnalysisException

    spark = delta.sparkSession
    base = path.rstrip("/")
    try:
        existing = spark.read.parquet(base).select(part_col).distinct()
        fresh = delta.join(existing, part_col, "left_anti")
    except AnalysisException:
        fresh = delta
    sketch_partition(fresh, part_col, group_cols, value_col, lg_k).write.mode(
        "append"
    ).partitionBy(part_col).parquet(base)


def rollup_estimate(
    spark: SparkSession,
    path: str,
    group_cols: list[str],
    part_col: str | None = None,
    part_values: list | None = None,
) -> DataFrame:
    """Distinct-count estimates at any rollup level from the store
    alone: union the per-partition sketches per group (optionally
    restricted to ``part_values`` — partition pruning, the scan touches
    only those directories) and estimate. Raw data is never read."""
    store = spark.read.parquet(path.rstrip("/"))
    if part_col is not None and part_values is not None:
        store = store.filter(F.col(part_col).isin(part_values))
    agg = store.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("n_distinct_est"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    )
    return agg
