"""Data-quality expectation checks (mini-Deequ) — the validation layer
a lake pipeline runs between staging and publish.

Reference analogue: the warehouse raw→staging→analytics layering
(/root/reference/README.md architecture; sources/warehouse.py here)
implies a promotion gate, but the reference validates nothing — a bad
scrape propagates straight to the dashboards. These checks make the
gate explicit: declarative rules compiled into ONE aggregation pass
(never one job per rule), plus an optional referential check (one
anti-join per foreign key).

100 TB notes: all row-level rules fold into a single map-side partial
aggregate over one scan; `unique` adds a count distinct (one shuffle);
referential integrity is a left-anti join on the key — the same
bounded shapes as everything else in the engine. Output is a tiny
(check, violations, passed) frame a scheduler can gate on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect_not_null(col: str) -> tuple[str, Column]:
    """Violations = rows where ``col`` is null."""
    return f"not_null({col})", F.sum(F.col(col).isNull().cast("long"))


def expect_unique(col: str) -> tuple[str, Column]:
    """Violations = rows beyond the first per value (count - distinct)."""
    return f"unique({col})", F.count(F.col(col)) - F.countDistinct(F.col(col))


def expect_range(col: str, lo, hi) -> tuple[str, Column]:
    """Violations = non-null rows outside [lo, hi]."""
    c = F.col(col)
    return (
        f"range({col},{lo},{hi})",
        F.sum((c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))).cast("long")),
    )


def expect_regex(col: str, pattern: str) -> tuple[str, Column]:
    """Violations = non-null rows not fully matching ``pattern``."""
    c = F.col(col)
    return (
        f"regex({col})",
        F.sum((c.isNotNull() & ~c.rlike(pattern)).cast("long")),
    )


def quality_report(df: DataFrame, checks: list[tuple[str, Column]]) -> DataFrame:
    """Run every row-level check in ONE aggregation pass and return
    (check, violations, passed), one row per rule, ordered by check
    name. ``checks`` are (name, violation-count aggregate) pairs from
    the ``expect_*`` builders (or hand-built aggregates with the same
    contract: violations == 0 means pass)."""
    aggs = [expr.cast("long").alias(f"__c{i}") for i, (_, expr) in enumerate(checks)]
    row = df.agg(*aggs)
    pairs = [item for i, (name, _) in enumerate(checks) for item in (F.lit(name), F.col(f"__c{i}"))]
    stacked = row.select(
        F.explode(F.map_from_arrays(
            F.array(*pairs[0::2]), F.array(*pairs[1::2])
        )).alias("check", "violations")
    )
    return stacked.select(
        "check", "violations", (F.col("violations") == 0).alias("passed")
    ).orderBy("check")


def expect_foreign_key(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str) -> DataFrame:
    """Referential-integrity check as a (check, violations, passed) row:
    violations = child rows whose key has no parent (left-anti join —
    one shuffle on the key, never a collect)."""
    orphans = child.select(F.col(child_key).alias("__k")).join(
        parent.select(F.col(parent_key).alias("__k")), "__k", "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).alias("violations")).select(
        F.lit(f"foreign_key({child_key}->{parent_key})").alias("check"),
        F.col("violations").cast("long"),
        (F.col("violations") == 0).alias("passed"),
    )
