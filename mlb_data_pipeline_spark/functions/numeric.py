"""Deterministic numeric aggregation helpers.

Float SUMs are order-dependent (partition order differs run to run and
engine to engine) and ``ROUND`` on doubles disagrees between engines:
Spark rounds via the shortest-decimal string (Java ``BigDecimal.valueOf``)
while DuckDB rounds the binary value. Both problems vanish if the
arithmetic happens in the DECIMAL domain: decimal sums are exact and
order-independent, decimal rounding is exact, and the final
decimal->double cast is the same IEEE value in every engine.

So the engine's canonical "money math" is::

    CAST(ROUND(SUM(CAST(x AS DECIMAL(18,6))), 2) AS DOUBLE)

mirrored in the oracle SQL. ``dsum``/``davg``/``dexpr`` build the Spark
side of that contract.

Width note: the CONTRACT is "exact decimal domain", not a fixed width —
any (precision, scale) that exactly holds the operand values yields
bit-identical results, so the oracle can stay at DECIMAL(18,6) while the
Spark side narrows. Narrowing matters for PRODUCTS: Spark's Decimal is a
plain long ("compact") while result precision stays <= 18, so e.g.
(8,2) x (8,4) -> (17,6) multiplies as long arithmetic inside codegen,
where (18,6) x (18,6) -> (38,12) falls off the compact path into
per-row java.math.BigDecimal (~3x slower end-to-end on a TPC-H Q1 shape).
Pass ``width`` where operand ranges are dataset-pinned (per-ROW values
don't grow with SF — only row counts do, and sum precision gets +10
digits of headroom on top of the operand width).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dec(col: Column | str, width: str | None = None) -> Column:
    """Cast to the exact-decimal domain. ``width`` like "8,2" narrows the
    operand so downstream products stay on Spark's compact-long path;
    default is the (18,6) contract width."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({width})" if width else DEC)


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact, order-independent SUM of a double column, rounded to `scale`."""
    return F.round(F.sum(dec(col)), scale).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """AVG as exact decimal sum / count, rounded in the decimal domain."""
    return F.round(F.sum(dec(col)) / F.count(F.col(col) if isinstance(col, str) else col), scale).cast("double")


def round2(col: Column, scale: int = 2) -> Column:
    return F.round(col, scale).cast("double")
